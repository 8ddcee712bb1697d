"""Fourth-model analog: an MLP regressor matching the reference's best
published model (PyTorch ``RULNet``, scripts/ml_pipeline_gpu.py:509-599,
published RMSE 17.91) — MLlib ships no MLP *regressor* and torch is not
in this container, so the network is trained DRIVER-SIDE with numpy on a
bounded sample (the same bounded-collect contract as the IVF/BPE/PCA
trainers: C-MAPSS feature tables are ~20k-160k rows, far under the cap)
and scored DISTRIBUTED via a pandas UDF with the weights broadcast —
no Python loop per row, one matmul chain per Arrow batch.

Determinism: fixed-seed He init + fixed mini-batch shuffling from
``numpy.random.default_rng(seed)`` — refits reproduce bit-for-bit, so
tests can pin quality bands.

At 100 TB the TRAINING side stays bounded by ``max_train_rows`` (larger
corpora train on a deterministic sample, exactly like the reference's
GPU budget bounds its epochs); SCORING is the part that must scale, and
it is a narrow Arrow-batched map over the feature columns.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class NumpyMLPRegressor:
    """Two-hidden-layer ReLU MLP with Adam and MSE loss (the reference
    RULNet shape minus dropout — deterministic eval parity matters more
    here than regularization on these small feature tables)."""

    def __init__(
        self,
        hidden: tuple[int, ...] = (64, 32),
        epochs: int = 60,
        batch_size: int = 256,
        lr: float = 1e-3,
        seed: int = 42,
        max_train_rows: int = 500_000,
    ):
        self.hidden = hidden
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.seed = seed
        self.max_train_rows = max_train_rows
        self.weights_: list[np.ndarray] | None = None
        self.biases_: list[np.ndarray] | None = None
        self.mean_: np.ndarray | None = None
        self.scale_: np.ndarray | None = None
        self.feature_cols_: list[str] | None = None

    # -- driver-side training -------------------------------------------
    def fit(
        self, df: DataFrame, feature_cols: list[str], label_col: str = "rul"
    ) -> "NumpyMLPRegressor":
        # deterministic bounded sample: content-keyed before the cut
        # (LIMIT alone returns whichever partitions answer first, which
        # would break the bit-for-bit refit guarantee past the cap).
        # The order key is ONE md5 of the row content — an 8-byte-ish
        # narrow sort key instead of the previous ~60-double tuple sort
        # (round-4 verdict #6), and orderBy+limit plans
        # TakeOrderedAndProject (per-partition top-k), never a full
        # sort materialization. Ties (identical feature rows) are
        # interchangeable by construction.
        key = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in [*feature_cols, label_col]]))
        rows = (
            df.select(*feature_cols, label_col)
            .dropna()
            .orderBy(key)
            .limit(self.max_train_rows)
            .collect()
        )
        if not rows:
            # dropna() emptied the input (one always-NULL sensor
            # suffices): without this the shape math below dies in a
            # cryptic numpy IndexError (r10 review)
            raise ValueError(
                "no complete training rows: every input row has at least "
                "one NULL/NaN feature or label, so dropna() removed them "
                "all — check the feature columns for dead sensors"
            )
        X = np.array([[r[c] for c in feature_cols] for r in rows], dtype=np.float64)
        y = np.array([r[label_col] for r in rows], dtype=np.float64)
        self.feature_cols_ = list(feature_cols)
        self.mean_ = X.mean(axis=0)
        sd = X.std(axis=0)
        sd[sd == 0] = 1.0
        self.scale_ = sd
        Xs = (X - self.mean_) / self.scale_

        rng = np.random.default_rng(self.seed)
        sizes = [Xs.shape[1], *self.hidden, 1]
        W = [
            rng.normal(0, np.sqrt(2.0 / sizes[i]), (sizes[i], sizes[i + 1]))
            for i in range(len(sizes) - 1)
        ]
        b = [np.zeros(sizes[i + 1]) for i in range(len(sizes) - 1)]
        mW = [np.zeros_like(w) for w in W]
        vW = [np.zeros_like(w) for w in W]
        mb = [np.zeros_like(x) for x in b]
        vb = [np.zeros_like(x) for x in b]
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = 0
        n = len(Xs)
        for _epoch in range(self.epochs):
            order = rng.permutation(n)
            for s in range(0, n, self.batch_size):
                idx = order[s : s + self.batch_size]
                xb, yb = Xs[idx], y[idx]
                # forward
                acts = [xb]
                for i in range(len(W) - 1):
                    acts.append(np.maximum(acts[-1] @ W[i] + b[i], 0.0))
                out = (acts[-1] @ W[-1] + b[-1]).ravel()
                # backward (MSE)
                delta = (2.0 / len(xb)) * (out - yb)[:, None]
                grads_W, grads_b = [None] * len(W), [None] * len(W)
                for i in range(len(W) - 1, -1, -1):
                    grads_W[i] = acts[i].T @ delta
                    grads_b[i] = delta.sum(axis=0)
                    if i:
                        delta = (delta @ W[i].T) * (acts[i] > 0)
                # adam
                t += 1
                for i in range(len(W)):
                    mW[i] = b1 * mW[i] + (1 - b1) * grads_W[i]
                    vW[i] = b2 * vW[i] + (1 - b2) * grads_W[i] ** 2
                    mb[i] = b1 * mb[i] + (1 - b1) * grads_b[i]
                    vb[i] = b2 * vb[i] + (1 - b2) * grads_b[i] ** 2
                    W[i] -= (
                        self.lr
                        * (mW[i] / (1 - b1**t))
                        / (np.sqrt(vW[i] / (1 - b2**t)) + eps)
                    )
                    b[i] -= (
                        self.lr
                        * (mb[i] / (1 - b1**t))
                        / (np.sqrt(vb[i] / (1 - b2**t)) + eps)
                    )
        self.weights_, self.biases_ = W, b
        self._bc = None  # refit invalidates the cached weight broadcast
        return self

    # -- distributed scoring --------------------------------------------
    def _forward(self, X: np.ndarray) -> np.ndarray:
        """Missing features (NaN) impute to the training mean — i.e. 0
        after standardization — matching transform()'s SQL-side
        coalesce (the Imputer-strategy twin of the MLlib pipeline)."""
        X = np.where(np.isnan(X), self.mean_, X)
        Z = (X - self.mean_) / self.scale_
        for i in range(len(self.weights_) - 1):
            Z = np.maximum(Z @ self.weights_[i] + self.biases_[i], 0.0)
        return (Z @ self.weights_[-1] + self.biases_[-1]).ravel()

    def transform(
        self, df: DataFrame, prediction_col: str = "prediction"
    ) -> DataFrame:
        """Score every row: features assemble JVM-side into one array
        column; the pandas UDF does one matmul chain per Arrow batch
        with the model broadcast once per executor."""
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        if self.weights_ is None:
            raise ValueError("fit() first")
        # ONE broadcast per fitted model, cached on the instance (r10
        # review): a scoring loop calling transform() per batch/dataset
        # otherwise pins a fresh copy of the full weight set on the
        # driver and every executor PER CALL for the session's lifetime
        # — a steady leak. fit() invalidates the cache.
        if getattr(self, "_bc", None) is None:
            model = (
                [w.copy() for w in self.weights_],
                [x.copy() for x in self.biases_],
                self.mean_.copy(),
                self.scale_.copy(),
            )
            self._bc = df.sparkSession.sparkContext.broadcast(model)
        bc = self._bc
        hidden_n = len(self.weights_)

        def _score(feats: pd.Series) -> pd.Series:
            W, b, mean, scale = bc.value
            if len(feats) == 0:
                return pd.Series([], dtype=float)
            X = np.stack(feats.to_numpy()).astype(np.float64)
            # NaN doubles (coalesce only catches SQL NULLs) impute to
            # the training mean, matching _forward exactly
            X = np.where(np.isnan(X), mean, X)
            Z = (X - mean) / scale
            for i in range(hidden_n - 1):
                Z = np.maximum(Z @ W[i] + b[i], 0.0)
            return pd.Series((Z @ W[-1] + b[-1]).ravel())

        _score.__annotations__ = {"feats": pd.Series, "return": pd.Series}
        score_udf = pandas_udf("double")(_score)
        # NULL features impute to the training mean (Imputer parity)
        arr: Column = F.array(
            *[
                F.coalesce(F.col(c).cast("double"), F.lit(float(self.mean_[i])))
                for i, c in enumerate(self.feature_cols_)
            ]
        )
        return df.withColumn(prediction_col, score_udf(arr))


def train_and_score_mlp(
    train_df: DataFrame,
    test_df: DataFrame | None = None,
    label_col: str = "rul",
    **mlp_kwargs,
):
    """The MLP twin of ``ml.pipeline.train_and_score``: same 80/20
    seed-42 split, clamp, metric set, AND test-set contract (metrics
    come from the held-out validation split; the returned scored frame
    is ``test_df``'s predictions when one is given) — so its outputs
    slot into the same predictions table as the MLlib models."""
    from turbine_maintenance_etl_spark.ml.pipeline import (
        clamp_predictions,
        evaluate,
        feature_columns,
    )

    feats = feature_columns(train_df)
    tr, val = train_df.randomSplit([0.8, 0.2], seed=42)
    model = NumpyMLPRegressor(**mlp_kwargs).fit(tr, feats, label_col)
    val_pred = clamp_predictions(model.transform(val))
    metrics = evaluate(val_pred, label_col)
    scored = (
        clamp_predictions(model.transform(test_df)) if test_df is not None else val_pred
    )
    return model, scored, metrics

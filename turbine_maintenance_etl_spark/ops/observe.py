"""Zero-extra-scan pipeline metrics via ``DataFrame.observe``.

The 100 TB problem this solves: every data-quality gate phrased as
"run an extra aggregation first" (row counts, null fractions, value
checksums) costs a second full scan of the input. ``observe`` attaches
accumulator-backed metrics to the EXISTING plan — they materialize as a
side effect of whatever action the pipeline already runs (the sink
write, the count), reading each row exactly once.

Constraints inherited from Spark: observed expressions must be
aggregates without distinct/filter clauses; metrics are only available
AFTER an action completes. Streaming queries surface the same metrics
per micro-batch through ``StreamingQueryListener`` /
``lastProgress.observedMetrics``.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame, Observation


_OBS_SEQ = itertools.count(1)


def observe_metrics(
    df: DataFrame, metrics: dict[str, Column], name: str | None = None
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s plan. Returns the
    observed frame (use it in place of ``df``) and the ``Observation``
    — read ``obs.get`` after the first action on the observed frame.

    ``name=None`` derives a unique name per call (r10 review: a shared
    default meant two observation points on ONE plan failed at action
    time with Spark's duplicate-observed-metrics AnalysisException);
    pass an explicit name when a listener needs to find it."""
    obs = Observation(name or f"pipeline_metrics_{next(_OBS_SEQ)}")
    cols = [expr.alias(alias) for alias, expr in metrics.items()]
    return df.observe(obs, *cols), obs


def quality_gate(
    obs: Observation,
    min_rows: int | None = None,
    max_null_fraction: tuple[str, str, float] | None = None,
    rows_metric: str = "n_rows",
) -> dict:
    """Assert basic health on collected metrics (call after the action).
    ``min_rows`` checks the metric named ``rows_metric``;
    ``max_null_fraction`` = (null_count_metric, row_count_metric, bound).
    Returns the metric dict on success; raises ValueError on violation —
    the caller decides whether that aborts the pipeline or quarantines
    the batch. Naming a metric that was never observed is an error, not
    a silently-failing 0-default."""
    got = obs.get
    if min_rows is not None:
        if rows_metric not in got:
            raise ValueError(
                f"quality gate: metric {rows_metric!r} not observed "
                f"(have {sorted(got)})"
            )
        if got[rows_metric] < min_rows:
            raise ValueError(
                f"quality gate: {rows_metric} {got[rows_metric]} < {min_rows}"
            )
    if max_null_fraction is not None:
        null_m, rows_m, bound = max_null_fraction
        for m in (null_m, rows_m):
            if m not in got:
                raise ValueError(
                    f"quality gate: metric {m!r} not observed "
                    f"(have {sorted(got)})"
                )
        rows = got[rows_m] or 0
        frac = (got[null_m] or 0) / rows if rows else 0.0
        if frac > bound:
            raise ValueError(
                f"quality gate: null fraction {frac:.4f} of {null_m} > {bound}"
            )
    return got

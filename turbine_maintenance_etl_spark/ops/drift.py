"""Distribution-drift detection: Population Stability Index over fixed
bin edges — the production monitor for both faces of this engine: sensor
distributions shifting between training and serving (the reference's
predictive-maintenance risk) and corpus snapshots shifting between
ingest batches (the LLM-pipeline risk).

PSI = Σ_bins (p_actual - p_expected) * ln(p_actual / p_expected).
Rule-of-thumb thresholds: < 0.1 stable, 0.1-0.25 moderate shift,
> 0.25 investigate.

Scale shape: one aggregation per side over FIXED literal edges (a
width_bucket-style CASE chain, map-side partial agg → bins-sized
result), then a bins×bins merge — input size only affects the scan.
Fixed edges are deliberate: quantile-derived edges would make the
binning data-dependent (two monitoring runs disagree about the bins
themselves); production freezes edges at model-training/corpus-baseline
time and monitors against them, which also keeps the operator exactly
oracle-checkable. Proportions are Laplace-smoothed
((count + 0.5) / (total + 0.5 * nbins)) so an empty bin on either side
cannot produce log(0)/division-by-zero.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_expr(col: Column, edges: list[float]) -> Column:
    """0-based fixed-edge bin index: bin i covers [edges[i], edges[i+1]);
    values below the first edge -> bin 0's underflow slot (-1), at or
    above the last edge -> overflow (len(edges)-1). NULLs -> NULL
    (excluded from proportions by the upstream filter)."""
    expr = F.lit(len(edges) - 1)  # overflow default
    for i in range(len(edges) - 1, 0, -1):
        expr = F.when(col < F.lit(float(edges[i])), F.lit(i - 1)).otherwise(expr)
    return F.when(col < F.lit(float(edges[0])), F.lit(-1)).otherwise(expr)


def _bin_props(df: DataFrame, value_col: str, edges: list[float], side: str) -> DataFrame:
    n_bins = len(edges) + 1  # underflow + inner bins + overflow
    binned = df.filter(F.col(value_col).isNotNull()).select(
        bin_expr(F.col(value_col), edges).alias("bin")
    )
    counts = binned.groupBy("bin").agg(F.count("*").alias(f"n_{side}"))
    total = F.broadcast(binned.agg(F.count("*").alias(f"t_{side}")))
    return counts.crossJoin(total).select(
        "bin",
        f"n_{side}",
        (
            (F.col(f"n_{side}") + F.lit(0.5))
            / (F.col(f"t_{side}") + F.lit(0.5 * n_bins))
        ).alias(f"p_{side}"),
    )


def psi_report(
    expected: DataFrame,
    actual: DataFrame,
    value_col: str,
    edges: list[float],
) -> DataFrame:
    """Per-bin PSI decomposition between two snapshots of ``value_col``.

    Output: (bin, n_expected, n_actual, p_expected, p_actual,
    psi_contribution) — one row per OCCUPIED bin (both-empty bins
    contribute ~0 and are omitted), contributions rounded to 6 dp.
    Sum psi_contribution for the headline PSI; keep the decomposition —
    WHICH bins moved is the actionable part of a drift alert."""
    e = _bin_props(expected, value_col, edges, "expected")
    a = _bin_props(actual, value_col, edges, "actual")
    n_bins = len(edges) + 1
    joined = e.join(a, "bin", "full_outer")
    # a side missing from a bin still has the smoothed floor proportion
    def floor_p(t_side: Column) -> Column:
        return F.lit(0.5) / (t_side + F.lit(0.5 * n_bins))

    # totals travel on every row of their side; recover for missing rows
    # via a broadcast of each side's total
    te = F.broadcast(
        expected.filter(F.col(value_col).isNotNull()).agg(
            F.count("*").alias("_te")
        )
    )
    ta = F.broadcast(
        actual.filter(F.col(value_col).isNotNull()).agg(F.count("*").alias("_ta"))
    )
    pe = F.coalesce("p_expected", floor_p(F.col("_te")))
    pa = F.coalesce("p_actual", floor_p(F.col("_ta")))
    return (
        joined.crossJoin(te)
        .crossJoin(ta)
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            F.coalesce("n_expected", F.lit(0)).cast("bigint").alias("n_expected"),
            F.coalesce("n_actual", F.lit(0)).cast("bigint").alias("n_actual"),
            F.round(pe, 6).alias("p_expected"),
            F.round(pa, 6).alias("p_actual"),
            F.round((pa - pe) * F.log(pa / pe), 6).alias("psi_contribution"),
        )
    )

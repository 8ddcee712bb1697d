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


def _bin_counts(df: DataFrame, value_col: str, edges: list[float], side: str) -> DataFrame:
    """ONE aggregation per input side: (bin, n_side) over the fixed
    edges. Totals and proportions are derived downstream from this
    bins-sized frame — the input is never re-scanned for them.

    NaN is excluded alongside NULL (r10 review): NaN compares false
    against every edge, so without the guard it lands silently in the
    OVERFLOW bin — a monitor reading "values drifted above the top
    edge" when the truth is "the feed started emitting NaN". Those are
    different incidents; NaN belongs in a data-quality check, not a
    distribution bin."""
    return (
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(value_col))
        .select(bin_expr(F.col(value_col), edges).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias(f"n_{side}"))
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
    e = _bin_counts(expected, value_col, edges, "expected")
    a = _bin_counts(actual, value_col, edges, "actual")
    n_bins = len(edges) + 1
    joined = e.join(a, "bin", "full_outer")
    # each side's total = sum over its OWN bins-sized counts frame (a
    # tiny reused-exchange aggregate) — the inputs are scanned exactly
    # once each, in _bin_counts
    te = F.broadcast(
        e.agg(F.coalesce(F.sum("n_expected"), F.lit(0)).alias("_te"))
    )
    ta = F.broadcast(a.agg(F.coalesce(F.sum("n_actual"), F.lit(0)).alias("_ta")))
    # Laplace smoothing: a side absent from a bin gets the floor
    # (0 + 0.5) / (total + 0.5 * n_bins) via the same formula on the
    # coalesced count
    def smoothed(n_col: str, t_col: str) -> Column:
        return (F.coalesce(F.col(n_col), F.lit(0)) + F.lit(0.5)) / (
            F.col(t_col) + F.lit(0.5 * n_bins)
        )

    pe = smoothed("n_expected", "_te")
    pa = smoothed("n_actual", "_ta")
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

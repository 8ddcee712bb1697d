"""Grouped-map escape hatch (SURVEY.md §2.10 UD1).

The reference's ``df.groupby("unit_nr").apply(fn)`` — an arbitrary
per-trajectory pandas function — maps to ``applyInPandas``: one Arrow
batch per group, pandas in, pandas out. The window-expression path
(features.engine) is ALWAYS preferred when semantics allow (JVM codegen,
no Python); this module exists for genuinely imperative per-unit logic
(custom filters, curve fitting, model-per-unit) that columnar
expressions can't express.

Scale: parallelism == number of units (the natural grain, 100-550 rows
each). Each group must fit one task's memory — true for trajectories by
construction. Skewed group sizes are bounded (max ~550 rows), so no
salting is needed here.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame


def trajectory_apply(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema,
    group_cols: tuple[str, ...] = ("dataset", "unit_nr"),
) -> DataFrame:
    """Apply an arbitrary pandas function per engine-unit trajectory."""
    return df.groupBy(*group_cols).applyInPandas(fn, schema=output_schema)


def grouped_map_zscore(
    df: DataFrame,
    value_cols: list[str],
    group_cols: tuple[str, ...] = ("dataset", "unit_nr"),
) -> DataFrame:
    """The reference's ``_z`` grouped-map (scripts/etl_turbofan.py:27-31)
    reproduced via applyInPandas — used in tests as a differential check
    against the window-expression z-score (W5), and as the template for
    custom per-unit functions. ddof=0; zero variance → NULL."""
    import numpy as np

    schema = ", ".join(
        [f"{c} {'string' if c == 'dataset' else 'int'}" for c in group_cols]
        + ["time_cycles int"]
        + [f"z_{c} double" for c in value_cols]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[list(group_cols) + ["time_cycles"]].copy()
        for c in value_cols:
            std = pdf[c].std(ddof=0)
            z = (pdf[c] - pdf[c].mean()) / std
            out[f"z_{c}"] = z.replace([np.inf, -np.inf], np.nan)
        return out

    return df.groupBy(*group_cols).applyInPandas(_z, schema=schema)

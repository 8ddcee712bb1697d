"""Local replica of the driver's DuckDB-oracle comparison: row count +
column names + (order-insensitive) value comparison, so every registry
entry is self-verified before the driver ever sees it."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows by all columns."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]").astype("int64")
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("float64")  # unify int32/int64 for compare
        elif pd.api.types.is_bool_dtype(out[c]):
            out[c] = out[c].astype("float64")
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(drop=True)
    return out


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> list[str]:
    """Returns a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
        )
        return problems
    if problems:
        return problems
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = np.isclose(
                av.to_numpy(), bv.to_numpy(dtype=float), rtol=0, atol=1e-9, equal_nan=True
            )
            if not ok.all():
                i = int(np.argmax(~ok))
                problems.append(
                    f"{name}.{c}: {int((~ok).sum())} value diffs, first at row {i}: "
                    f"{av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"{name}.{c}: {int((~eq).sum())} value diffs, first at row {i}: "
                    f"{av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
    return problems

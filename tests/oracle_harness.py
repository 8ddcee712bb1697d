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
    """Sort columns by name, normalize dtypes, sort rows by all columns.

    Integer columns stay EXACT (nullable Int64) — the round-6 verdict
    found that the old int->float64 unification silently passed >2^53
    bigint mismatches (56-bit perceptual hashes) that the driver's
    exact hash caught. Only float-vs-float goes through isclose."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]").astype("int64").astype("Int64")
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("Int64")  # unify int32/int64, stay exact
        elif pd.api.types.is_bool_dtype(out[c]):
            out[c] = out[c].astype("Int64")
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(drop=True)
    return out


def _int_vs_float_eq(iv: pd.Series, fv: pd.Series) -> np.ndarray:
    """Exact elementwise equality between an integer column and a float
    column (e.g. Spark bigint vs a DuckDB HUGEINT that pandas widened to
    float64). A float only matches when it is finite, integral, in int64
    range, and converts to EXACTLY the integer — so a float that lost
    low bits past 2^53 cannot match the true value it came from."""
    fnp = fv.to_numpy(dtype=float)
    ok = np.zeros(len(fnp), dtype=bool)
    ina = iv.isna().to_numpy()
    fna = np.isnan(fnp)
    ok[ina & fna] = True
    with np.errstate(invalid="ignore"):
        # int64 range is asymmetric: -2**63 is a legal int64 whose exact
        # float rendering must be allowed to match (r7 advice), while
        # +2**63 overflows — hence >= on the negative bound, < on the
        # positive
        integral = (
            np.isfinite(fnp)
            & (np.floor(fnp) == fnp)
            & (fnp >= -(2.0**63))
            & (fnp < 2.0**63)
        )
    cand = integral & ~ina
    if cand.any():
        inp = iv[cand].to_numpy(dtype="int64")
        ok[np.flatnonzero(cand)] = fnp[cand].astype(np.int64) == inp
    return ok


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
        a_int = pd.api.types.is_integer_dtype(av)
        b_int = pd.api.types.is_integer_dtype(bv)
        a_flt = pd.api.types.is_float_dtype(av)
        b_flt = pd.api.types.is_float_dtype(bv)
        if a_flt and b_flt:
            ok = np.isclose(
                av.to_numpy(), bv.to_numpy(dtype=float), rtol=0, atol=1e-9, equal_nan=True
            )
            if not ok.all():
                i = int(np.argmax(~ok))
                problems.append(
                    f"{name}.{c}: {int((~ok).sum())} value diffs, first at row {i}: "
                    f"{av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
        elif (a_int and b_flt) or (a_flt and b_int):
            iv, fv = (av, bv) if a_int else (bv, av)
            ok = _int_vs_float_eq(iv, fv)
            if not ok.all():
                i = int(np.argmax(~ok))
                problems.append(
                    f"{name}.{c}: {int((~ok).sum())} int-vs-float diffs, "
                    f"first at row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
            else:
                # values equal but TYPES diverge (a DuckDB HUGEINT/union
                # widening came back float64 while Spark returns int).
                # The driver hashes raw values, so this exact shape went
                # red in round 6 (s_acid_cdf_incremental_agg) despite
                # equal values — fail it HERE with the cause.
                problems.append(
                    f"{name}.{c}: values equal but int-vs-float dtype "
                    "mismatch — the driver's value hash will reject this; "
                    "CAST the oracle column (queries.py determinism rules)"
                )
        else:
            eq = ((av == bv) | (av.isna() & bv.isna())).fillna(False).astype(bool)
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"{name}.{c}: {int((~eq).sum())} value diffs, first at row {i}: "
                    f"{av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
    return problems

"""Regression tests for the harness itself — round-6 verdict finding 3:
`canonicalize` used to cast integer columns to float64, so a >2^53
bigint mismatch (56-bit perceptual hashes, HUGEINT sums) passed the
local selfcheck while the driver's exact hash caught it. These pin the
exact-integer comparison path so that blind spot cannot return."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.oracle_harness import canonicalize, compare


def test_bigint_past_2_53_off_by_one_fails():
    # 2^56-magnitude values differing by 1: float64 cannot see the diff,
    # the exact-int path must.
    base = 2**56 + 12345
    a = pd.DataFrame({"h": pd.array([base, base + 7], dtype="int64")})
    b = pd.DataFrame({"h": pd.array([base + 1, base + 7], dtype="int64")})
    assert compare(a, b, "bigint_exact"), "off-by-one past 2^53 must fail"
    assert not compare(a, a.copy(), "bigint_exact_self")


def test_hugeint_to_float64_loss_fails():
    # The dedup_image_phash failure shape: Spark returns exact int64,
    # the oracle side comes back float64 having lost low bits.
    vals = np.array([2**55 + 3, 2**56 + 255, 42], dtype="int64")
    spark_side = pd.DataFrame({"dhash": vals})
    oracle_side = pd.DataFrame({"dhash": vals.astype("float64")})
    # float64(2^55+3) == 2^55+4 etc. — low bits gone, must mismatch
    assert compare(spark_side, oracle_side, "hugeint_loss")


def test_int_vs_float_equal_values_still_fails_on_dtype():
    """Round-6 driver lesson (s_acid_cdf_incremental_agg): equal VALUES
    with diverging int/float dtypes still hash-mismatch at the driver —
    the harness must reject them, with a message naming the cast fix."""
    vals = np.array([0, -5, 2**52 + 9, 123456789], dtype="int64")
    a = pd.DataFrame({"n": vals})
    b = pd.DataFrame({"n": vals.astype("float64")})  # exactly representable
    problems = compare(a, b, "int_float_dtype")
    assert problems and "dtype mismatch" in problems[0]


def test_int_vs_float_nonintegral_fails():
    a = pd.DataFrame({"n": pd.array([3, 4], dtype="int64")})
    b = pd.DataFrame({"n": [3.0, 4.5]})
    assert compare(a, b, "nonintegral")


def test_nullable_int_na_alignment():
    a = pd.DataFrame({"n": pd.array([1, None, 3], dtype="Int64")})
    b = pd.DataFrame({"n": pd.array([1, None, 3], dtype="Int64")})
    assert not compare(a, b, "na_eq")
    c = pd.DataFrame({"n": pd.array([1, 2, 3], dtype="Int64")})
    assert compare(a, c, "na_ne")


def test_int_vs_float_nan_alignment():
    # NA/NaN alignment holds in the value pass; the dtype divergence is
    # still reported (and ONLY the dtype divergence, not value diffs)
    a = pd.DataFrame({"n": pd.array([7, None], dtype="Int64")})
    b = pd.DataFrame({"n": [7.0, np.nan]})
    problems = compare(a, b, "int_float_nan")
    assert len(problems) == 1 and "dtype mismatch" in problems[0]


def test_int32_vs_int64_still_unifies():
    a = pd.DataFrame({"n": np.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"n": np.array([1, 2], dtype="int64")})
    assert not compare(a, b, "width_unify")


def test_bool_vs_bool_exact():
    a = pd.DataFrame({"f": [True, False]})
    b = pd.DataFrame({"f": [True, False]})
    assert not compare(a, b, "bool_eq")
    c = pd.DataFrame({"f": [True, True]})
    assert compare(a, c, "bool_ne")


def test_float_float_tolerance_unchanged():
    a = pd.DataFrame({"x": [1.0, 2.0000000001]})
    b = pd.DataFrame({"x": [1.0, 2.0000000002]})
    assert not compare(a, b, "float_tol")  # within 1e-9 atol


def test_canonicalize_keeps_integers_exact():
    base = 2**56 + 1
    out = canonicalize(pd.DataFrame({"h": pd.array([base], dtype="int64")}))
    assert pd.api.types.is_integer_dtype(out["h"])
    assert int(out["h"].iloc[0]) == base


def test_int64_min_boundary_matches_exact_float():
    """Round-7 advice: -2**63 is a legal int64 whose float rendering is
    exact — the old `abs(f) < 2**63` gate produced a spurious red."""
    a = pd.DataFrame({"v": pd.array([-(2**63), 0], dtype="int64")})
    b = pd.DataFrame({"v": np.array([-(2.0**63), 0.0])})
    probs = compare(a, b, "int64_min")
    # values must MATCH (no spurious diff); only the dtype-divergence
    # advisory remains, which is the harness's intended strictness
    assert not any("diffs" in p for p in probs), probs
    # +2**63 still overflows int64 and must NOT match
    c = pd.DataFrame({"v": pd.array([2**63 - 1, 0], dtype="int64")})
    d = pd.DataFrame({"v": np.array([2.0**63, 0.0])})
    assert any("diffs" in p for p in compare(c, d, "int64_max_overflow"))

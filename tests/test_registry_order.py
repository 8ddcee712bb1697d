"""The driver grades only the first GRADE_WINDOW registry entries, so
export order IS coverage. These tests pin (a) PRIORITY_ORDER covers the
registry exactly — a new entry without an ordering decision fails fast —
and (b) every SURVEY §2-mapped operator sits inside the graded window."""

from __future__ import annotations

from turbine_maintenance_etl_spark.queries import (
    GRADE_WINDOW,
    PRIORITY_ORDER,
    REGISTRY,
    ordered_registry,
)
import turbine_maintenance_etl_spark.queries_llm  # noqa: F401
import turbine_maintenance_etl_spark.queries_ext  # noqa: F401
import turbine_maintenance_etl_spark.queries_sources  # noqa: E402,F401  (registers entries)
import turbine_maintenance_etl_spark.queries_window_ext  # noqa: F401

# Every §2-mapped operator entry (plus the round-1 judge's stretch picks,
# dedup_cluster_resolution / dedup_simhash_oracle) must be graded.
SURVEY_S2_ENTRIES = PRIORITY_ORDER[:GRADE_WINDOW]


def test_order_covers_registry_exactly():
    assert sorted(PRIORITY_ORDER) == sorted(REGISTRY), (
        "PRIORITY_ORDER and REGISTRY drifted; add/remove the entry in both"
    )
    assert len(set(PRIORITY_ORDER)) == len(PRIORITY_ORDER), "duplicate names"


def test_survey_s2_inside_grade_window():
    ordered = list(ordered_registry())
    graded = set(ordered[:GRADE_WINDOW])
    must_grade = {
        "p1_positional_truncation", "p3_constant_detection",
        "p4_allnull_detection",
        "p10_rename_projection", "p12_regex_column_select",
        "o1_composite_sort", "a16_summary_stats", "f_null_handling",
        "agg_rollup_cube", "w_analytic_suite", "w_range_time_frame",
        "cmapss_feature_engine", "dedup_cluster_resolution",
        "dedup_simhash_oracle", "dedup_neardup_survivors",
        # §2.1/§2 UD families, graded since round 2:
        "s1_s2_text_scan_suite", "s3_s5_catalog_introspection",
        "s_sink_roundtrip", "ud_grouped_map_slope",
        # flagship LLM operators, rotated into the window in round 4 in
        # place of the §2-redundant q3/q5 TPC-H demos:
        "dedup_minhash_lsh", "quality_lm_perplexity",
    }
    assert must_grade <= graded, f"outside grade window: {must_grade - graded}"


def test_every_graded_entry_has_oracle():
    ordered = ordered_registry()
    for name in list(ordered)[:GRADE_WINDOW]:
        assert ordered[name].oracle is not None, (
            f"{name} is inside the grade window but has no oracle SQL"
        )

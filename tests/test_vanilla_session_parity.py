"""Driver-environment parity gate: run the conf-sensitive registry
entries in a SUBPROCESS with a truly vanilla SparkSession (ANSI on, no
legacy confs, default shuffle partitions — exactly how the driver runs
the registry) and compare against the DuckDB oracle.

Round-1 lesson: 157 in-process tests were green under the tuned
get_spark() session while 14 driver rows were red from two session-conf
dependencies. An in-process test cannot catch this (the session-scoped
fixture already set the confs); only a fresh JVM can. The sentinel set
below covers every conf-sensitivity class that bit round 1:
- events.parquet TIMESTAMP(NANOS) reads (nanosAsLong)
- malformed-string casts (ANSI on raises without try_cast)
- timestamp arithmetic under default session timezone
- array-valued results across pandas conversion paths (no Arrow)

The FULL sweep lives in scripts/selfcheck_vanilla.py (85/85 green,
SELFCHECK.json); this pytest keeps the fast sentinel subset in the
default suite so a conf-coupling regression fails CI, not the driver.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SENTINELS = [
    "p5_cast_projection",        # ANSI-on cast behavior
    "p8_comparison_filter",      # nanos events read
    "w1_partition_max",          # events + window
    "cmapss_feature_engine",     # flagship, events-based
    "f_json_extract",            # events + cast chain
    "events_tumbling_window",    # timestamp bucketing + TZ
    "a_collect_array_suite",     # array results without Arrow
    "f_scalar_datetime_suite",   # datetime arithmetic + TZ
    "agg_grouping_suite",        # grouping_id/pivot casts (r6: conf-sensitive class)
    "a_stats_suite",             # median/percentile/corr melt (r6 wave 2)
]


def test_registry_green_under_vanilla_session():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "selfcheck_vanilla.py"),
            os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
            "--only",
            ",".join(SENTINELS),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert proc.returncode == 0, (
        f"vanilla-session parity failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    )

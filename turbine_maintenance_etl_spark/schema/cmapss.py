"""CMAPSS table schemas + dynamic sensor-set reflection.

The raw input is whitespace-separated headerless text with 26 numeric
columns: unit number, time in cycles, 3 operational settings, 21 sensor
measurements (reference data/raw/readme.txt:33-42; parsing at
scripts/etl_turbofan.py:5-19, ``SENSOR_COUNT = 21``).

The *effective* sensor schema is data-dependent: constant sensors are
dropped, and multi-dataset runs keep the sorted intersection of each
dataset's variable sensors (reference scripts/etl_turbofan.py:74-78,
175-206). In Spark that reflection is driver-side over ``df.columns`` —
the analog of the reference's dbt-Jinja column introspection
(turbine_etl_dbt/models/stg_cycles_raw.sql:1-9).
"""

from __future__ import annotations

from pyspark.sql import types as T

SENSOR_COUNT = 21
BASE_COLS = ["unit_nr", "time_cycles"]
SETTING_COLS = ["setting1", "setting2", "setting3"]
SENSOR_COLS = [f"sensor{i}" for i in range(1, SENSOR_COUNT + 1)]
CMAPSS_COLS = BASE_COLS + SETTING_COLS + SENSOR_COLS

_INT_COLS = {"unit_nr", "time_cycles"}


def cmapss_struct(include_dataset: bool = False) -> T.StructType:
    """Typed schema for parsed raw cycles (ints for keys, doubles elsewhere)."""
    fields = [
        T.StructField(c, T.IntegerType() if c in _INT_COLS else T.DoubleType(), True)
        for c in CMAPSS_COLS
    ]
    if include_dataset:
        fields.append(T.StructField("dataset", T.StringType(), True))
    return T.StructType(fields)


def sensor_columns(columns: list[str]) -> list[str]:
    """Sensor columns present in a column list (prefix reflection —
    the Spark analog of dbt's ``name[:6] == 'sensor'`` filter)."""
    return [c for c in columns if c.startswith("sensor")]


def feature_columns_for(sensors: list[str], windows: tuple[int, ...] = (5, 20)) -> list[str]:
    """Engineered-feature names the engine emits for a kept sensor set:
    ``mean{w}_{c}``, ``d_{c}``, ``z_{c}`` per sensor + ``rul``
    (reference scripts/etl_turbofan.py:97-103)."""
    out = ["rul"]
    for c in sensors:
        out.extend([f"mean{w}_{c}" for w in windows])
        out.append(f"d_{c}")
        out.append(f"z_{c}")
    return out

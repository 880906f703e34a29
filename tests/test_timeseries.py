"""Gap-fill / forward-fill operator semantics on crafted series."""

import datetime

from pyspark.sql import functions as F

from dex_data_ingestor_spark.operators.timeseries import (
    date_spine,
    gap_fill_daily,
)


def _d(s):
    return datetime.date.fromisoformat(s)


def test_gap_fill_daily_carries_last_value_forward(spark):
    daily = spark.createDataFrame(
        [
            (1, _d("2024-01-01"), 10.0),
            (1, _d("2024-01-04"), 40.0),  # 2 missing days before
            (2, _d("2024-02-10"), 5.0),   # single-day key: no gaps
        ],
        "user_id long, day date, day_value double",
    )
    out = gap_fill_daily(daily, ["user_id"], "day", "day_value")
    rows = {(r["user_id"], str(r["day"])): (r["day_value"], r["is_observed"])
            for r in out.collect()}
    assert rows == {
        (1, "2024-01-01"): (10.0, 1),
        (1, "2024-01-02"): (10.0, 0),
        (1, "2024-01-03"): (10.0, 0),
        (1, "2024-01-04"): (40.0, 1),
        (2, "2024-02-10"): (5.0, 1),
    }


def test_date_spine_bounds_inclusive(spark):
    daily = spark.createDataFrame(
        [(7, _d("2024-03-30"), 1.0), (7, _d("2024-04-02"), 2.0)],
        "user_id long, day date, v double",
    )
    days = [str(r["day"]) for r in
            date_spine(daily, ["user_id"], "day").orderBy("day").collect()]
    assert days == ["2024-03-30", "2024-03-31", "2024-04-01", "2024-04-02"]

"""IO-layer tests: both physical encodings of events.ts must yield
TIMESTAMP_NTZ semantics with window bounds pushed into the parquet scan
(io.load_table). The driver's generated testdata has switched encodings
between rounds (ns in early rounds, µs/NTZ now) — both branches stay
exercised here so neither is dead code when the fixture flips again.
"""

import datetime as dt
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dex_data_ingestor_spark.io import load_table
from tests.conftest import plan_formatted as _plan

WINDOW_LO = "2024-01-10 00:00:00"
WINDOW_HI = "2024-01-20 00:00:00"

#: Timestamps straddling the window, including both boundary instants:
#: the half-open contract is lo < ts <= hi, so lo itself is excluded
#: and hi itself is included.
_TS = [
    dt.datetime(2024, 1, 9, 23, 59, 59),
    dt.datetime(2024, 1, 10, 0, 0, 0),   # == lo -> excluded
    dt.datetime(2024, 1, 10, 0, 0, 1),   # first inside
    dt.datetime(2024, 1, 15, 12, 0, 0),
    dt.datetime(2024, 1, 20, 0, 0, 0),   # == hi -> included
    dt.datetime(2024, 1, 20, 0, 0, 1),   # past hi -> excluded
]
_INSIDE_IDS = [2, 3, 4]


def _write_events(tmp_path, unit: str) -> str:
    """Write a minimal events.parquet with ts at the given time unit."""
    table = pa.table(
        {
            "event_id": pa.array(range(len(_TS)), pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([1] * len(_TS), pa.int64()),
            "event_type": pa.array(["click"] * len(_TS)),
            "value": pa.array([1.0] * len(_TS)),
        }
    )
    path = str(tmp_path / "events.parquet")
    # version 2.6 is required for parquet to store TIMESTAMP(NANOS);
    # µs round-trips under any version.
    pq.write_table(table, path, version="2.6")
    return path


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_ts_window_pushes_and_is_half_open(spark, tmp_path, unit):
    _write_events(tmp_path, unit)
    df = load_table(
        spark, str(tmp_path), "events", ts_window=(WINDOW_LO, WINDOW_HI)
    )
    # Both encodings normalize to one logical type downstream.
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    plan = _plan(df)
    # The window bounds must reach the scan: directly on the NTZ column
    # (µs) or as translated long bounds (ns).
    assert re.search(
        r"PushedFilters: \[.*GreaterThan(OrEqual)?\(ts,.*\]", plan
    ), plan
    assert re.search(r"LessThanOrEqual\(ts,", plan), plan
    got = sorted(r.event_id for r in df.select("event_id").collect())
    assert got == _INSIDE_IDS


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_ts_values_identical_across_encodings(spark, tmp_path, unit):
    """The converted NTZ wall-clock values equal the written datetimes
    exactly, independent of session timezone (Asia/Hong_Kong here)."""
    _write_events(tmp_path, unit)
    df = load_table(spark, str(tmp_path), "events")
    got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    assert got == _TS


def test_ts_window_lower_bound_only(spark, tmp_path):
    _write_events(tmp_path, "ns")
    df = load_table(
        spark, str(tmp_path), "events", ts_window=(None, WINDOW_HI)
    )
    got = sorted(r.event_id for r in df.select("event_id").collect())
    assert got == [0, 1, 2, 3, 4]


def test_rebalance_never_executes_an_exchange_topped_plan(spark, tmp_path):
    """r13 optimization pin: rebalance_if_underpartitioned must not
    FORCE execution of its input. df.rdd on an AQE-wrapped plan (any
    plan with an Exchange) materializes every shuffle stage, so the
    old partition probe ran the whole upstream once per construction
    and the query re-ran it from scratch — a duplicate corpus pipeline
    per caller at any scale. Pin: calling the helper on an
    aggregated/joined input launches ZERO jobs; a narrow scan-rooted
    input still gets the splits-vs-parallelism widening."""
    from pyspark.sql import functions as F

    from dex_data_ingestor_spark.io import rebalance_if_underpartitioned

    _write_events(tmp_path, "us")
    ev = load_table(spark, str(tmp_path), "events")
    agg = ev.groupBy("event_id").agg(F.sum("value").alias("v"))

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup())
    out = rebalance_if_underpartitioned(agg)
    after = len(tracker.getJobIdsForGroup())
    assert after == before, "partition probe launched Spark jobs"
    assert out is agg, "exchange-topped input must pass through"

    # narrow scan-rooted inputs keep the widening behavior: the tiny
    # fixture reads as one split, far below session parallelism, so
    # the helper must insert the round-robin repartition
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    widened = rebalance_if_underpartitioned(ev)
    assert widened is not ev, "scan-rooted underpartitioned input kept"
    assert widened.rdd.getNumPartitions() == target


def test_rebalance_probe_skips_former_blacklist_misses(spark, tmp_path):
    """ADVICE r13 regression pin: the old keyword BLACKLIST never
    matched 'FlatMapGroupsInPandas' (its 'FlatMapGroups\\b'
    alternation could not fire mid-word) nor subquery expressions
    hidden inside a narrow Filter — both would have forced full
    upstream execution through df.rdd. The structural WHITELIST walk
    must classify both as not-probe-safe: zero jobs, input passed
    through unchanged."""
    from dex_data_ingestor_spark.io import rebalance_if_underpartitioned

    _write_events(tmp_path, "us")
    ev = load_table(spark, str(tmp_path), "events")

    def ident(pdf):
        return pdf

    grouped = ev.select("event_id", "value").groupBy("event_id").applyInPandas(
        ident, "event_id bigint, value double"
    )
    sub = spark.sql(
        "SELECT * FROM {ev} WHERE value > (SELECT avg(value) FROM {ev})",
        ev=ev,
    )

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup())
    for df in (grouped, sub):
        out = rebalance_if_underpartitioned(df)
        assert out is df, "non-narrow plan must pass through unchanged"
    after = len(tracker.getJobIdsForGroup())
    assert after == before, "partition probe launched Spark jobs"

"""Kafka wiring (no broker: option plumbing + payload parsing on
static wire-schema frames) and the gated Delta merge path."""

import datetime as dt

import pytest
from pyspark.sql import types as T

from dex_data_ingestor_spark.operators.delta import (
    delta_available,
    merge_upsert_delta,
)
from dex_data_ingestor_spark.sources.kafka import (
    KAFKA_WIRE_SCHEMA,
    kafka_batch_reader,
    kafka_stream_reader,
    parse_json_payload,
)


def test_kafka_readers_build(spark):
    r = kafka_stream_reader(
        spark, "broker:9092", "events", max_offsets_per_trigger=10000
    )
    assert r is not None
    rb = kafka_batch_reader(spark, "broker:9092", "events")
    assert rb is not None


def test_parse_json_payload(spark):
    payload_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    ts = dt.datetime(2024, 1, 1, 12)
    rows = [
        (None, b'{"event_id": 1, "user_id": 7, "value": 2.5}',
         "events", 0, 0, ts, 0),
        (None, b"not json", "events", 0, 1, ts, 0),
    ]
    wire = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    out = parse_json_payload(wire, payload_schema).collect()
    assert out[0].event_id == 1 and out[0].value == 2.5
    assert out[0].kafka_ts == ts
    # malformed payload -> NULL fields, not a job failure
    assert out[1].event_id is None


def test_delta_merge_gated(spark, tmp_path):
    """No delta-spark in this environment: the gate must raise a clear
    RuntimeError pointing at the pure-Spark merge, not an ImportError
    from inside the job."""
    if delta_available():
        pytest.skip("delta-spark installed; gate not exercised")
    src = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(RuntimeError, match="merge_upsert"):
        merge_upsert_delta(spark, str(tmp_path / "t"), src, ["k"])

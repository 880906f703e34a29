"""Kafka source wiring for the streaming twin (SURVEY §2.1 A5/H5).

The reference's "source" is a remote MySQL table polled hourly; the
streaming-native equivalent is a Kafka topic carrying the same
append-only rows. No broker exists in the test environment, so these
helpers split cleanly:

- reader builders: option plumbing only (unit-testable; ``.load()``
  requires a live broker AND the spark-sql-kafka package on the
  classpath);
- payload parsing: pure DataFrame transforms from Kafka's fixed wire
  schema (key/value binary, topic, partition, offset, timestamp) to
  typed rows — testable on static DataFrames with the same shape.

Scale posture: one Kafka partition maps to one Spark input partition;
``minPartitions`` can fan out hot topics further, and the watermark +
foreachBatch-merge pipeline downstream (streaming/jobs.py) is the same
one the parquet-backed streams use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import DataStreamReader


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataStreamReader:
    """Configured Kafka streaming reader; call ``.load()`` with a live
    broker. ``topics`` is a comma-separated subscribe list (use
    ``subscribePattern`` via ``options`` for wildcards)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader


def kafka_batch_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
    options: dict[str, str] | None = None,
):
    """Bounded (batch) Kafka read — the catch-up analog of the
    reference's boot-time window replay (main.py:40-50)."""
    reader = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader


#: Kafka's fixed wire schema (what ``.load()`` yields) — used by tests
#: to build static lookalike frames for the parsing path.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def parse_json_payload(
    kafka_df: DataFrame,
    payload_schema: T.StructType,
    ts_col: str = "kafka_ts",
) -> DataFrame:
    """Kafka wire rows -> typed rows: UTF-8 decode the value, parse
    JSON against an explicit schema (no inference — malformed records
    never fail the job), and keep the broker timestamp for
    watermarking.

    Malformed records stay FILTERABLE and REPLAYABLE: PERMISSIVE
    ``from_json`` yields an all-NULL-fields struct for unparseable
    input, which flattening alone makes indistinguishable from a valid
    message whose fields are all null — and drops the original bytes,
    so there is no dead-letter path. The parse therefore carries
    Spark's ``columnNameOfCorruptRecord`` channel and emits two marker
    columns: ``_corrupt`` (true iff the parser rejected the record)
    and ``_raw`` (the original payload text, populated ONLY for
    corrupt rows — the dead-letter/replay copy; NULL otherwise so the
    happy path carries no duplicate payload bytes). Downstream:
    ``.filter(~F.col("_corrupt"))`` for the clean stream,
    ``.filter("_corrupt")`` for the dead-letter sink."""
    corrupt_field = "_corrupt_record"
    # contract check, not a debug assert: under ``python -O`` an assert
    # is stripped, and a payload schema declaring _corrupt_record would
    # then silently alias the parser's corrupt-record channel (every
    # row with a non-null field value would flag as corrupt)
    if corrupt_field in payload_schema.fieldNames():
        raise ValueError(
            f"payload schema may not declare {corrupt_field!r}: it is "
            "the parser's corrupt-record channel"
        )
    # build a copy — StructType.add mutates the caller's schema object
    schema = T.StructType(
        list(payload_schema.fields)
        + [T.StructField(corrupt_field, T.StringType())]
    )
    parsed = kafka_df.select(
        F.col("timestamp").alias(ts_col),
        F.from_json(
            F.col("value").cast("string"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_field},
        ).alias("payload"),
    )
    return parsed.select(
        ts_col,
        *[f"payload.{f}" for f in payload_schema.fieldNames()],
        F.col(f"payload.{corrupt_field}")
        .isNotNull()
        .alias("_corrupt"),
        F.col(f"payload.{corrupt_field}").alias("_raw"),
    )

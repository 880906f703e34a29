"""SparkSession factory with the engine's standard configuration.

The reference pins every timestamp to Asia/Hong_Kong
(reference: src/main.py:33-34, src/ingestion/SqlDbEtl.py:78-80); we pin
the *session* timezone once instead of localizing per value. All
engine-internal analytics, however, operate on TIMESTAMP_NTZ columns
(naive wall-clock, the same semantics the reference's MySQL DATETIME
columns carry), so results do not silently shift when a host session
uses a different zone.

Scale posture: AQE on (runtime re-planning, skew-join splitting),
shuffle partitions sized for the local harness but overridable for a
real cluster via ``SPARK_GRAFT_CPUS`` / explicit config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that are safe (and necessary) to apply to *any* session that
#: uses this engine, including one handed to us by an external driver.
RUNTIME_CONFS: dict[str, str] = {
    # The driver-generated events table stores TIMESTAMP(NANOS) which
    # Spark's parquet reader rejects unless nanos are surfaced as longs;
    # io.load_table() then converts ns-longs to TIMESTAMP_NTZ.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime adaptivity: re-plan with real statistics, split skewed
    # shuffle partitions, coalesce tiny ones — essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


#: Sessions already configured (by applicationId) — configure_session
#: is called defensively from every load_table; skip the conf round
#: trips after the first call on a given session.
_CONFIGURED: set[str] = set()


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Idempotent; used both by :func:`get_session` and defensively by the
    IO layer when the engine runs inside a session it did not build.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _CONFIGURED:
        return spark
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A locked-down session (static conf) — reads of ns-parquet
            # will fail loudly later with a clear Spark error.
            pass
    _CONFIGURED.add(app_id)
    return spark


def get_session(
    app_name: str = "dex-data-ingestor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    timezone: str = "Asia/Hong_Kong",
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for the test/bench harness; on a real cluster pass ``None`` via
    spark-submit and the cluster manager decides.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", timezone)
        # Arrow for any pandas_udf path (vectorized slow-path escape hatch).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return configure_session(spark)

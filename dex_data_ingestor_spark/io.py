"""Source layer: parquet loaders for the testbed tables.

Replaces the reference's per-statement MySQL scans (reference:
src/ingestion/SqlDbEtl.py:49-70 — one TCP connection per statement,
full ``fetchall()`` into driver memory) with Spark parquet sources:
distributed scans, predicate pushdown, column pruning, and no driver
materialization.

Scale note: at 100 TB the same call reads a partitioned parquet/Delta
layout; nothing here assumes single-file inputs
(``spark.read.parquet`` accepts directories), and no method collects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from dex_data_ingestor_spark.session import configure_session

#: Canonical testbed table names (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Epoch in NTZ form; used to rebuild TIMESTAMP_NTZ from nanosecond longs
#: without any dependence on the session timezone.
_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _ns_long_to_ntz(col_name: str):
    """Nanosecond-epoch long -> TIMESTAMP_NTZ (microsecond floor).

    Timezone-independent: timestampadd on an NTZ literal never consults
    the session zone, so the same wall-clock instant is produced under
    any host session configuration.
    """
    return F.expr(f"timestampadd(MICROSECOND, {col_name} div 1000, {_EPOCH_NTZ})")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testbed table, normalizing timestamp physical types.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark only
    reads as a long (``spark.sql.legacy.parquet.nanosAsLong``); it is
    converted here to TIMESTAMP_NTZ so every downstream operator sees
    one timestamp type regardless of file encoding.
    """
    configure_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", _ns_long_to_ntz("ts"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load several testbed tables as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register the testbed tables as temp views for spark.sql use."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)

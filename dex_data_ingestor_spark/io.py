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

import datetime as dt
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

#: Raw-read memo: (applicationId, abspath) -> (stat_sig, DataFrame).
#: DataFrames are immutable logical plans, so reusing one skips the
#: file listing + footer/schema read every load_table call repays
#: (~100 ms per table per query on the bench loop). The stat signature
#: invalidates the entry if the file is replaced.
_RAW_READS: dict[tuple[str, str], tuple[tuple, DataFrame]] = {}


def table_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through Spark's Hadoop FileSystem, so
    scheme-qualified paths (s3a://, hdfs://) behave exactly like local
    ones. ``os.path.exists`` sees only the driver's local filesystem —
    against a remote table it returns False every time, which turns
    "merge into existing" write paths into silent full overwrites of
    the remote table (the table looks freshly-initialized on every
    run). Every engine write path that branches on table existence
    must come through here."""
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(hconf).exists(hpath)


def _stat_sig(path: str) -> tuple:
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return (None, None)


def _read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    path = os.path.abspath(path)
    # Memoize regular files only: a directory-backed table can have a
    # part file replaced in place without changing the directory's own
    # mtime/size, so the stat signature cannot witness staleness there
    # (and a cached DataFrame would carry a stale file listing).
    if not os.path.isfile(path):
        return spark.read.parquet(path)
    key = (spark.sparkContext.applicationId, path)
    sig = _stat_sig(path)
    hit = _RAW_READS.get(key)
    if hit is not None and hit[0] == sig:
        return hit[1]
    df = spark.read.parquet(path)
    _RAW_READS[key] = (sig, df)
    return df


def _ns_long_to_ntz(col_name: str):
    """Nanosecond-epoch long -> TIMESTAMP_NTZ (microsecond floor).

    Timezone-independent: timestampadd on an NTZ literal never consults
    the session zone, so the same wall-clock instant is produced under
    any host session configuration.
    """
    return F.expr(f"timestampadd(MICROSECOND, {col_name} div 1000, {_EPOCH_NTZ})")


def _ntz_str_to_epoch_us(value: str | dt.datetime) -> int:
    if isinstance(value, str):
        value = dt.datetime.fromisoformat(value)
    return (value - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_window: tuple | None = None,
) -> DataFrame:
    """Load one testbed table, normalizing timestamp physical types.

    ``events.ts`` has appeared in two physical encodings across driver
    generations; both are supported and both yield TIMESTAMP_NTZ with
    pushdown-able window bounds:

    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) — Spark reads it
      natively as TIMESTAMP_NTZ and pushes comparison predicates into
      the scan directly (``PushedFilters: [GreaterThan(ts,…)]``), so the
      window filter below is already the scan-pruning form;
    - parquet TIMESTAMP(NANOS) — Spark only reads it as a long
      (``spark.sql.legacy.parquet.nanosAsLong``); a filter on the
      derived NTZ column cannot push past the conversion expression, so
      the bounds are translated to raw nanosecond-long bounds that
      Catalyst pushes into the parquet scan (row-group pruning), then
      the column is converted to TIMESTAMP_NTZ.

    ``ts_window=(lo, hi)`` is the half-open incremental range
    ``lo < ts <= hi`` — at 100 TB the pushed bounds are the difference
    between a window read and a full scan. The exact filter on the
    (converted) NTZ column always applies as well: it is the pushed
    predicate itself in the µs case and a semantic no-op after the
    ns-long bounds in the nanos case.
    """
    configure_session(spark)
    df = _read_parquet_cached(spark, os.path.join(sf_dir, f"{name}.parquet"))
    ts_dtype = dict(df.dtypes).get("ts")
    if name == "events" and ts_dtype not in (None, "bigint", "timestamp_ntz"):
        # A third plausible encoding — TIMESTAMP(MICROS, isAdjustedToUTC
        # =true) — would silently read as session-tz 'timestamp' and
        # shift ts_window/date-bucket semantics under a hostile session
        # timezone. Fail loudly instead of drifting: the one-timestamp-
        # type invariant (everything downstream sees TIMESTAMP_NTZ) is
        # load-bearing for every oracle-checked window query.
        raise TypeError(
            f"events.ts read as '{ts_dtype}'; expected a nanosecond "
            "long (legacy nanosAsLong) or TIMESTAMP_NTZ. A UTC-adjusted "
            "parquet timestamp would silently re-zone the incremental "
            "window — refusing to guess."
        )
    is_ns_long = name == "events" and ts_dtype == "bigint"
    if ts_window is not None and is_ns_long:
        lo, hi = ts_window
        # floor(ns/1000) >  lo_us  <=>  ns >= (lo_us + 1) * 1000
        # floor(ns/1000) <= hi_us  <=>  ns <= (hi_us + 1) * 1000 - 1
        if lo is not None:
            df = df.filter(
                F.col("ts") >= F.lit((_ntz_str_to_epoch_us(lo) + 1) * 1000)
            )
        if hi is not None:
            df = df.filter(
                F.col("ts") <= F.lit((_ntz_str_to_epoch_us(hi) + 1) * 1000 - 1)
            )
    if is_ns_long:
        df = df.withColumn("ts", _ns_long_to_ntz("ts"))
    if ts_window is not None:
        lo, hi = ts_window
        ts_col = "ts" if "ts" in df.columns else None
        if ts_col:
            if lo is not None:
                df = df.filter(F.col(ts_col) > F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(ts_col) <= F.lit(hi))
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


def rebalance_if_underpartitioned(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the source has fewer splits
    than the session's shuffle parallelism.

    CPU-heavy narrow stages (per-gram/token hashing, regex sweeps)
    inherit the scan's task count; a few-row-group parquet source then
    runs the whole corpus on a handful of cores. At 100 TB inputs have
    thousands of splits and this is a no-op (no shuffle inserted); on
    a compacted/small source it spreads the narrow work across the
    cluster for the price of shuffling the input rows once.

    The check must never EXECUTE the upstream plan. ``df.rdd`` on an
    AQE-wrapped plan (any plan containing an Exchange) finalizes the
    adaptive plan, which MATERIALIZES every shuffle stage — the whole
    upstream runs once for the partition probe and then AGAIN when the
    real query executes (shuffle output is not reused across separate
    query executions). Measured r13: constructing q_curate_stripped
    cost 4.3-5.4 s of forced upstream execution per call on top of the
    6 s query itself; at 100 TB the same double-execution is
    catastrophic. So:

    - plan contains a shuffle-introducing operator (join, aggregate,
      window, sort, repartition, ...): return ``df`` unchanged. The
      input arrives AQE-sized (``coalescePartitions.parallelismFirst``
      targets cluster parallelism, floored at ``minPartitionSize``);
      probing its exact post-AQE count is what forced the execution.
      Detection reads the ANALYZED logical plan, which PySpark has
      already computed eagerly at DataFrame creation — checking the
      physical plan instead would re-run optimization + planning of
      the whole subtree per call (measured: ~2 s of pure driver
      planning per q_curate_stripped construction).
    - narrow scan-rooted plan: ``df.rdd`` builds without running any
      job (no adaptive subtree to materialize), so the exact
      splits-vs-parallelism check is free — keep it.

    Probe-safety is decided by a STRUCTURAL WHITELIST walk over the
    analyzed plan's node classes (ADVICE r13 closed the keyword
    screen's two holes: a blacklist alternation that never matched its
    real node name — 'Rebalance' vs 'RebalancePartitions',
    'FlatMapGroups' vs 'FlatMapGroupsInPandas' — silently
    reintroduced the double execution, and subquery expressions hid
    shuffling subtrees inside otherwise-narrow Filters). Under the
    whitelist, the failure mode inverts: an unknown node class, a
    subquery expression, an over-budget plan, or any py4j error skips
    the probe, which only skips an OPTIONAL widening shuffle — never
    executes upstream work.
    """
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if not _probe_safe(df._jdf.queryExecution().analyzed()):  # noqa: SLF001
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


#: Logical node classes that are NARROW and scan-rooted-safe:
#: converting a plan made only of these to an RDD builds without
#: running a job. Anything else (joins, aggregates, windows, sorts,
#: repartitions, pandas/arrow group maps, CTEs, ...) is NOT listed —
#: a whitelist cannot have the blacklist's silent-miss failure mode.
_NARROW_NODE_CLASSES = frozenset(
    {
        "Project",
        "Filter",
        "Generate",
        "SubqueryAlias",
        "View",
        "Union",
        "LocalLimit",
        "Sample",
        "Range",
        "LogicalRelation",
        "DataSourceV2Relation",
        "DataSourceV2ScanRelation",
        "LocalRelation",
        "OneRowRelation",
        "LogicalRDD",
    }
)

#: Node budget for the safety walk: a genuine narrow scan plan is a
#: handful of nodes; anything larger is skipped without walking it
#: (bounds the py4j round-trip cost the r13 fix removed).
_PROBE_WALK_BUDGET = 64


def _probe_safe(jplan) -> bool:
    """True iff every node of the analyzed logical plan is a
    whitelisted narrow class and no node carries a subquery
    expression (a scalar/IN subquery makes ``df.rdd`` finalize — i.e.
    EXECUTE — the subquery's upstream even under a narrow root).
    Any uncertainty (unknown class, py4j failure, over-budget tree)
    returns False: the caller then skips an optional repartition,
    which is always safe."""
    try:
        stack, seen = [jplan], 0
        while stack:
            node = stack.pop()
            seen += 1
            if seen > _PROBE_WALK_BUDGET:
                return False
            name = node.getClass().getSimpleName().rstrip("$")
            if name not in _NARROW_NODE_CLASSES:
                return False
            if not node.subqueries().isEmpty():
                return False
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
        return True
    except Exception:
        return False

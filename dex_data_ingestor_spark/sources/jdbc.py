"""JDBC source/sink wrappers (SURVEY §2.1 A1/A2).

The reference opens one MySQL connection PER STATEMENT and fetches
whole result sets into driver memory (reference:
src/ingestion/SqlDbEtl.py:49-70). The Spark replacements:

- reads partition on a numeric/timestamp column (``numPartitions``
  parallel range scans — no single-connection bottleneck, no driver
  materialization);
- incremental reads push the half-open window into the remote query so
  the database ships only the new slice;
- writes batch through executor-side connections (``batchsize``),
  replacing O(rows) round trips with O(partitions) sessions.

No MySQL is reachable in the test environment, so these build readers/
writers (option plumbing is unit-tested); the parquet loaders in io.py
play the source role everywhere else in the testbed.
"""

from __future__ import annotations

import datetime as _dt
import math
import re

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

# Identifiers we interpolate into pushdown SQL must be plain
# (optionally dot-qualified) names — anything else is rejected rather
# than quoted, because quoting rules are dialect-specific and the
# reference used parameterized queries (%s) for the same window.
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?$")


def _safe_ident(name: str) -> str:
    if not _IDENT_RE.match(name):
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    return name


def _sql_literal(value) -> str:
    """Render a window bound as a typed SQL literal (never raw
    interpolation of arbitrary strings)."""
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        # repr(inf/nan) would interpolate the bare tokens `inf`/`nan`
        # into the remote SQL — a syntax error at best, a column
        # reference at worst; reject like any other unsafe value
        if isinstance(value, float) and not math.isfinite(value):
            raise ValueError(f"non-finite SQL bound literal: {value!r}")
        return repr(value)
    if isinstance(value, _dt.datetime):
        return "'" + value.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
    if isinstance(value, _dt.date):
        return "'" + value.isoformat() + "'"
    s = str(value)
    # ISO-ish timestamp/date strings only; anything else must come in
    # as a typed value.
    if not re.match(r"^[0-9][0-9:\- .T]*$", s):
        raise ValueError(f"unsafe SQL bound literal: {value!r}")
    return "'" + s + "'"


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    options: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
) -> DataFrameReader:
    """Configured JDBC reader; call ``.load()`` against a live DB.

    ``table_or_query`` may be a table name or a ``(SELECT ...) q``
    derived-table alias — the reference's per-task SELECT lists become
    pushdown-friendly dbtable expressions.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
    )
    if partition_column is not None:
        # str(None) would ship the literal option value "None" and fail
        # deep inside the JDBC source at load time; reject at build time
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "jdbc_reader: partition_column requires explicit "
                "lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader


def jdbc_incremental_reader(
    spark: SparkSession,
    url: str,
    table: str,
    ts_col: str,
    lo,
    hi,
    columns: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> DataFrameReader:
    """Incremental window scan pushed into the remote database — the
    reference's ``WHERE created_at > %s AND created_at <= %s``
    (Bifrost.py:90) as a server-side slice; only new rows cross the
    wire.

    Identifiers are validated and the window bounds rendered as typed
    literals — raw f-string interpolation of caller strings into SQL
    (the round-1 form) is rejected with ``ValueError``.
    """
    cols = ", ".join(_safe_ident(c) for c in columns) if columns else "*"
    query = (
        f"(SELECT {cols} FROM {_safe_ident(table)} "
        f"WHERE {_safe_ident(ts_col)} > {_sql_literal(lo)} "
        f"AND {_safe_ident(ts_col)} <= {_sql_literal(hi)}) AS incr"
    )
    return jdbc_reader(spark, url, query, options)


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    options: dict[str, str] | None = None,
    batchsize: int = 10000,
):
    """Configured JDBC writer; call ``.save()`` against a live DB.

    For MERGE semantics into an RDBMS, stage with this writer and issue
    one server-side ``INSERT ... SELECT ... ON DUPLICATE KEY UPDATE``,
    or target a lakehouse table via operators.merge.merge_upsert — the
    reference's row-at-a-time upserts are never reproduced.
    """
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    return writer

"""Bucketed-table layout: shuffle-free co-located joins.

The reference resolves every fact→dim key with per-row SELECTs
(src/ingestion/tasks/bifrost/Bifrost.py:78-85 — an N+1 network round
trip per row). Spark's set-oriented equivalent is a join, and for the
big-fact ⋈ big-fact case (too large to broadcast either side) the
dominant cost at 100 TB is the shuffle of BOTH sides on the join key —
every query, every hour, forever.

Bucketing amortizes that shuffle into the write path: store each table
hash-partitioned (CLUSTERED BY) on its join key once, and every later
join/groupBy on that key reads co-located buckets and skips the
exchange entirely. This is the classic warehouse layout for
fact-to-fact joins (orders ⋈ lineitem on orderkey) and repeated
per-key rollups.

Rules encoded here (and asserted by tests/test_bucketed.py on the
physical plan):

- both sides bucketed on the SAME keys with the SAME bucket count
  -> SortMergeJoin with zero Exchange operators;
- bucket count is a layout constant (power of two; at 100 TB pick
  buckets so each bucket file lands near the 128-512 MB sweet spot —
  ~1024-4096 for a 1 TB-per-day fact);
- ``sortBy`` the same keys so the join can also skip the per-bucket
  sort once Spark reports sorted buckets (today it still sorts, but
  the files are sort-ready and statistics-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed, sorted parquet table.

    The bucket spec lives in the session catalog; readers via
    ``spark.table(table)`` get the co-location guarantee. (With an
    in-memory catalog the spec lasts for the session; pair with a Hive
    metastore / Unity-style catalog for durability on a real cluster.)
    ``path`` makes it an external table at that location instead of a
    managed table under the session warehouse dir — tests use this to
    keep data out of the repo checkout.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.

    With matching bucket specs Catalyst plans a SortMergeJoin whose
    children are bucket-aware scans — no Exchange on either side. The
    physical-plan assertion lives in tests/test_bucketed.py, so a
    Spark upgrade that silently re-introduces the shuffle fails CI.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the STATIC physical plan
    (pre-AQE: stringifying an unexecuted queryExecution shows the
    initial plan, and a .count() on the DataFrame runs a different
    queryExecution). Exchanges AQE later replaces (e.g. with a runtime
    broadcast) still count — use it to assert absences, as the
    bucketing tests do, not exact counts under AQE."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )

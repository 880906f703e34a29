"""Delta Lake MERGE path (gated): the production form of merge_upsert.

The pure-Spark ``operators.merge.merge_upsert`` (union + key-grouped
column-wise resolve + overwrite) is the oracle-checked semantics; on a
lakehouse with Delta available, the same contract maps to a real
``MERGE INTO`` — transactional, partition-pruned, no full rewrite.
delta-spark is not installed in the test environment, so everything
here is import-gated and fails with a clear message instead of an
ImportError deep inside a job.

Reference parity: INSERT ... ON DUPLICATE KEY UPDATE with per-source
partial update column sets (reference: src/ingestion/tasks/bifrost/
Bifrost.py:116-124, Stellar.py:138-148 — SURVEY §2.1 F1-F3).

Semantics are constructed to match :func:`..merge.merge_upsert`
EXACTLY. A parametrized parity test (tests/test_merge.py) asserts it
case-by-case, but ONLY when delta-spark is importable — in this
sandbox it never is (no network; the pip attempt is recorded in
NOTES.md), so the parity claim is by-construction, not CI-executed.
Treat this module as unexecuted code until a deployment with
delta-spark runs that test:

- key conflict: columns in ``update_cols`` (all target non-keys when
  None) take the update row's value INCLUDING an explicit NULL; other
  columns keep the existing row's values;
- new key: the full update row inserts (missing columns NULL-filled);
- NULL keys match each other (null-safe comparison), mirroring the
  groupBy-on-keys resolve of the pure-Spark path;
- ``updates`` must be unique per key, as in ``merge_upsert``.

Why this exists: the pure-parquet path rewrites the table directory
per merge — correct and oracle-checkable, but a real 100 TB fact
table needs ACID MERGE with file-level conflict detection, data
skipping on the key condition, and concurrent reader isolation, which
is exactly Delta's MERGE INTO. At scale, partition the Delta table by
date and include the partition column in ``keys`` (or a match
predicate) so MERGE prunes to the touched partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def delta_available() -> bool:
    """True when the delta-spark package is importable."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def merge_upsert_delta(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
) -> None:
    """MERGE ``updates`` into the Delta table at ``target_path``.

    ``update_cols=None`` updates every non-key column (F1 full upsert);
    a subset gives the reference's partial update sets (F2/F3) — other
    columns keep their existing values, exactly like
    ``merge.merge_upsert(..., update_cols=...)``. See the module
    docstring for the full semantics contract.
    """
    if not keys:
        raise ValueError("merge_upsert_delta requires at least one key")
    if not delta_available():
        raise RuntimeError(
            "delta-spark is not installed; use "
            "dex_data_ingestor_spark.operators.merge.merge_upsert "
            "(pure-Spark, same semantics) or add the delta-spark "
            "package and spark.sql.extensions config"
        )
    from delta.tables import DeltaTable

    tgt = DeltaTable.forPath(spark, target_path)
    tgt_df = tgt.toDF()
    target_cols = tgt_df.columns
    target_types = dict(tgt_df.dtypes)
    upd = updates
    for c in (c for c in target_cols if c not in updates.columns):
        upd = upd.withColumn(c, F.lit(None).cast(target_types[c]))
    upd = upd.select(*target_cols)

    non_keys = [c for c in target_cols if c not in keys]
    # Same contract as merge_upsert: unknown update_cols raise here too,
    # so a typo surfaces identically on both paths instead of failing
    # only at Delta MERGE analysis time.
    unknown = (
        set(update_cols) - set(non_keys) if update_cols is not None else set()
    )
    if unknown:
        raise ValueError(
            f"update_cols not in target non-key columns: {sorted(unknown)}"
        )
    update_set = {
        c: F.col(f"s.{c}")
        for c in (update_cols if update_cols is not None else non_keys)
    }
    # eqNullSafe mirrors merge_upsert's groupBy, where NULL keys
    # compare equal to each other.
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    merge = tgt.alias("t").merge(upd.alias("s"), cond)
    if update_set:
        merge = merge.whenMatchedUpdate(set=update_set)
    merge.whenNotMatchedInsertAll().execute()

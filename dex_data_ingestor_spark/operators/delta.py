"""Delta Lake MERGE path (gated): the production form of merge_upsert.

The pure-Spark ``operators.merge.merge_upsert`` (union + row_number +
column-wise coalesce + overwrite) is the oracle-checked semantics; on a
lakehouse with Delta available, the same contract maps to a real
``MERGE INTO`` — transactional, partition-pruned, no full rewrite.
delta-spark is not installed in the test environment, so everything
here is import-gated and fails with a clear message instead of an
ImportError deep inside a job.

Reference parity: INSERT ... ON DUPLICATE KEY UPDATE with per-source
partial update column sets (reference: src/ingestion/tasks/bifrost/
Bifrost.py:116-124, Stellar.py:138-148 — SURVEY §2.1 F1-F3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


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
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
) -> None:
    """MERGE ``source`` into the Delta table at ``target_path``.

    ``update_cols=None`` updates every non-key column (F1 full upsert);
    a subset gives the reference's partial update sets (F2/F3) — other
    columns keep their existing values, exactly like
    ``merge.merge_upsert(..., update_cols=...)``.
    """
    if not delta_available():
        raise RuntimeError(
            "delta-spark is not installed; use "
            "dex_data_ingestor_spark.operators.merge.merge_upsert "
            "(pure-Spark, same semantics) or add the delta-spark "
            "package and spark.sql.extensions config"
        )
    from delta.tables import DeltaTable

    target = DeltaTable.forPath(spark, target_path)
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    cols = update_cols
    if cols is None:
        cols = [c for c in source.columns if c not in set(keys)]
    update_set = {c: f"s.{c}" for c in cols}
    (
        target.alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdate(set=update_set)
        .whenNotMatchedInsertAll()
        .execute()
    )

"""Set-oriented MERGE (upsert) — the reference's signature write pattern.

Every reference write is a per-row ``INSERT ... ON DUPLICATE KEY
UPDATE`` with a per-call-site *subset* of update columns (reference:
Bifrost.py:116-124,154-180, Hydration.py:54-91,231-306,
Stellar.py:84-170, SqlDbEtl.py:206-229; SURVEY.md §2.1-F). The engine
replaces O(rows) statements with one distributed plan:

    union(existing, updates) -> resolve per key, column-wise

MySQL ``ON DUPLICATE KEY UPDATE col = VALUES(col)`` semantics are
reproduced exactly: on a key conflict, *updated* columns take the new
row's value (including an explicit NULL), non-updated columns keep the
existing row's value; a brand-new key inserts the full new row.

Idempotence (reference H4 guarantee — re-running a window is harmless)
holds: applying the same batch twice yields the same table.

Scale posture: one shuffle on the merge keys; AQE handles skew. On a
lakehouse this operator is the ``foreachBatch`` body against Delta
``MERGE INTO``; the pure-Spark path here has identical semantics and is
what the oracle checks. At 100 TB, partition the stored table by date
and merge only affected partitions (dynamic partition overwrite), so
the union never rewrites cold data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def merge_upsert(
    existing: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Upsert ``updates`` into ``existing`` on ``keys``.

    update_cols=None  -> full-row replace on conflict.
    update_cols=[...] -> only those columns refresh on conflict; all
    other non-key columns retain the existing row's values.

    ``updates`` must be unique per key (pre-aggregate or
    ``dedup_first`` a raw batch — the reference's per-batch ``processed``
    sets do exactly that, reference: Stellar.py:83,179). ``updates`` may
    omit non-updated columns; they are null-filled before the union.

    NULL-key semantics are NULL-SAFE (a NULL key matches a NULL key):
    the implementation is one groupBy on the keys, and groupBy treats
    NULL as a real group. This is deterministic and documented —
    unlike SQL MERGE ``ON a = b``, which never matches NULLs and
    would make repeated merges accumulate duplicate NULL-key rows.
    Oracles mirror with ``IS NOT DISTINCT FROM``.
    """
    cols = existing.columns
    upd = updates
    # case-INSENSITIVE presence check: Spark resolves names
    # case-insensitively by default, so null-filling 'v' when the
    # source carries 'V' would REPLACE the source column with NULLs
    # via withColumn's case-insensitive match (the select below
    # resolves the case variant correctly on its own)
    upd_lc = {c.lower() for c in updates.columns}
    for c in (c for c in cols if c.lower() not in upd_lc):
        upd = upd.withColumn(c, F.lit(None).cast(dict(existing.dtypes)[c]))
    upd = upd.select(*cols)

    non_keys = [c for c in cols if c not in keys]
    update_set = set(update_cols) if update_cols is not None else set(non_keys)
    # Same contract as merge_upsert_delta: an update_cols entry that is
    # not a target non-key column is a typo, not a silent no-op (the
    # Delta path would only surface it at MERGE analysis time).
    unknown = update_set - set(non_keys)
    if unknown:
        raise ValueError(
            f"update_cols not in target non-key columns: {sorted(unknown)}"
        )

    tagged = existing.withColumn("__src", F.lit(0)).unionByName(
        upd.withColumn("__src", F.lit(1))
    )
    # One hash-aggregate on the keys: bundle each side's non-key columns
    # into a struct so "no row from this side" is a NULL struct,
    # distinguishable from "row present with NULL fields".
    bundle = F.struct(*[F.col(x) for x in non_keys])
    grouped = tagged.groupBy(*keys).agg(
        F.max(F.when(F.col("__src") == 1, bundle)).alias("__new"),
        F.max(F.when(F.col("__src") == 0, bundle)).alias("__old"),
    )
    resolved: dict[str, F.Column] = {k: F.col(k) for k in keys}
    for c in non_keys:
        new_v, old_v = F.col(f"__new.{c}"), F.col(f"__old.{c}")
        if c in update_set:
            # conflict or insert -> new value; delete-side only -> old.
            expr = F.when(F.col("__new").isNotNull(), new_v).otherwise(old_v)
        else:
            # kept column: existing value wins; fresh key -> new row's.
            expr = F.when(F.col("__old").isNotNull(), old_v).otherwise(new_v)
        resolved[c] = expr
    # preserve the existing table's column order (stable stored schema
    # across repeated merges)
    return grouped.select(*[resolved[c].alias(c) for c in cols])


def cdc_apply(
    changes: DataFrame,
    keys: list[str],
    order_by: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a CDC changelog to current state: per key, the change
    with the highest ``order_by`` wins; keys whose winning change is a
    delete vanish from the output.

    The reference's warehouse only ever upserts (INSERT ... ON
    DUPLICATE KEY UPDATE, Bifrost.py:116-124) — delete handling is the
    missing half a real changelog consumer (Debezium/binlog) needs.
    Plan shape: ONE hash-partitioned rank window on the keys, then a
    narrow filter; at 100 TB this is the standard "compact the
    changelog" shuffle, skew-safe under AQE. Ties on ``order_by`` are
    broken by preferring the delete (a delete and upsert at the same
    instant resolve to absent — the conservative read).
    """
    winners = _cdc_winners(changes, keys, order_by, op_col, delete_op)
    return winners.filter(F.col(op_col) != delete_op)


def _cdc_winners(
    changes: DataFrame,
    keys: list[str],
    order_by: list[str],
    op_col: str,
    delete_op: str,
) -> DataFrame:
    """Per-key winning change row: highest ``order_by``, delete
    preferred at an exact tie. The ONE copy of the compaction rank —
    cdc_apply and merge_apply_cdc both defer here, so the tie-break
    rule cannot desynchronize between whole-log compaction and its
    incremental fold (the equivalence the property test pins)."""
    from pyspark.sql import Window

    is_del = (F.col(op_col) == delete_op).cast("int")
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_by], is_del.desc()
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_apply_cdc(
    existing: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_by: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC micro-batch to current state: compact the batch
    with :func:`cdc_apply`, upsert the winners, drop deleted keys.

    Incremental application is equivalent to whole-log compaction
    (property-tested): for any split of a changelog into ordered
    batches, folding ``merge_apply_cdc`` over them yields exactly
    ``cdc_apply`` of the concatenated log — provided ``order_by`` is
    globally monotonic across batches (true for binlog positions and
    the reference's created_at cursor). This is the foreachBatch sink
    for a Debezium-style stream: one rank window per batch + one
    key-partitioned merge, both skew-safe under AQE.
    """
    winners = _cdc_winners(changes, keys, order_by, op_col, delete_op)
    deletes = winners.filter(F.col(op_col) == delete_op).select(*keys)
    upserts = winners.filter(F.col(op_col) != delete_op).drop(op_col)
    survived = existing.join(deletes, keys, "left_anti")
    return merge_upsert(survived, upserts, keys)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Set-oriented diff of two keyed tables: one row per key that was
    added, removed, or changed — (keys..., status, changed_cols).

    ``status`` is 'added' (key only in new), 'removed' (only in old) or
    'changed' (present in both, some compared column differs under
    null-safe comparison); identical rows are NOT emitted, so the
    output is |delta|-sized — the property that makes this usable as a
    migration/backfill validator at 100 TB (full-outer join on the key,
    both sides shuffle-partitioned by it, output bounded by the drift).
    ``changed_cols`` is the comma-joined sorted list of differing
    columns ('' for added/removed).
    """
    cmp_cols = (
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c not in keys]
    )
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in cmp_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in cmp_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in keys:
        # NULL-SAFE, like merge_upsert's groupBy key semantics in this
        # module: with a plain ==, a NULL-key row present identically
        # in both versions never matches itself and reports phantom
        # 'removed' + 'added' drift on every diff (and every CDF /
        # incremental-refresh built on it applies spurious deltas)
        c = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        ).otherwise(F.lit(None))
        for c in cmp_cols
    ]
    changed_arr = F.array_sort(
        F.filter(F.array(*diffs), lambda x: x.isNotNull())
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_arr) > 0, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
        F.when(status == "changed", F.array_join(changed_arr, ","))
        .otherwise(F.lit("")).alias("changed_cols"),
    )
    return out.filter(F.col("status") != "same")

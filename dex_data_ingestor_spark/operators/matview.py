"""Incremental materialized-aggregate maintenance over versioned
tables — the lakehouse pattern that keeps a grouped roll-up fresh for
|delta| cost instead of a full recompute.

The reference recomputes its downstream aggregates from scratch every
hour (src/ingestion/SqlDbEtl.py:90-110 re-reads the whole source
window); at 100 TB a full groupBy over the fact table per refresh is
the dominant cost of the pipeline. The self-maintainable aggregates
(COUNT, SUM, and AVG = SUM/COUNT) admit exact incremental maintenance:
apply the per-group contribution of removed rows with sign -1 and of
added rows with sign +1, then merge the signed deltas into the stored
aggregate — O(|delta| + |touched groups|), never O(table).

Exactness discipline: measures are summed as DECIMAL(18,6) addends
(order-free, exact — the testbed's cross-engine sum rule), so
``maintain == full recompute`` is an EQUALITY, not a tolerance. A
float-double running sum would drift under incremental updates — the
classic reason naive materialized views go stale-wrong; the decimal
path makes the maintained view bit-identical to a from-scratch build
forever. MIN/MAX are deliberately absent: they are not maintainable
under deletes without per-group history (re-aggregate the touched
groups instead).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

#: decimal(38,6) holds ~3e31 in exact 1e-6 steps — SUM over
#: decimal(18,6) addends can never overflow it at any group size
#: Spark can shuffle.
_SUM_TYPE = "decimal(38,6)"


def grouped_sums(
    df: DataFrame,
    group_cols: Sequence[str],
    measures: Sequence[str],
) -> DataFrame:
    """Build (or rebuild) the aggregate table: one row per group with
    ``n_rows`` and an exact ``sum_<m>`` per measure. This is the
    from-scratch path — run once to seed, then keep fresh with
    :func:`maintain_grouped_sums`."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(m).cast("decimal(18,6)"))
        .cast(_SUM_TYPE)
        .alias(f"sum_{m}")
        for m in measures
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def maintain_grouped_sums(
    base_agg: DataFrame,
    removed_rows: DataFrame,
    added_rows: DataFrame,
    group_cols: Sequence[str],
    measures: Sequence[str],
) -> DataFrame:
    """Merge the signed contribution of ``removed_rows`` /
    ``added_rows`` into ``base_agg`` (a :func:`grouped_sums` output).
    An updated row appears on BOTH sides (its pre-image removed, its
    post-image added). Groups whose row count reaches zero are
    dropped — a group is defined by having rows, and a stale
    zero-row group would resurrect with wrong sums on the next
    insert.

    Plan: one groupBy over the |delta| rows, then one key-partitioned
    full-outer join against the aggregate table — both sides hash on
    the group key; nothing scales with the fact table. At 100 TB the
    aggregate table is itself a snapshot table: read, maintain,
    commit the new version (:func:`snapshot_refresh_agg` wires
    that)."""
    delta = removed_rows.select(
        *group_cols,
        F.lit(-1).alias("__sign"),
        *[F.col(m) for m in measures],
    ).unionByName(
        added_rows.select(
            *group_cols,
            F.lit(1).alias("__sign"),
            *[F.col(m) for m in measures],
        )
    )
    daggs = [F.sum("__sign").cast("bigint").alias("__dn")] + [
        F.sum(
            F.col("__sign") * F.col(m).cast("decimal(18,6)")
        )
        .cast(_SUM_TYPE)
        .alias(f"__d_{m}")
        for m in measures
    ]
    d = delta.groupBy(*group_cols).agg(*daggs)
    keys = list(group_cols)
    zero = F.lit(0).cast(_SUM_TYPE)
    # NULL-SAFE key equality: groupBy treats NULL as a real group, so
    # the merge join must too — a plain equi-join would leave a NULL
    # group's stale base row AND its delta row side by side
    b, dd = base_agg.alias("__b"), d.alias("__d")
    cond = None
    for k in keys:
        c = F.col(f"__b.{k}").eqNullSafe(F.col(f"__d.{k}"))
        cond = c if cond is None else cond & c
    merged = b.join(dd, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__b.{k}"), F.col(f"__d.{k}")).alias(k)
            for k in keys
        ],
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"sum_{m}"), zero)
                + F.coalesce(F.col(f"__d_{m}"), zero)
            )
            .cast(_SUM_TYPE)
            .alias(f"sum_{m}")
            for m in measures
        ],
    )
    return merged.filter(F.col("n_rows") > 0)


def snapshot_refresh_agg(
    spark: SparkSession,
    fact_root: str,
    agg_root: str,
    from_version: int,
    group_cols: Sequence[str],
    measures: Sequence[str],
    to_version: int | None = None,
    keys: Sequence[str] | None = None,
) -> dict:
    """Refresh a snapshot-stored aggregate of a snapshot-stored fact
    table incrementally: derive the key-level change feed between the
    two fact versions (snapshots.snapshot_changes — |delta|-sized),
    fetch ONLY the changed keys' pre/post images from the two
    immutable version directories (left-semi joins, so the fact scan
    is key-pruned), maintain, and commit the result as a new version
    of the aggregate table. Returns the aggregate commit's manifest
    (with the maintained fact-version range recorded, so the next
    refresh knows where to resume).

    This is the |delta|-cost refresh loop the reference's hourly full
    recompute becomes at scale: fact MERGE commits v_n -> v_{n+1},
    then one refresh call rolls the aggregate forward — exactly, by
    the decimal discipline, however many times it runs."""
    from dex_data_ingestor_spark.snapshots import (
        default_merge_keys,
        snapshot_changes,
        snapshot_read,
        snapshot_write,
    )

    # resolve "latest" ONCE, up front: the change feed, both image
    # reads, and the recorded range must all see the same fact
    # version even if another commit lands mid-refresh — and the
    # manifest must always record the maintained upper bound so the
    # next refresh knows where to resume
    from dex_data_ingestor_spark.snapshots import _resolve

    if to_version is None:
        to_version = _resolve(fact_root)["version"]
    # refresh continuity: a prior refresh recorded the fact version it
    # maintained THROUGH; resuming from anything else double-applies
    # (re-run after success) or skips (stale caller state) deltas into
    # an aggregate that still claims recompute-equality — silently.
    # The manifest is the source of truth, so the mismatch is fatal.
    prior = _resolve(agg_root)
    prior_to = prior.get("fact_to_version")
    if prior_to is not None and prior.get("fact_root") == fact_root:
        if from_version != prior_to:
            raise ValueError(
                f"snapshot_refresh_agg: from_version={from_version} but "
                f"the aggregate at {agg_root} is already maintained "
                f"through fact version {prior_to} (manifest "
                f"v{prior['version']}); resume from {prior_to} or "
                "rebuild the aggregate"
            )
    ch = snapshot_changes(
        spark, fact_root, from_version, to_version, keys=keys
    )
    if keys is None:
        keys = default_merge_keys(fact_root, to_version)
    keys = list(keys)
    old_keys = ch.filter(
        F.col("status").isin("removed", "changed")
    ).select(*keys)
    new_keys = ch.filter(
        F.col("status").isin("added", "changed")
    ).select(*keys)
    removed = snapshot_read(spark, fact_root, version=from_version).join(
        old_keys, keys, "left_semi"
    )
    added = snapshot_read(spark, fact_root, version=to_version).join(
        new_keys, keys, "left_semi"
    )
    base = snapshot_read(spark, agg_root)
    refreshed = maintain_grouped_sums(
        base, removed, added, group_cols, measures
    )
    return snapshot_write(
        refreshed,
        agg_root,
        op="refresh",
        extra={
            "fact_root": fact_root,
            "fact_from_version": from_version,
            "fact_to_version": to_version,
        },
        # the maintained result was derived from the aggregate head
        # read above; a concurrent commit to agg_root must conflict,
        # not be silently overwritten
        expected_base=prior["version"],
    )

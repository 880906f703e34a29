"""Change-data-feed DataSource over the snapshot log
(dex_data_ingestor_spark/sources/snapshot_cdf.py) — the Spark 4
Python DataSource API surfacing snapshots.snapshot_changes semantics
as spark.read / spark.readStream format("snapshot_cdf")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dex_data_ingestor_spark import snapshots as S
from dex_data_ingestor_spark.sources.snapshot_cdf import (
    SnapshotCdfDataSource,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _register(spark):
    # registration is idempotent per session (latest wins)
    spark.dataSource.register(SnapshotCdfDataSource)


def _build_table(spark, root):
    """v1: 6 inserts. v2: MERGE (2 updates, 1 insert; records keys).
    v3: DELETE 2 rows. Returns the expected change set."""
    base = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(6)],
        "k long, name string, v double",
    )
    S.snapshot_write(base, root)
    upd = spark.createDataFrame(
        [(1, "n1b", 10.0), (2, "n2", 2.0), (6, "n6", 6.0)],
        "k long, name string, v double",
    )
    # k=2 carries identical values: MERGE rewrites it, but the CDF
    # must NOT report an unchanged row
    S.snapshot_merge(spark, root, upd, keys=["k"])
    S.snapshot_delete(spark, root, "k in (0, 5)")
    expect = {
        # v1: everything inserts
        *((k, "insert", 1) for k in range(6)),
        # v2: one real update, one insert; k=2 unchanged -> absent
        (1, "update", 2),
        (6, "insert", 2),
        # v3: two deletes
        (0, "delete", 3),
        (5, "delete", 3),
    }
    return expect


def _rows(df):
    return {
        (r.k, r._change_type, r._commit_version) for r in df.collect()
    }


def test_batch_cdf_matches_expected_changes(spark, root):
    expect = _build_table(spark, root)
    _register(spark)
    feed = spark.read.format("snapshot_cdf").load(root)
    assert set(feed.columns) == {
        "k", "name", "v", "_change_type", "_commit_version"
    }
    assert _rows(feed) == expect
    # value columns: post-image for upserts, pre-image for deletes
    vals = {
        (r.k, r._commit_version): (r.name, r.v) for r in feed.collect()
    }
    assert vals[(1, 2)] == ("n1b", 10.0)
    assert vals[(0, 3)] == ("n0", 0.0)
    # bounded sub-ranges
    v2 = (
        spark.read.format("snapshot_cdf")
        .option("startingVersion", 2)
        .option("endingVersion", 2)
        .load(root)
    )
    assert _rows(v2) == {(1, "update", 2), (6, "insert", 2)}
    # fan-out: more buckets, same answer
    wide = (
        spark.read.format("snapshot_cdf")
        .option("buckets", 7)
        .load(root)
    )
    assert _rows(wide) == expect


def test_streaming_cdf_available_now_and_incremental(
    spark, root, tmp_path
):
    """The streaming feed replays history from startingVersion under
    Trigger.AvailableNow, then a SECOND run against the same
    checkpoint picks up exactly the versions committed in between —
    the offsets-in-checkpoint exactly-once contract."""
    expect = _build_table(spark, root)
    _register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("snapshot_cdf")
            .option("startingVersion", 1)
            .load(root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got = _rows(spark.read.parquet(out))
    assert got == expect
    # new commit between runs: only its changes are appended
    S.snapshot_merge(
        spark,
        root,
        spark.createDataFrame([(7, "n7", 7.0)], "k long, name string, v double"),
        keys=["k"],
    )
    drain()
    got2 = _rows(spark.read.parquet(out))
    assert got2 == expect | {(7, "insert", 4)}


def test_cdf_skips_branch_commits_and_errors_without_keys(spark, root):
    """Branch-staged commits are invisible (mainline lineage only),
    and a table with no MERGE key record demands option('keys')."""
    base = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k long, v double"
    )
    S.snapshot_write(base, root)
    _register(spark)
    with pytest.raises(Exception, match="keys"):
        spark.read.format("snapshot_cdf").load(root).collect()
    feed = (
        spark.read.format("snapshot_cdf")
        .option("keys", "k")
        .load(root)
    )
    assert _rows(feed) == {(1, "insert", 1), (2, "insert", 1)}
    # a branch-staged commit must not surface in the feed
    S.snapshot_create_branch(root, "audit")
    S.snapshot_write(
        spark.createDataFrame([(9, 9.0)], "k long, v double"),
        root,
        branch="audit",
    )
    feed2 = (
        spark.read.format("snapshot_cdf")
        .option("keys", "k")
        .load(root)
    )
    assert _rows(feed2) == {(1, "insert", 1), (2, "insert", 1)}


def test_cdf_null_keys_and_quoted_columns(spark, root):
    """NULL-safe key semantics: a NULL key matches a NULL key (IS NOT
    DISTINCT FROM both in the bucket hash and the join), so a
    persisting NULL-keyed row is not reported changed; quoting
    survives a column name needing escapes."""
    v1 = spark.createDataFrame(
        [(None, 1.0), (2, 2.0)], "k long, `select` double"
    )
    S.snapshot_write(v1, root)
    v2 = spark.createDataFrame(
        [(None, 1.0), (2, 5.0)], "k long, `select` double"
    )
    S.snapshot_write(v2, root)
    _register(spark)
    feed = (
        spark.read.format("snapshot_cdf")
        .option("keys", "k")
        .load(root)
    )
    got = {
        (r.k, r._change_type, r._commit_version) for r in feed.collect()
    }
    assert got == {
        (None, "insert", 1),
        (2, "insert", 1),
        (2, "update", 2),
    }

"""Merge-on-read APPEND (snapshots.snapshot_append): O(|batch|)
ingest commits that reuse the base version's dirs and record only the
new batch — the hourly-micro-batch shape, with stats/bloom/constraint
contracts preserved across the append chain."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dex_data_ingestor_spark import snapshots as S


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )


def test_append_stacks_and_rewrite_folds(spark, root):
    m1 = S.snapshot_write(_df(spark, 0, 100).repartition(4), root)
    m2 = S.snapshot_append(spark, root, _df(spark, 100, 110))
    assert m2["op"] == "append"
    assert m2["data_dir"] == m1["data_dir"]  # base untouched
    assert len(m2["extra_dirs"]) == 1
    m3 = S.snapshot_append(spark, root, _df(spark, 110, 115))
    assert len(m3["extra_dirs"]) == 2
    assert S.snapshot_read(spark, root).count() == 115
    assert S.snapshot_read(spark, root, version=1).count() == 100
    assert S.snapshot_read(spark, root, version=2).count() == 110
    # schema mismatch rejects loudly
    bad = spark.range(0, 3).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(ValueError, match="append schema mismatch"):
        S.snapshot_append(spark, root, bad)
    # the next copy-on-write commit folds the chain back to one dir
    S.snapshot_merge(
        spark, root,
        spark.createDataFrame([(0, 9.0)], "k long, v double"),
        keys=["k"],
    )
    m = S._resolve(root)
    assert "extra_dirs" not in m
    assert S.snapshot_read(spark, root).count() == 115


def test_append_enforces_constraints_on_new_files_only(spark, root):
    S.snapshot_write(
        _df(spark, 0, 10), root, constraints={"v_nonneg": "v >= 0"}
    )
    bad = spark.createDataFrame([(99, -1.0)], "k long, v double")
    with pytest.raises(S.ConstraintViolation):
        S.snapshot_append(spark, root, bad)
    assert S._resolve(root)["version"] == 1  # nothing committed
    m2 = S.snapshot_append(
        spark, root, spark.createDataFrame([(99, 1.0)], "k long, v double")
    )
    # constraints persisted through the append commit
    assert m2["constraints"] == {"v_nonneg": "v >= 0"}


def test_append_extends_stats_and_bloom_indexes(spark, root):
    df = _df(spark, 0, 100).repartitionByRange(4, "k")
    S.snapshot_write_with_stats(
        df, root, stats_cols=["k"], bloom_cols=["k"]
    )
    S.snapshot_append(
        spark, root, _df(spark, 1000, 1010).coalesce(1)
    )
    m = S._resolve(root)
    assert any("dir" in f for f in m["files"])  # appended entry tagged
    # range scan reaches into the appended dir and nowhere else
    hi = S.snapshot_scan_pruned(spark, root, "k", 1000, 2000)
    assert len(hi.inputFiles()) == 1
    assert hi.count() == 10
    lo = S.snapshot_scan_pruned(spark, root, "k", 0, 24)
    assert 0 < len(lo.inputFiles()) < 5
    assert lo.filter(F.col("k") <= 24).count() == 25
    # bloom point lookup finds an appended key exactly
    pt = S.snapshot_scan_point(spark, root, "k", 1005)
    assert len(pt.inputFiles()) == 1
    assert pt.filter(F.col("k") == 1005).count() == 1
    # and an absent key still prunes everything (exactness survives)
    assert (
        len(S.snapshot_scan_point(spark, root, "k", 777).inputFiles())
        == 0
    )


def test_append_composes_with_mor_delete_and_cdf(spark, root):
    S.snapshot_write(_df(spark, 0, 50).repartition(2), root)   # v1
    S.snapshot_append(spark, root, _df(spark, 50, 60))         # v2
    S.snapshot_delete(spark, root, "k in (5, 55)", mode="mor")  # v3
    assert S.snapshot_read(spark, root).count() == 58
    S.snapshot_append(spark, root, _df(spark, 60, 65))         # v4
    m4 = S._resolve(root)
    assert len(m4["extra_dirs"]) == 2 and m4.get("dv_dirs")
    live = S.snapshot_read(spark, root)
    assert live.count() == 63
    assert live.filter(F.col("k").isin(5, 55)).count() == 0
    # CDF: v2 = 10 inserts, v3 = 2 deletes, v4 = 5 inserts
    from dex_data_ingestor_spark.sources.snapshot_cdf import (
        SnapshotCdfDataSource,
    )

    spark.dataSource.register(SnapshotCdfDataSource)
    feed = (
        spark.read.format("snapshot_cdf")
        .option("startingVersion", 2)
        .option("keys", "k")
        .load(root)
    )
    got = {
        (r.k, r._change_type, r._commit_version) for r in feed.collect()
    }
    want = (
        {(k, "insert", 2) for k in range(50, 60)}
        | {(5, "delete", 3), (55, "delete", 3)}
        | {(k, "insert", 4) for k in range(60, 65)}
    )
    assert got == want


def test_vacuum_reference_counts_append_dirs(spark, root):
    S.snapshot_write(_df(spark, 0, 10), root)                # v1
    m2 = S.snapshot_append(spark, root, _df(spark, 10, 12))  # v2
    ap_dir = m2["extra_dirs"][0]
    S.snapshot_compact(spark, root, target_files=1)          # v3: folds
    S.snapshot_write(_df(spark, 0, 5), root)                 # v4
    S.snapshot_write(_df(spark, 0, 6), root)                 # v5
    removed = S.snapshot_vacuum(root, keep_last=2)
    # v2's append dir (and v1/v2's base) are out of retention: gone
    assert os.path.realpath(ap_dir) in {
        os.path.realpath(d) for d in removed
    }
    assert S.snapshot_read(spark, root).count() == 6
    # while retained, an append dir must survive vacuum
    root2 = root + "_b"
    S.snapshot_write(_df(spark, 0, 10), root2)
    m = S.snapshot_append(spark, root2, _df(spark, 10, 12))
    S.snapshot_vacuum(root2, keep_last=1)
    assert os.path.isdir(m["extra_dirs"][0])
    assert S.snapshot_read(spark, root2).count() == 12


def test_streaming_append_sink_batchid_idempotent(spark, root, tmp_path):
    """The streaming append sink: content equals the union of all
    micro-batches, one 'append' version per batch after the creating
    one, a replayed run commits nothing new, and a REBUILT checkpoint
    (new app id) appends again rather than silently skipping."""
    from dex_data_ingestor_spark.streaming.jobs import (
        foreach_batch_append_snapshots,
    )

    src = str(tmp_path / "src")
    _df(spark, 0, 50).coalesce(1).write.parquet(src)
    _df(spark, 50, 80).coalesce(1).write.mode("append").parquet(src)

    def run(ckpt):
        q = foreach_batch_append_snapshots(
            spark.readStream.schema("k long, v double").option(
                "maxFilesPerTrigger", 1
            ).parquet(src),
            ckpt,
            root,
            spark=spark,
        )
        q.awaitTermination(timeout=120)

    ckpt = str(tmp_path / "c1")
    run(ckpt)
    assert S.snapshot_read(spark, root).count() == 80
    ops = [m["op"] for m in S.snapshot_versions(root)]
    assert ops[0] == "stream-append"
    assert all(o == "append" for o in ops[1:]) and len(ops) == 2
    # replay: same checkpoint, no new source files -> nothing commits
    run(ckpt)
    assert len(S.snapshot_versions(root)) == 2
    # rebuilt checkpoint = new writer: batches re-append (documented
    # at-least-once behavior for a NEW app id; dedupe is the merge
    # sink's job)
    run(str(tmp_path / "c2"))
    assert S.snapshot_read(spark, root).count() == 160

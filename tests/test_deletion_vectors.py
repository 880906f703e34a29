"""Merge-on-read DELETE via deletion vectors
(snapshots.snapshot_delete(mode='mor')): O(|deleted|) commits that
every reader — snapshot_read, DML bases, pruned scans, compact, the
streaming merge sink, both CDF paths — must subtract at scan time."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dex_data_ingestor_spark import snapshots as S


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _base(spark, root, n=100):
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("v"),
    ).repartition(4)
    return S.snapshot_write(df, root)


def test_mor_delete_matches_copy_delete_without_rewriting(spark, root):
    """Content parity with the copy path, at O(|deleted|) write cost:
    the data dir is BYTE-IDENTICAL before and after (no rewrite), the
    sidecar holds exactly n_deleted rows, and time travel to the
    pre-delete version still sees everything."""
    m1 = _base(spark, root)
    m2 = S.snapshot_delete(spark, root, "k % 10 = 3", mode="mor")
    assert m2["op"] == "delete" and m2["n_deleted"] == 10
    assert m2["data_dir"] == m1["data_dir"]  # no copy
    assert len(m2["dv_dirs"]) == 1
    live = S.snapshot_read(spark, root)
    assert live.count() == 90
    assert live.filter(F.col("k") % 10 == 3).count() == 0
    # parity with the copy path on a twin table
    root2 = root + "_copy"
    _base(spark, root2)
    S.snapshot_delete(spark, root2, "k % 10 = 3", mode="copy")
    assert _rows(live) == _rows(S.snapshot_read(spark, root2))
    # time travel: the pre-delete version is untouched
    assert S.snapshot_read(spark, root, version=1).count() == 100
    with pytest.raises(ValueError, match="delete mode"):
        S.snapshot_delete(spark, root, "true", mode="bogus")


def test_mor_deletes_accumulate_and_rewrite_materializes(spark, root):
    """Consecutive MOR deletes stack sidecars; re-deleting already-
    deleted rows records nothing new; the next copy-on-write commit
    (compact here) materializes the DVs away."""
    _base(spark, root)
    S.snapshot_delete(spark, root, "k < 10", mode="mor")
    m3 = S.snapshot_delete(spark, root, "k < 20", mode="mor")
    assert m3["n_deleted"] == 10  # 0-9 already dead: not re-recorded
    assert len(m3["dv_dirs"]) == 2
    assert S.snapshot_read(spark, root).count() == 80
    # a no-op delete commits for audit but adds no sidecar
    m4 = S.snapshot_delete(spark, root, "k < 5", mode="mor")
    assert m4["n_deleted"] == 0 and len(m4["dv_dirs"]) == 2
    m5 = S.snapshot_compact(spark, root, target_files=2)
    assert "dv_dirs" not in m5
    assert S.snapshot_read(spark, root).count() == 80
    assert S.snapshot_read(spark, root).filter(F.col("k") < 20).count() == 0


def test_dml_bases_see_live_rows_only(spark, root):
    """MERGE/UPDATE bases apply DVs — a merge after a MOR delete must
    not resurrect the deleted keys."""
    _base(spark, root, n=20)
    S.snapshot_delete(spark, root, "k >= 15", mode="mor")
    S.snapshot_merge(
        spark,
        root,
        spark.createDataFrame([(0, 99.0)], "k long, v double"),
        keys=["k"],
    )
    live = S.snapshot_read(spark, root)
    assert live.count() == 15  # 15..19 stay dead through the merge
    assert live.filter(F.col("k") == 0).collect()[0].v == 99.0
    assert "dv_dirs" not in S._resolve(root)  # merge materialized
    S.snapshot_delete(spark, root, "k = 1", mode="mor")
    S.snapshot_update(spark, root, "k = 2", {"v": "v + 0.5"})
    live = S.snapshot_read(spark, root)
    assert live.count() == 14
    assert live.filter(F.col("k") == 2).collect()[0].v == 4.5


def test_pruned_scans_and_cdf_apply_dvs(spark, root):
    """snapshot_scan_pruned subtracts DVs from the kept files; both
    CDF paths (derived snapshot_changes and the Python DataSource)
    report a MOR delete as 'delete' rows with pre-image values."""
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    ).repartitionByRange(4, "k")
    S.snapshot_write_with_stats(df, root, stats_cols=["k"])
    S.snapshot_merge(
        spark,
        root,
        spark.createDataFrame([(100, 200.0)], "k long, v double"),
        keys=["k"],
    )
    S.snapshot_delete(spark, root, "k in (10, 11)", mode="mor")
    # stats survive the MOR commit (carried from the base manifest)
    m = S._resolve(root)
    assert m.get("dv_dirs")
    # merge rewrote data without stats; MOR carries what the base had
    changes = S.snapshot_changes(spark, root, from_version=2)
    got = {(r.k, r.status) for r in changes.collect()}
    assert got == {(10, "removed"), (11, "removed")}
    from dex_data_ingestor_spark.sources.snapshot_cdf import (
        SnapshotCdfDataSource,
    )

    spark.dataSource.register(SnapshotCdfDataSource)
    feed = (
        spark.read.format("snapshot_cdf")
        .option("startingVersion", 3)
        .load(root)
    )
    rows = feed.collect()
    assert {(r.k, r._change_type, r._commit_version) for r in rows} == {
        (10, "delete", 3),
        (11, "delete", 3),
    }
    # pre-image values ride on the delete rows
    assert {r.v for r in rows} == {20.0, 22.0}


def test_stats_scan_applies_dvs_on_kept_files(spark, root):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    ).repartitionByRange(4, "k")
    S.snapshot_write_with_stats(df, root, stats_cols=["k"])
    S.snapshot_delete(spark, root, "k in (10, 11)", mode="mor")
    pruned = S.snapshot_scan_pruned(spark, root, "k", 0, 24)
    data_files = [f for f in pruned.inputFiles() if "/_dv/" not in f]
    assert 0 < len(data_files) < 4
    ks = {r.k for r in pruned.filter(F.col("k") <= 24).collect()}
    assert ks == set(range(25)) - {10, 11}


def test_rollback_keeps_dvs_and_vacuum_reclaims_dropped_ones(
    spark, root
):
    """Rollback to a DV version carries its sidecars; vacuum removes
    dv dirs referenced only by dropped versions and age-reclaims
    orphaned sidecar dirs, while live ones survive."""
    _base(spark, root)                                     # v1
    m2 = S.snapshot_delete(spark, root, "k < 10", mode="mor")  # v2
    dv_a = m2["dv_dirs"][0]
    S.snapshot_compact(spark, root, target_files=1)        # v3 (no DV)
    m4 = S.snapshot_delete(spark, root, "k < 20", mode="mor")  # v4
    dv_b = m4["dv_dirs"][0]
    S.snapshot_rollback(root, to_version=2)                # v5: carries dv_a
    assert S._resolve(root)["dv_dirs"] == [dv_a]
    assert S.snapshot_read(spark, root).count() == 90
    # keep v4+v5: v2's dv_a is ALSO referenced by retained v5 (the
    # rollback) so it must survive; dv_b (only v4, retained) survives
    removed = S.snapshot_vacuum(root, keep_last=2)
    assert os.path.isdir(dv_a) and os.path.isdir(dv_b)
    # an orphan dv dir (crashed MOR delete) is age-reclaimed
    orphan = os.path.join(root, S.DV_DIR, "deadbeef")
    os.makedirs(orphan)
    removed = S.snapshot_vacuum(
        root, keep_last=2, orphans_min_age_s=0.0
    )
    assert orphan in removed and not os.path.isdir(orphan)
    assert os.path.isdir(dv_a) and os.path.isdir(dv_b)


def test_streaming_merge_sink_base_applies_dvs(spark, root, tmp_path):
    """The streaming merge sink's base read is DV-aware: a MOR delete
    between micro-batch runs stays deleted unless the stream itself
    re-upserts the key."""
    from dex_data_ingestor_spark.streaming.jobs import (
        foreach_batch_merge_snapshots,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("k long, v double").parquet(src)
    )
    q = foreach_batch_merge_snapshots(
        stream, str(tmp_path / "c1"), root, keys=["k"], spark=spark
    )
    q.awaitTermination(timeout=120)
    assert S.snapshot_read(spark, root).count() == 10
    S.snapshot_delete(spark, root, "k in (7, 8)", mode="mor")
    # second run: one new file upserts k=8 only; k=7 must stay dead
    spark.createDataFrame(
        [(8, 88.0)], "k long, v double"
    ).write.mode("append").parquet(src)
    q = foreach_batch_merge_snapshots(
        spark.readStream.schema("k long, v double").parquet(src),
        str(tmp_path / "c1"),
        root,
        keys=["k"],
        spark=spark,
    )
    q.awaitTermination(timeout=120)
    live = {(r.k, r.v) for r in S.snapshot_read(spark, root).collect()}
    assert (7, 7.0) not in live
    assert (8, 88.0) in live
    assert len(live) == 9


def test_mor_update_parity_and_type_guard(spark, root):
    """UPDATE mode='mor': one commit carrying the matched rows' DV +
    their post-update images; content parity with the copy path; a
    type-changing SET is rejected (the appended dir's parquet schema
    must match the base dirs)."""
    _base(spark, root, n=30)
    m2 = S.snapshot_update(
        spark, root, "k % 3 = 0", {"v": "v + 100.0"}, mode="mor"
    )
    assert m2["op"] == "update" and m2["n_updated"] == 10
    assert len(m2["dv_dirs"]) == 1 and len(m2["extra_dirs"]) == 1
    root2 = root + "_copy"
    _base(spark, root2, n=30)
    S.snapshot_update(spark, root2, "k % 3 = 0", {"v": "v + 100.0"})
    assert _rows(S.snapshot_read(spark, root)) == _rows(
        S.snapshot_read(spark, root2)
    )
    with pytest.raises(ValueError, match="mode='mor'"):
        S.snapshot_update(
            spark, root, "k = 1", {"v": "CAST(v AS STRING)"}, mode="mor"
        )
    with pytest.raises(ValueError, match="update mode"):
        S.snapshot_update(spark, root, "k = 1", {"v": "v"}, mode="x")


def test_mor_merge_parity_stats_and_cdf(spark, root):
    """MERGE mode='mor': parity with the copy merge (updates +
    inserts + update_cols subset semantics), stats extension keeps
    range pruning exact over the appended images, and the CDF reports
    the version's updates/inserts."""
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("v"),
        F.lit("x").alias("tag"),
    ).repartitionByRange(4, "k")
    S.snapshot_write_with_stats(df, root, stats_cols=["k"])
    upd = spark.createDataFrame(
        [(5, 555.0, "IGNORED"), (200, 7.0, "new")],
        "k long, v double, tag string",
    )
    m2 = S.snapshot_merge(
        spark, root, upd, keys=["k"], update_cols=["v"], mode="mor"
    )
    assert m2["op"] == "merge" and m2["n_matched"] == 1
    assert len(m2["dv_dirs"]) == 1 and len(m2["extra_dirs"]) == 1
    live = S.snapshot_read(spark, root)
    assert live.count() == 101
    got = {(r.k, r.v, r.tag) for r in live.filter(
        F.col("k").isin(5, 200)
    ).collect()}
    # update_cols=['v']: tag keeps the existing row's value on match
    assert got == {(5, 555.0, "x"), (200, 7.0, "new")}
    # copy-path parity
    root2 = root + "_copy"
    df2 = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("v"),
        F.lit("x").alias("tag"),
    )
    S.snapshot_write(df2, root2)
    S.snapshot_merge(spark, root2, upd, keys=["k"], update_cols=["v"])
    assert _rows(live) == _rows(S.snapshot_read(spark, root2))
    # stats stay exact: the appended images are range-prunable
    # (inputFiles also lists the DV side of the anti-join plan —
    # count data files only)
    pr = S.snapshot_scan_pruned(spark, root, "k", 200, 300)
    data_files = [f for f in pr.inputFiles() if "/_dv/" not in f]
    assert len(data_files) == 1
    assert pr.filter(F.col("k") == 200).count() == 1
    # the updated key's OLD image is dead even in its original file's
    # range scan
    pr5 = S.snapshot_scan_pruned(spark, root, "k", 5, 5)
    vals = [r.v for r in pr5.filter(F.col("k") == 5).collect()]
    assert vals == [555.0]
    # CDF reports the merge version as one update + one insert
    from dex_data_ingestor_spark.sources.snapshot_cdf import (
        SnapshotCdfDataSource,
    )

    spark.dataSource.register(SnapshotCdfDataSource)
    feed = (
        spark.read.format("snapshot_cdf")
        .option("startingVersion", 2)
        .load(root)
    )
    assert {
        (r.k, r._change_type, r._commit_version) for r in feed.collect()
    } == {(5, "update", 2), (200, "insert", 2)}
    # evolve_schema cannot ride the MOR path
    wider = spark.createDataFrame(
        [(1, 1.0, "t", 9)], "k long, v double, tag string, extra int"
    )
    with pytest.raises(ValueError, match="copy"):
        S.snapshot_merge(
            spark, root, wider, keys=["k"],
            evolve_schema=True, mode="mor",
        )


def test_dv_anti_join_broadcasts_the_sidecar(spark, root):
    """Scale shape of the DV read overhead: the sidecar is |deleted|
    rows, so the anti join must plan as a BROADCAST hash join (the
    big side streams through unshuffled) — a sort-merge anti join
    here would shuffle the whole table to subtract a handful of
    rows."""
    import contextlib
    import io

    _base(spark, root, n=5000)
    S.snapshot_delete(spark, root, "k < 10", mode="mor")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        S.snapshot_read(spark, root).explain("formatted")
    plan = buf.getvalue()
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


@pytest.mark.slow
@pytest.mark.parametrize("seed", [1, 7, 23])
def test_random_dml_sequence_mor_equals_copy(spark, root, seed):
    """Differential harness: a seeded random sequence of
    append/delete/update/merge ops applied to TWIN tables — one in
    merge-on-read mode, one copy-on-write — must agree on content
    after EVERY step (and on the derived change feed at the end).
    This is the invariant all the per-op parity tests compose into:
    no op order, predicate shape, or sidecar stacking may diverge
    the two execution strategies."""
    import random

    def _df(sp, lo, hi):
        return sp.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        )

    rng = random.Random(seed)
    roots = {"mor": root + "_m", "copy": root + "_c"}
    for r in roots.values():
        S.snapshot_write(_df(spark, 0, 60).repartition(3), r)
    next_k = 1000

    def both(fn):
        for mode, r in roots.items():
            fn(mode, r)
        a = _rows(S.snapshot_read(spark, roots["mor"]))
        b = _rows(S.snapshot_read(spark, roots["copy"]))
        assert a == b, (len(a), len(b), seed)

    for step in range(6):
        op = rng.choice(["append", "delete", "update", "merge"])
        if op == "append":
            lo, hi = next_k, next_k + rng.randint(1, 8)
            next_k = hi
            both(lambda mode, r: S.snapshot_append(
                spark, r, _df(spark, lo, hi)
            ))
        elif op == "delete":
            mod, rem = rng.randint(3, 9), rng.randint(0, 2)
            both(lambda mode, r: S.snapshot_delete(
                spark, r, f"k % {mod} = {rem}",
                mode=("mor" if mode == "mor" else "copy"),
            ))
        elif op == "update":
            mod, rem = rng.randint(3, 9), rng.randint(0, 2)
            bump = float(rng.randint(1, 50))
            both(lambda mode, r: S.snapshot_update(
                spark, r, f"k % {mod} = {rem}", {"v": f"v + {bump}"},
                mode=("mor" if mode == "mor" else "copy"),
            ))
        else:
            ks = rng.sample(range(0, 60), rng.randint(1, 4))
            ks.append(next_k)
            next_k += 1
            upd = spark.createDataFrame(
                [(k, float(rng.randint(0, 99))) for k in ks],
                "k long, v double",
            )
            both(lambda mode, r: S.snapshot_merge(
                spark, r, upd, keys=["k"],
                mode=("mor" if mode == "mor" else "copy"),
            ))
    # both histories expose the same cumulative change feed content
    # (version numbering matches: one commit per step + the seed)
    from dex_data_ingestor_spark.sources.snapshot_cdf import (
        SnapshotCdfDataSource,
    )

    spark.dataSource.register(SnapshotCdfDataSource)

    def feed(r):
        return {
            (x.k, x.v, x._change_type, x._commit_version)
            for x in spark.read.format("snapshot_cdf")
            .option("keys", "k")
            .load(r)
            .collect()
        }

    assert feed(roots["mor"]) == feed(roots["copy"])

"""Versioned snapshot tables: time travel, versioned MERGE, rollback,
commit atomicity (dex_data_ingestor_spark/snapshots.py)."""

from __future__ import annotations

import os

import pytest

from dex_data_ingestor_spark import snapshots as S


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def test_write_merge_time_travel(spark, root):
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, v double"
    )
    m1 = S.snapshot_write(v1, root)
    assert m1["version"] == 1

    updates = spark.createDataFrame(
        [(2, "b2", 25.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    m2 = S.snapshot_merge(spark, root, updates, keys=["k"])
    assert m2["version"] == 2

    # latest = merged (update applied, insert present, untouched kept)
    assert _rows(S.snapshot_read(spark, root)) == {
        (1, "a", 10.0),
        (2, "b2", 25.0),
        (3, "c", 30.0),
    }
    # time travel by version: v1 unchanged
    assert _rows(S.snapshot_read(spark, root, version=1)) == _rows(v1)
    # time travel by timestamp: as_of v1's commit time resolves v1
    assert _rows(
        S.snapshot_read(spark, root, as_of=m1["committed_at"])
    ) == _rows(v1)


def test_rollback_reuses_data_dir_and_preserves_history(spark, root):
    v1 = spark.createDataFrame([(1, 10.0)], "k long, v double")
    m1 = S.snapshot_write(v1, root)
    bad = spark.createDataFrame([(1, -1.0), (2, -2.0)], "k long, v double")
    S.snapshot_write(bad, root, op="write")

    m3 = S.snapshot_rollback(root, to_version=1)
    assert m3["version"] == 3 and m3["rolled_back_to"] == 1
    # no data copy: v3 points at v1's directory
    assert m3["data_dir"] == m1["data_dir"]
    # latest == v1 content; the bad version stays readable
    assert _rows(S.snapshot_read(spark, root)) == _rows(v1)
    assert _rows(S.snapshot_read(spark, root, version=2)) == _rows(bad)
    assert [m["version"] for m in S.snapshot_versions(root)] == [1, 2, 3]


def test_orphan_data_dir_is_invisible(spark, root):
    v1 = spark.createDataFrame([(1, 1.0)], "k long, v double")
    S.snapshot_write(v1, root)
    # simulate a job that died after writing data, before committing
    orphan = os.path.join(root, S.DATA_DIR, "deadbeef")
    spark.createDataFrame([(9, 9.0)], "k long, v double").write.parquet(orphan)
    assert _rows(S.snapshot_read(spark, root)) == _rows(v1)
    assert len(S.snapshot_versions(root)) == 1


def test_concurrent_commit_conflict(spark, root, monkeypatch):
    """Two committers computing the same next version: exactly one
    wins the O_EXCL manifest create; the loser gets SnapshotConflict
    and succeeds on retry with a fresh listing."""
    v1 = spark.createDataFrame([(1, 1.0)], "k long, v double")
    m1 = S.snapshot_write(v1, root)

    # racer commits version 2 for real...
    racer = S.snapshot_commit_existing(root, m1["data_dir"], op="racer")
    assert racer["version"] == 2

    # ...but the loser computed its version from a log read taken
    # BEFORE the racer's commit (the actual race window)
    real = S._latest_manifest
    monkeypatch.setattr(
        S,
        "_latest_manifest",
        lambda r: next(
            m
            for m in reversed(S._list_manifests(r))
            if m["version"] < 2
        ),
    )
    with pytest.raises(S.SnapshotConflict):
        S.snapshot_write(v1, root)
    monkeypatch.undo()

    # retry with a fresh listing claims the next free number
    m = S.snapshot_write(v1, root)
    assert m["version"] == 3


def test_resolve_errors(spark, root):
    with pytest.raises(FileNotFoundError):
        S.snapshot_read(spark, root)
    v1 = spark.createDataFrame([(1, 1.0)], "k long, v double")
    m1 = S.snapshot_write(v1, root)
    with pytest.raises(KeyError):
        S.snapshot_read(spark, root, version=99)
    with pytest.raises(KeyError):
        S.snapshot_read(spark, root, as_of="1990-01-01T00:00:00+00:00")
    with pytest.raises(ValueError):
        S.snapshot_read(spark, root, version=1, as_of=m1["committed_at"])


def test_file_stats_skipping_prunes_files_and_keeps_results(spark, root):
    """Range-clustered write + manifest stats: a narrow range scan
    reads a strict subset of files yet returns exactly the rows the
    full-scan filter returns."""
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 10_000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        .repartitionByRange(8, "k")
    )
    m = S.snapshot_write_with_stats(df, root, stats_cols=["k"])
    assert m["stats_cols"] == ["k"] and len(m["files"]) == 8
    assert all(f["stats"].get("k") for f in m["files"])

    pruned = S.snapshot_scan_pruned(spark, root, "k", 2000, 2100)
    assert len(pruned.inputFiles()) < 8  # skipped most files
    got = _rows(pruned.filter(F.col("k").between(2000, 2100)))
    want = _rows(
        S.snapshot_read(spark, root).filter(F.col("k").between(2000, 2100))
    )
    assert got == want and len(got) == 101

    # out-of-range scan: schema preserved, zero rows
    empty = S.snapshot_scan_pruned(spark, root, "k", 10**9, 10**9 + 5)
    assert empty.columns == ["k", "v"] and empty.count() == 0


def test_scan_pruned_normalizes_bound_forms(spark, root):
    """ADVICE r10: timestamp footer stats are stored as ISO strings
    with a SPACE separator, but scan bounds compared with raw < / > —
    a datetime object raised TypeError, and an isoformat() 'T' string
    sorted after every stored value (silently pruning wrong files).
    Every caller form must now prune identically: datetime objects,
    'T'-separated isoformat strings, and the stored space form."""
    import datetime as dt
    import decimal

    from pyspark.sql import functions as F

    # timestamp_ntz: Spark writes it as TIMESTAMP_MICROS (naive), the
    # one timestamp physical form whose parquet footers carry min/max
    # stats (plain TIMESTAMP defaults to INT96 — no stats at all) and
    # whose pyarrow values round-trip tz-free, matching the engine's
    # session-tz-proof ntz convention.
    df = (
        spark.range(0, 8_000)
        .select(
            F.col("id").alias("k"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
                + F.make_interval(hours=F.col("id") % 96)
            ).alias("ts"),
        )
        .repartitionByRange(8, "ts")
    )
    S.snapshot_write_with_stats(df, root, stats_cols=["ts"])

    lo_dt = dt.datetime(2024, 1, 2, 0, 0, 0)
    hi_dt = dt.datetime(2024, 1, 2, 6, 0, 0)
    forms = [
        (lo_dt, hi_dt),
        (lo_dt.isoformat(), hi_dt.isoformat()),  # 'T' separator
        (lo_dt.isoformat(sep=" "), hi_dt.isoformat(sep=" ")),
    ]
    picked = [
        sorted(S.snapshot_scan_pruned(spark, root, "ts", lo, hi)
               .inputFiles())
        for lo, hi in forms
    ]
    assert picked[0] == picked[1] == picked[2]
    assert 0 < len(picked[0]) < 8  # really pruned, really kept some
    # exact predicate via string-cast ntz bounds (the repo's tz rule:
    # never F.lit a naive datetime into a comparison — it renders
    # through the session timezone and shifts the filter)
    exact = F.col("ts").between(
        F.lit(lo_dt.isoformat(sep=" ")).cast("timestamp_ntz"),
        F.lit(hi_dt.isoformat(sep=" ")).cast("timestamp_ntz"),
    )
    got = (
        S.snapshot_scan_pruned(spark, root, "ts", lo_dt, hi_dt)
        .filter(exact)
        .count()
    )
    want = S.snapshot_read(spark, root).filter(exact).count()
    assert got == want > 0

    # Decimal bounds widen OUTWARD (superset: never fewer files), and
    # form mismatches fail loudly instead of deep-loop TypeError
    assert S._query_bound(decimal.Decimal("1.5"), lo=True, sample=1.0) < 1.5
    assert S._query_bound(decimal.Decimal("1.5"), lo=False, sample=1.0) > 1.5
    with pytest.raises(TypeError, match="timestamp-form"):
        S.snapshot_scan_pruned(spark, root, "ts", b"\x00", b"\xff")
    # a DATE bound against timestamp-form stats is ambiguous at the hi
    # end (midnight vs end-of-day) — loud reject, never a guess
    with pytest.raises(TypeError, match="timestamp-form"):
        S.snapshot_scan_pruned(
            spark, root, "ts", dt.date(2024, 1, 2), dt.date(2024, 1, 3)
        )


def test_scan_pruned_form_mismatches_and_string_columns(spark, root):
    """The r11 review's confirmed mis-pruning cases, pinned:

    (a) a plain STRING column legitimately storing 'T'-form ISO text
        must compare VERBATIM — rewriting the bound's 'T' to a space
        made the bound sort before every stored value and pruned the
        matching file;
    (b) a datetime bound against a DATE-form stat column renders with
        a time part, sorts after the day it names, and silently
        pruned half the matching data — it must raise instead;
    (c) a date/'YYYY-MM-DD'-string bound against DATE-form stats
        prunes correctly."""
    import datetime as dt

    from pyspark.sql import functions as F

    df = (
        spark.range(0, 400)
        .select(
            F.col("id").alias("k"),
            F.concat(
                F.lit("2024-01-0"),
                (F.col("id") % 4 + 1).cast("string"),
                F.lit("T12:00:00"),
            ).alias("iso_t"),
            F.date_add(
                F.to_date(F.lit("2024-01-01")), (F.col("id") % 4).cast("int")
            ).alias("d"),
        )
        .repartitionByRange(4, "d")
    )
    S.snapshot_write_with_stats(df, root, stats_cols=["iso_t", "d"])

    # (a) string column with 'T'-form values: verbatim bounds keep the
    # matching file and the exact filter returns every matching row
    pruned = S.snapshot_scan_pruned(
        spark, root, "iso_t", "2024-01-02T00:00:00", "2024-01-02T23:59:59"
    )
    assert 0 < len(pruned.inputFiles()) < 4
    got = pruned.filter(F.col("iso_t") == "2024-01-02T12:00:00").count()
    want = (
        S.snapshot_read(spark, root)
        .filter(F.col("iso_t") == "2024-01-02T12:00:00")
        .count()
    )
    assert got == want > 0

    # (b) datetime bound on DATE-form stats: loud reject
    with pytest.raises(TypeError, match="DATE-form"):
        S.snapshot_scan_pruned(
            spark, root, "d",
            dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3),
        )

    # (c) date / date-string bounds on DATE-form stats prune correctly
    for lo, hi in (
        (dt.date(2024, 1, 2), dt.date(2024, 1, 2)),
        ("2024-01-02", "2024-01-02"),
    ):
        pruned = S.snapshot_scan_pruned(spark, root, "d", lo, hi)
        assert 0 < len(pruned.inputFiles()) < 4
        got = pruned.filter(F.col("d") == "2024-01-02").count()
        assert got == 100


def test_scan_pruned_date_string_rejected_on_timestamp_stats(
    spark, root
):
    """ADVICE r12 (medium): a date-shaped STRING bound ('2024-01-02')
    against timestamp-form stats used to pass through verbatim — as a
    hi bound it sorts BEFORE '2024-01-02 00:00:00' and silently prunes
    every file containing the named day, the exact midnight-vs-
    end-of-day ambiguity the function already raised TypeError for
    when handed a datetime.date. Both spellings now raise."""
    import datetime as dt

    from pyspark.sql import functions as F

    df = (
        spark.range(0, 4_000)
        .select(
            F.col("id").alias("k"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
                + F.make_interval(hours=F.col("id") % 96)
            ).alias("ts"),
        )
        .repartitionByRange(8, "ts")
    )
    S.snapshot_write_with_stats(df, root, stats_cols=["ts"])
    with pytest.raises(TypeError, match="ambiguous"):
        S.snapshot_scan_pruned(
            spark, root, "ts", "2024-01-01", "2024-01-02"
        )
    # a FULL timestamp string still normalizes and prunes correctly,
    # identically to the datetime spelling of the same bounds
    a = sorted(S.snapshot_scan_pruned(
        spark, root, "ts", "2024-01-02 00:00:00", "2024-01-02 23:59:59"
    ).inputFiles())
    b = sorted(S.snapshot_scan_pruned(
        spark, root, "ts",
        dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 2, 23, 59, 59),
    ).inputFiles())
    assert a == b and 0 < len(a) < 8


def test_stats_forms_recorded_and_beat_shape_inference(spark, root):
    """ADVICE r12 (low): form detection keyed on ONE sampled lo stat —
    a plain STRING column whose min value happens to look like
    'YYYY-MM-DD HH:MM:SS' was misclassified as timestamp-form, so
    'T'-form string bounds got rewritten (breaking the documented
    verbatim comparison) and datetime bounds were accepted against
    string data. The manifest now records the column's declared
    logical form at write time; scan bounds dispatch on the tag."""
    import datetime as dt

    from pyspark.sql import functions as F

    # string column whose VALUES are timestamp-shaped text
    df = (
        spark.range(0, 400)
        .select(
            F.col("id").alias("k"),
            F.concat(
                F.lit("2024-01-0"),
                (F.col("id") % 4 + 1).cast("string"),
                F.lit(" 12:00:00 host=a"),
            ).alias("logline"),
        )
        .repartitionByRange(4, "logline")
    )
    m = S.snapshot_write_with_stats(df, root, stats_cols=["logline"])
    assert m["stats_forms"] == {"logline": "string"}
    # datetime bound against string data: loud reject (the sampled-
    # shape fallback used to accept it as timestamp-form)
    with pytest.raises(TypeError, match="string stats"):
        S.snapshot_scan_pruned(
            spark, root, "logline",
            dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3),
        )
    # string bounds compare VERBATIM — no 'T'->' ' rewriting
    pruned = S.snapshot_scan_pruned(
        spark, root, "logline",
        "2024-01-02 00:00:00", "2024-01-02 zz",
    )
    assert 0 < len(pruned.inputFiles()) < 4
    assert pruned.filter(
        F.col("logline").startswith("2024-01-02")
    ).count() == 100
    # rollback carries the form tags with the stats they describe
    S.snapshot_write(df.limit(1), root, op="write")
    m2 = S.snapshot_rollback(root, to_version=m["version"])
    assert m2["stats_forms"] == {"logline": "string"}


def test_scan_pruned_legacy_manifest_without_forms(spark, root):
    """Back-compat for PRE-form manifests (written before r12 recorded
    stats_forms): with the tag absent, _query_bound must fall back to
    sampled-shape inference and keep pruning timestamp columns
    correctly — every new write carries the tag, so without this test
    the legacy branch would be dead code until the first real old
    manifest hit it in production."""
    import datetime as dt
    import json
    import os

    from pyspark.sql import functions as F

    df = (
        spark.range(0, 4_000)
        .select(
            F.col("id").alias("k"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
                + F.make_interval(hours=F.col("id") % 96)
            ).alias("ts"),
        )
        .repartitionByRange(8, "ts")
    )
    m = S.snapshot_write_with_stats(df, root, stats_cols=["ts"])
    # simulate an old manifest: strip the form tags in place
    log_dir = os.path.join(root, "_log")
    path = os.path.join(log_dir, sorted(os.listdir(log_dir))[-1])
    man = json.load(open(path))
    assert man["version"] == m["version"] and "stats_forms" in man
    del man["stats_forms"]
    json.dump(man, open(path, "w"))

    picked = S.snapshot_scan_pruned(
        spark, root, "ts",
        dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 2, 6),
    )
    assert 0 < len(picked.inputFiles()) < 8
    # the inference branch still rejects the ambiguous forms
    with pytest.raises(TypeError, match="timestamp-form|ambiguous"):
        S.snapshot_scan_pruned(
            spark, root, "ts", dt.date(2024, 1, 2), dt.date(2024, 1, 3)
        )
    with pytest.raises(TypeError, match="ambiguous"):
        S.snapshot_scan_pruned(
            spark, root, "ts", "2024-01-01", "2024-01-02"
        )


def test_commit_tolerates_legacy_int_txn_entries(spark, root):
    """Review r12 (crash-class): pre-dict-form manifests stored txn as
    {app: batch_id} (bare int). The read path tolerates both forms,
    but _commit's retention filter indexed e['v'] and raised TypeError
    — bricking EVERY later commit on such a table and leaking one
    orphan data dir per attempt. The carry now normalizes legacy
    entries (adopting the committing version for retention)."""
    import json
    import os

    from pyspark.sql import functions as F

    df = spark.range(0, 10).select(F.col("id").alias("k"))
    S.snapshot_write(df, root)
    # rewrite the manifest's txn into the legacy int form in place
    log = os.path.join(root, "_log")
    path = os.path.join(log, sorted(os.listdir(log))[-1])
    man = json.load(open(path))
    man["txn"] = {"legacy_app": 7}
    json.dump(man, open(path, "w"))

    m2 = S.snapshot_write(df, root)  # used to raise TypeError
    assert m2["txn"]["legacy_app"] == {"b": 7, "v": m2["version"]}
    assert S.snapshot_read(spark, root).count() == 10


def test_commit_publishes_manifests_atomically(spark, root, monkeypatch):
    """Review r12 (brick-class): the manifest used to become VISIBLE
    (empty) at os.open before json.dump filled it — a reader in that
    window crashed on JSONDecodeError, and a writer killed mid-commit
    left a permanently unreadable table. The commit now writes the
    full payload to a private temp file and claims the version with
    os.link (atomic appear-with-contents, same one-winner semantics).
    Pin: at the instant the manifest name exists, its contents parse;
    and a concurrent claim still raises SnapshotConflict."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    df = spark.range(0, 5).select(F.col("id").alias("k"))

    seen = []
    real_link = os.link

    def spying_link(src, dst, **kw):
        real_link(src, dst, **kw)
        # the INSTANT the manifest is visible it must parse fully
        seen.append(_json.load(open(dst))["version"])

    monkeypatch.setattr(os, "link", spying_link)
    m = S.snapshot_write(df, root)
    assert seen and seen[-1] == m["version"]
    monkeypatch.undo()

    # losing a version race still surfaces as SnapshotConflict, and
    # the loser's temp file is cleaned up
    target = S._manifest_file(root, m["version"] + 1)
    open(target, "w").write("{}")
    with pytest.raises(S.SnapshotConflict):
        S._commit(root, m["data_dir"], "write", {})
    log = os.path.dirname(target)
    assert not [n for n in os.listdir(log) if ".tmp." in n]


def test_publish_guards_the_claim_window_with_expected_base(
    spark, root, monkeypatch
):
    """Review r12 (lost-update): snapshot_publish verified mainline
    had not diverged, then committed WITHOUT expected_base — a
    mainline commit landing between the check and the claim was
    silently overwritten. The publish now pins its verified mainline
    head as expected_base, so that race raises SnapshotConflict."""
    from pyspark.sql import functions as F

    df = spark.range(0, 8).select(F.col("id").alias("k"))
    S.snapshot_write(df, root)
    S.snapshot_create_branch(root, "audit")
    S.snapshot_write(df.limit(3), root, branch="audit")

    # interleave a mainline commit INSIDE the publish's claim window:
    # patch _list_manifests (the interloper scan) to commit right
    # after it returns its clean answer
    real_list = S._list_manifests
    fired = []

    def racing_list(r):
        out = real_list(r)
        if not fired:
            fired.append(True)
            S.snapshot_write(df.limit(5), root)
        return out

    monkeypatch.setattr(S, "_list_manifests", racing_list)
    with pytest.raises(S.SnapshotConflict):
        S.snapshot_publish(root, "audit")
    monkeypatch.undo()
    # the interleaved mainline write is still the readable latest
    assert S.snapshot_read(spark, root).count() == 5


def test_rollback_carries_bloom_index(spark, root):
    """Review r12: rollback carried files/stats but DROPPED the bloom
    payload — point lookups on latest raised 'no bloom index' for a
    data dir whose bitmaps were byte-for-byte valid, and the next
    compact silently dropped the index from the table for good."""
    from pyspark.sql import functions as F

    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    ).repartitionByRange(4, "k")
    m1 = S.snapshot_write_with_stats(
        df, root, stats_cols=["k"], bloom_cols=["k"]
    )
    S.snapshot_write(df.limit(1), root)  # the bad commit
    m3 = S.snapshot_rollback(root, to_version=m1["version"])
    for key in ("blooms", "bloom_cols", "bloom_types", "bloom_conf"):
        assert m3.get(key) == m1.get(key), key
    got = S.snapshot_scan_point(spark, root, "k", 123)
    assert got.filter(F.col("k") == 123).count() == 1
    # compaction after the rollback keeps the index alive
    m4 = S.snapshot_compact(spark, root, target_files=2)
    assert m4.get("bloom_cols") == ["k"]


def test_scan_point_empty_bloom_map_is_exact_empty(spark, root):
    """Review r12: an indexed write whose rows are all NULL records
    blooms={} — the exact verdict for any non-null lookup is 'no file
    can match' (limit(0)), not a missing-index ValueError."""
    from pyspark.sql import functions as F

    df = spark.range(0, 20).select(
        F.lit(None).cast("long").alias("k"), F.col("id").alias("v")
    )
    S.snapshot_write_with_stats(
        df, root, stats_cols=["v"], bloom_cols=["k"]
    )
    got = S.snapshot_scan_point(spark, root, "k", 5)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "v"]


def test_vacuum_keep_last_zero_rejected(spark, root):
    """Review r12: manifests[-0:] is the whole list, so keep_last=0
    silently retained EVERYTHING (the opposite of the request) —
    loud reject instead."""
    from pyspark.sql import functions as F

    S.snapshot_write(spark.range(3).select("id"), root)
    with pytest.raises(ValueError, match="keep_last"):
        S.snapshot_vacuum(root, keep_last=0)


def test_vacuum_normalizes_spelling_across_manifests(spark, root):
    """Review r12 (data-loss): retained/removable compared VERBATIM
    data_dir strings while only the orphan scan realpath-normalized —
    the same physical dir spelled relative in an old manifest and
    absolute in the latest (commit_existing from another cwd) was
    deleted out from under the retained version."""
    import os

    from pyspark.sql import functions as F

    df = spark.range(0, 12).select(F.col("id").alias("k"))
    m1 = S.snapshot_write(df, root)
    S.snapshot_write(df.limit(2), root)
    S.snapshot_write(df.limit(3), root)
    # latest re-points at v1's dir under a DIFFERENT spelling
    alt = os.path.abspath(m1["data_dir"])
    assert alt != m1["data_dir"] or os.path.isabs(m1["data_dir"])
    S.snapshot_commit_existing(root, alt, op="rollback")
    removed = S.snapshot_vacuum(root, keep_last=2)
    # v1's dir is retained (latest points at it, just spelled
    # differently); the table stays readable
    assert os.path.realpath(m1["data_dir"]) not in {
        os.path.realpath(d) for d in removed
    }
    assert S.snapshot_read(spark, root).count() == 12


def test_timestamp_bounds_aware_and_secondless_forms(spark, root):
    """Review r12: (a) tz-AWARE datetime bounds rendered with a
    '+00:00' suffix that sorts after the same instant's naive
    rendering — equal-boundary files were silently pruned; both
    renderers now canonicalize aware values to UTC-naive. (b) a
    seconds-less ISO string matched neither timestamp regex, passed
    through with its 'T', and pruned the whole day — now a loud
    reject."""
    import datetime as dt

    from pyspark.sql import functions as F

    df = (
        spark.range(0, 4_000)
        .select(
            F.col("id").alias("k"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
                + F.make_interval(hours=F.col("id") % 96)
            ).alias("ts"),
        )
        .repartitionByRange(8, "ts")
    )
    S.snapshot_write_with_stats(df, root, stats_cols=["ts"])
    naive = (dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 2, 6))
    aware = tuple(
        t.replace(tzinfo=dt.timezone.utc) for t in naive
    )
    a = sorted(
        S.snapshot_scan_pruned(spark, root, "ts", *naive).inputFiles()
    )
    b = sorted(
        S.snapshot_scan_pruned(spark, root, "ts", *aware).inputFiles()
    )
    assert a == b and 0 < len(a) < 8
    with pytest.raises(TypeError, match="unrecognized timestamp"):
        S.snapshot_scan_pruned(
            spark, root, "ts", "2024-01-02T03:04", "2024-01-02T05:04"
        )


def test_scan_pruned_includes_files_without_stats(spark, root):
    """Files with NO information for the scan column: r13 splits this
    into two cases. A column absent from every file is PROVABLY
    all-NULL there (recorded as nulls == rows), so a range scan can
    skip those files — zero rows lost, the column holds no value in
    any range. A manifest with no null info at all (legacy) stays
    conservatively kept."""
    import json

    from pyspark.sql import functions as F

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    m = S.snapshot_write_with_stats(df, root, stats_cols=["missing_col"])
    pruned = S.snapshot_scan_pruned(spark, root, "missing_col", 0, 1)
    assert len(pruned.inputFiles()) == 0 and pruned.count() == 0
    # schema is preserved by the empty-selection fallback
    assert pruned.columns == ["k"]
    # legacy manifest (no null counts recorded): conservatively kept
    path = S._manifest_file(root, m["version"])
    with open(path) as fh:
        manifest = json.load(fh)
    for f in manifest["files"]:
        f.pop("nulls", None)
        f.pop("rows", None)
    with open(path, "w") as fh:
        json.dump(manifest, fh)
    assert S.snapshot_scan_pruned(
        spark, root, "missing_col", 0, 1
    ).count() == 100


def test_streaming_snapshot_sink_batchid_idempotent(
    spark, sf_dir, tmp_path
):
    """Snapshot-backed streaming merge sink: committed content equals
    the batch merge of all micro-batches; a replayed batch id commits
    nothing new; history holds one version per micro-batch."""
    from dex_data_ingestor_spark.io import load_table
    from dex_data_ingestor_spark.streaming.jobs import (
        events_stream_from_parquet,
        foreach_batch_merge_snapshots,
    )

    src = str(tmp_path / "src")
    ev = load_table(spark, sf_dir, "events").limit(200)
    ev.limit(120).write.mode("overwrite").parquet(src)  # file 1 (+2)
    ev.subtract(ev.limit(120)).write.mode("append").parquet(src)

    root = str(tmp_path / "tbl")
    stream = events_stream_from_parquet(
        spark, src, max_files_per_trigger=1
    ).select("event_id", "user_id", "event_type", "value")
    q = foreach_batch_merge_snapshots(
        stream, str(tmp_path / "ckpt"), root, keys=["event_id"], spark=spark
    )
    q.awaitTermination(timeout=180)

    got = {
        (r.event_id, r.value)
        for r in S.snapshot_read(spark, root).collect()
    }
    want = {
        (r.event_id, r.value)
        for r in ev.select("event_id", "value").distinct().collect()
    }
    assert got == want and len(got) == 200

    versions = S.snapshot_versions(root)
    n_before = len(versions)
    assert n_before >= 1
    assert [m["op"] for m in versions] == ["stream-merge"] * n_before

    # at-least-once replay of THE SAME WRITER: clearing the checkpoint
    # but keeping its path renumbers batches from 0 under the same txn
    # app id (default = checkpoint path) -> every batch id is <= the
    # app's committed watermark, zero new versions. This is Delta's
    # (txnAppId, txnVersion) contract — and like Delta, an operator who
    # deletes a checkpoint but feeds DIFFERENT data must change the
    # app id (txn_app_id param) or the replay guard will skip it.
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"))
    q2 = foreach_batch_merge_snapshots(
        events_stream_from_parquet(spark, src, max_files_per_trigger=1)
        .select("event_id", "user_id", "event_type", "value"),
        str(tmp_path / "ckpt"),
        root,
        keys=["event_id"],
        spark=spark,
    )
    q2.awaitTermination(timeout=180)
    assert len(S.snapshot_versions(root)) == n_before

    # a REPLACEMENT stream (different checkpoint => different app id)
    # must NOT be mistaken for a replay: its batches MERGE instead of
    # being dropped (the bare-batch-id guard failed exactly this);
    # content is unchanged by merge idempotence, history grows.
    q3 = foreach_batch_merge_snapshots(
        events_stream_from_parquet(spark, src, max_files_per_trigger=1)
        .select("event_id", "user_id", "event_type", "value"),
        str(tmp_path / "ckpt_replacement"),
        root,
        keys=["event_id"],
        spark=spark,
    )
    q3.awaitTermination(timeout=180)
    versions2 = S.snapshot_versions(root)
    assert len(versions2) > n_before
    # both writers' watermarks are carried in the latest manifest
    assert len(versions2[-1]["txn"]) == 2
    got2 = {
        (r.event_id, r.value)
        for r in S.snapshot_read(spark, root).collect()
    }
    assert got2 == want


def test_compact_folds_files_without_changing_content(spark, root):
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    ).repartition(8)
    S.snapshot_write(df, root)
    before = S.snapshot_read(spark, root)
    assert len(before.inputFiles()) == 8

    m = S.snapshot_compact(spark, root, target_files=1)
    assert m["op"] == "compact" and m["version"] == 2
    after = S.snapshot_read(spark, root)
    assert len(after.inputFiles()) == 1
    assert _rows(after) == _rows(before)
    # uncompacted version still readable
    assert len(S.snapshot_read(spark, root, version=1).inputFiles()) == 8


def test_vacuum_is_reference_counted_and_keeps_retained(spark, root):
    v = [
        spark.createDataFrame([(i, float(i))], "k long, v double")
        for i in range(4)
    ]
    m1 = S.snapshot_write(v[0], root)
    S.snapshot_write(v[1], root)
    S.snapshot_write(v[2], root)
    # v4 is a rollback to v1: shares v1's data_dir
    S.snapshot_rollback(root, to_version=1)

    removed = S.snapshot_vacuum(root, keep_last=2)
    # v1's dir is referenced by retained v4 -> must survive; only v2's
    # dir is removable (v3 retained)
    assert len(removed) == 1
    assert m1["data_dir"] not in removed
    assert _rows(S.snapshot_read(spark, root)) == _rows(v[0])  # v4
    assert _rows(S.snapshot_read(spark, root, version=3)) == _rows(v[2])
    with pytest.raises(Exception):
        S.snapshot_read(spark, root, version=2).collect()  # vacuumed
    # under the keep threshold: no-op
    assert S.snapshot_vacuum(root, keep_last=10) == []


def test_rollback_to_vacuumed_version_refuses(spark, root):
    """Committing a manifest that points at a deleted data dir would
    brick the table's LATEST version — commit_existing must refuse."""
    import pytest

    for i in range(4):
        S.snapshot_write(
            spark.createDataFrame([(i,)], "k long"), root
        )
    removed = S.snapshot_vacuum(root, keep_last=2)
    assert removed
    with pytest.raises(FileNotFoundError, match="missing"):
        S.snapshot_rollback(root, to_version=1)
    # the table is still readable at latest after the refused rollback
    assert S.snapshot_read(spark, root).count() == 1


def test_as_of_naive_datetime_is_utc(spark, root, monkeypatch):
    """A naive as_of must be interpreted as UTC (the manifests' zone),
    NOT the box's local zone — astimezone() on naive input would
    time-travel to a wrong version on any non-UTC machine."""
    import datetime as dt
    import json
    import os

    S.snapshot_write(spark.createDataFrame([(1,)], "k long"), root)
    S.snapshot_write(spark.createDataFrame([(2,)], "k long"), root)
    # pin the two commit times to known UTC instants
    log = os.path.join(root, "_log")
    for name, iso in (
        ("00000001.json", "2026-08-14T10:00:00+00:00"),
        ("00000002.json", "2026-08-14T12:00:00+00:00"),
    ):
        path = os.path.join(log, name)
        m = json.load(open(path))
        m["committed_at"] = iso
        json.dump(m, open(path, "w"))
    # naive 11:00 == 11:00 UTC -> version 1, on EVERY box timezone
    got = S.snapshot_read(
        spark, root, as_of=dt.datetime(2026, 8, 14, 11, 0)
    ).collect()
    assert [r.k for r in got] == [1]


def test_compact_preserves_file_stats(spark, root):
    """Compaction of a stats-tracked table must keep scan pruning
    working (recompute stats for the same columns), not silently
    break snapshot_scan_pruned readers."""
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    ).repartitionByRange(4, "k")
    S.snapshot_write_with_stats(df, root, ["k"])
    m = S.snapshot_compact(spark, root, target_files=2)
    assert m["op"] == "compact" and m.get("stats_cols") == ["k"]
    pruned = S.snapshot_scan_pruned(spark, root, "k", 0, 10)
    assert pruned.filter("k <= 10").count() == 11


def test_vacuum_reclaims_aged_orphans_only(spark, root):
    """Orphan data dirs (writer died pre-commit / lost the commit
    race) are the one garbage class the format guarantees producing;
    vacuum must be able to reclaim them — but only past the age
    threshold, so an in-flight write is never raced."""
    import os

    S.snapshot_write(spark.createDataFrame([(1,)], "k long"), root)
    # orphan: data written, manifest never committed
    orphan = os.path.join(root, "data", "deadbeef")
    spark.createDataFrame([(9,)], "k long").write.parquet(orphan)
    # young orphan survives a 1-hour threshold
    assert S.snapshot_vacuum(root, keep_last=1,
                             orphans_min_age_s=3600) == []
    assert os.path.isdir(orphan)
    # aged orphan (threshold 0) is reclaimed; referenced dir survives
    removed = S.snapshot_vacuum(root, keep_last=1, orphans_min_age_s=0)
    assert removed == [orphan]
    assert S.snapshot_read(spark, root).count() == 1


def test_rollback_preserves_file_stats(spark, root):
    """Rolling back to a stats-tracked version must carry its file
    stats into the rollback manifest (same data dir, same footers):
    scan pruning keeps working and a later compact keeps stats."""
    from pyspark.sql import functions as F

    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    ).repartitionByRange(2, "k")
    S.snapshot_write_with_stats(df, root, ["k"])
    S.snapshot_write(df.limit(1), root)          # the "bad" version
    m = S.snapshot_rollback(root, to_version=1)
    assert m.get("stats_cols") == ["k"] and m.get("files")
    assert S.snapshot_scan_pruned(spark, root, "k", 0, 10).count() > 0
    m2 = S.snapshot_compact(spark, root)
    assert m2.get("stats_cols") == ["k"]


def test_vacuum_orphans_with_different_root_spelling(spark, root):
    """Orphan reclamation must normalize paths before comparing: a
    caller spelling the root differently (here: a redundant '.') must
    NOT mistake the live latest version's dir for an orphan."""
    import os

    S.snapshot_write(spark.createDataFrame([(1,)], "k long"), root)
    alt_root = os.path.join(os.path.dirname(root), ".",
                            os.path.basename(root))
    removed = S.snapshot_vacuum(alt_root, keep_last=1,
                                orphans_min_age_s=0)
    assert removed == []
    assert S.snapshot_read(spark, root).count() == 1


def test_commit_existing_allows_remote_scheme_paths(spark, root):
    """The vacuumed-dir guard only applies to local paths: a
    scheme-qualified (hdfs://, s3a://) data dir cannot be checked
    driver-side and must pass through, or rollback/conflict-retry
    breaks on the documented remote-data layout."""
    S.snapshot_write(spark.createDataFrame([(1,)], "k long"), root)
    m = S.snapshot_commit_existing(
        root, "s3a://bucket/tbl/data/abc", op="remote-commit"
    )
    assert m["version"] == 2


def test_txn_watermarks_expire_by_version_distance(spark, root,
                                                   monkeypatch):
    """The carried-forward txn map must not grow forever: writers idle
    past TXN_RETENTION_VERSIONS are expired (Delta's txn retention,
    version-based)."""
    monkeypatch.setattr(S, "TXN_RETENTION_VERSIONS", 2)
    df = spark.createDataFrame([(1,)], "k long")
    S.snapshot_write(df, root, extra={"txn": {"appA": 0}})   # v1
    S.snapshot_write(df, root, extra={"txn": {"appB": 0}})   # v2
    S.snapshot_write(df, root)                               # v3
    m = S.snapshot_write(df, root)                           # v4
    txn = m["txn"]
    assert "appA" not in txn          # v4 - v1 > 2 -> expired
    assert txn["appB"]["b"] == 0      # v4 - v2 <= 2 -> retained


def test_compact_cluster_by_makes_skipping_selective(spark, root):
    """Arrival-order ingest leaves every file spanning the whole key
    domain (skipping can never fire); compact(cluster_by=...) rewrites
    into disjoint ranges so a narrow scan prunes to few files, with
    identical content, a recorded stats column, and intact history."""
    from pyspark.sql import functions as F

    # arrival-order: round-robin shuffle of keys across 8 files
    df = spark.range(0, 8_000).select(
        (F.col("id") * 2654435761 % 8_000).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    ).repartition(8)
    S.snapshot_write_with_stats(df, root, stats_cols=["k"])

    # before clustering: every file spans ~the whole domain, nothing prunes
    wide = S.snapshot_scan_pruned(spark, root, "k", 100, 200)
    assert len(wide.inputFiles()) == 8

    m = S.snapshot_compact(spark, root, target_files=8, cluster_by=["k"])
    assert m["op"] == "compact" and "k" in m["stats_cols"]

    pruned = S.snapshot_scan_pruned(spark, root, "k", 100, 200)
    assert len(pruned.inputFiles()) <= 2  # disjoint ranges -> few files
    got = _rows(pruned.filter(F.col("k").between(100, 200)))
    want = _rows(
        S.snapshot_read(spark, root).filter(F.col("k").between(100, 200))
    )
    assert got == want and len(got) > 0
    # full content unchanged and the unclustered version still readable
    assert sorted(_rows(S.snapshot_read(spark, root))) == sorted(
        _rows(S.snapshot_read(spark, root, version=1))
    )


def test_zorder_key_matches_python_morton(spark):
    """The engine-side Morton key must equal the textbook bit
    interleave on a full small grid (including the domain corners)."""
    from pyspark.sql import functions as F

    def morton(a: int, b: int, bits: int = 4) -> int:
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("a"), (F.col("id") / 16).cast("long").alias("b")
    )
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn(
            "z", S.zorder_key(["a", "b"], bits=4)
        ).collect()
    }
    assert got == {(a, b): morton(a, b) for a in range(16) for b in range(16)}
    with pytest.raises(ValueError, match="under 64"):
        S.zorder_key(["a", "b"], bits=32)


def test_compact_zorder_prunes_on_trailing_column(spark, root):
    """The z-order claim, measured: on a 64x64 uniform grid compacted
    to 16 files, a narrow filter on the TRAILING column prunes to few
    files under zorder_by — and prunes NOTHING under linear
    cluster_by on the leading column (every a-range file spans the
    whole b domain). Content identical either way."""
    from pyspark.sql import functions as F

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    ).repartition(8)
    S.snapshot_write_with_stats(df, root, stats_cols=["a", "b"])

    # linear clustering on a: a b-filter cannot prune
    S.snapshot_compact(spark, root, target_files=16, cluster_by=["a"])
    linear = S.snapshot_scan_pruned(spark, root, "b", 0, 7)
    assert len(linear.inputFiles()) == 16

    m = S.snapshot_compact(
        spark, root, target_files=16, zorder_by=["a", "b"], zorder_bits=6
    )
    assert set(["a", "b"]) <= set(m["stats_cols"])
    zed = S.snapshot_scan_pruned(spark, root, "b", 0, 7)
    assert len(zed.inputFiles()) <= 8, zed.inputFiles()
    # and the leading column still prunes too (z-order is symmetric)
    zed_a = S.snapshot_scan_pruned(spark, root, "a", 0, 7)
    assert len(zed_a.inputFiles()) <= 8, zed_a.inputFiles()
    got = _rows(zed.filter(F.col("b") <= 7))
    want = _rows(S.snapshot_read(spark, root).filter(F.col("b") <= 7))
    assert sorted(got) == sorted(want) and len(got) == 64 * 8
    with pytest.raises(ValueError, match="exclusive"):
        S.snapshot_compact(
            spark, root, cluster_by=["a"], zorder_by=["b"]
        )


def test_bloom_index_point_lookup_prunes_scattered_column(spark, root):
    """The bloom-index claim: a high-cardinality id scattered
    round-robin across files defeats min/max skipping entirely (every
    file spans ~the whole domain), but the per-file Bloom prunes a
    point lookup to the files that actually (might) hold the value —
    and an absent value prunes to (near) zero files. Results always
    equal the exact filter (superset guarantee)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 8_000).select(
        (F.col("id") * 2654435761 % 100_000).alias("uid"),
        F.col("id").alias("payload"),
    ).repartition(16)
    S.snapshot_write_with_stats(
        df, root, stats_cols=["uid"], bloom_cols=["uid"]
    )
    # pick a real uid and find its true home-file count
    probe = S.snapshot_read(spark, root).select("uid").head()["uid"]
    # min/max stats cannot prune the scattered column
    wide = S.snapshot_scan_pruned(spark, root, "uid", probe, probe)
    assert len(wide.inputFiles()) == 16
    hit = S.snapshot_scan_point(spark, root, "uid", probe)
    # ~1% fp rate at 500 keys/file: expect ~the 1 true file, allow <= 4
    assert 1 <= len(hit.inputFiles()) <= 4, hit.inputFiles()
    got = _rows(hit.filter(F.col("uid") == probe))
    want = _rows(
        S.snapshot_read(spark, root).filter(F.col("uid") == probe)
    )
    assert sorted(got) == sorted(want) and len(got) >= 1
    # absent value: bloom says no almost everywhere
    miss = S.snapshot_scan_point(spark, root, "uid", 99_999_999)
    assert len(miss.inputFiles()) <= 4
    assert miss.filter(F.col("uid") == 99_999_999).count() == 0
    with pytest.raises(ValueError, match="NULL"):
        S.snapshot_scan_point(spark, root, "uid", None)


def test_bloom_index_survives_compaction(spark, root):
    """Compaction must recompute the bloom index for the new file
    layout — a reader's point lookup keeps working (and keeps
    pruning) across the rewrite."""
    from pyspark.sql import functions as F

    df = spark.range(0, 4_000).select(
        (F.col("id") * 40503 % 65_536).alias("uid"),
        F.col("id").alias("payload"),
    ).repartition(8)
    S.snapshot_write_with_stats(
        df, root, stats_cols=["uid"], bloom_cols=["uid"]
    )
    probe = S.snapshot_read(spark, root).select("uid").head()["uid"]
    S.snapshot_compact(spark, root, target_files=8)
    m = S.snapshot_versions(root)[-1]
    assert m["op"] == "compact" and m.get("bloom_cols") == ["uid"]
    hit = S.snapshot_scan_point(spark, root, "uid", probe)
    assert 1 <= len(hit.inputFiles()) <= 3
    assert hit.filter(F.col("uid") == probe).count() >= 1


def test_merge_schema_evolution_widens_and_rejects(spark, root):
    """A source batch with a NEW column must be rejected by default
    (merge_upsert would silently drop it), and with
    evolve_schema=True must widen the table: prior rows NULL, merged
    rows valued, the evolution recorded in the manifest, and the
    pre-evolution version still reading with its OWN schema."""
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, v double"
    )
    S.snapshot_write(base, root)
    upd = spark.createDataFrame(
        [(2, 21.0, "eu"), (3, 30.0, "us")],
        "id long, v double, region string",
    )
    with pytest.raises(ValueError, match="evolve_schema"):
        S.snapshot_merge(spark, root, upd, keys=["id"])
    m = S.snapshot_merge(
        spark, root, upd, keys=["id"], evolve_schema=True
    )
    assert m["evolved_cols"] == ["region"]
    got = {
        r.id: (r.v, r.region)
        for r in S.snapshot_read(spark, root).collect()
    }
    assert got == {1: (10.0, None), 2: (21.0, "eu"), 3: (30.0, "us")}
    # time travel across the evolution boundary keeps the old schema
    assert S.snapshot_read(spark, root, version=1).columns == ["id", "v"]


def test_snapshot_changes_is_a_derived_cdf(spark, root):
    """The change feed between two versions: inserts/updates/deletes
    with changed-column attribution, keys defaulting to the recorded
    MERGE key set, and schema evolution handled by comparing only the
    shared columns."""
    from pyspark.sql import functions as F

    v1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (4, 40.0)], "id long, v double"
    )
    S.snapshot_write(v1, root)
    upd = spark.createDataFrame(
        [(2, 21.0, "eu"), (3, 30.0, "us")],
        "id long, v double, region string",
    )
    S.snapshot_merge(
        spark, root, upd, keys=["id"], evolve_schema=True
    )
    feed = {
        r.id: (r.status, r.changed_cols)
        for r in S.snapshot_changes(spark, root, from_version=1).collect()
    }
    # id 4 is untouched by MERGE (upsert never deletes): not in feed
    assert feed == {2: ("changed", "v"), 3: ("added", "")}
    # explicit keys + a removal, via a rollback-style rewrite
    v3 = S.snapshot_read(spark, root).filter(F.col("id") != 4)
    S.snapshot_write(v3, root)
    feed2 = {
        r.id: r.status
        for r in S.snapshot_changes(
            spark, root, from_version=2, to_version=3, keys=["id"]
        ).collect()
    }
    assert feed2 == {4: "removed"}
    with pytest.raises(ValueError, match="key set"):
        S.snapshot_changes(spark, root, from_version=1, to_version=1)


def test_check_constraints_block_bad_commits_and_persist(spark, root):
    """Table CHECK constraints: a violating first write commits
    NOTHING; a clean write records the set; a later MERGE whose
    result violates is blocked (constraints persist across commits,
    Delta semantics); NULL predicate inputs count as violations."""
    from pyspark.sql import functions as F

    bad = spark.createDataFrame(
        [(1, -5.0), (2, 20.0)], "id long, v double"
    )
    cons = {"v_nonneg": "v >= 0", "id_notnull": "id IS NOT NULL"}
    with pytest.raises(S.ConstraintViolation, match="v_nonneg"):
        S.snapshot_write(bad, root, constraints=cons)
    assert not S.snapshot_versions(root)  # nothing committed

    good = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, v double"
    )
    m = S.snapshot_write(good, root, constraints=cons)
    assert m["constraints"] == cons

    # merge result violating the PERSISTED constraint is blocked
    upd = spark.createDataFrame([(2, -1.0)], "id long, v double")
    with pytest.raises(S.ConstraintViolation, match="v_nonneg"):
        S.snapshot_merge(spark, root, upd, keys=["id"])
    assert S.snapshot_versions(root)[-1]["version"] == 1  # unchanged

    # NULL predicate counts as a violation, not a pass
    nul = spark.createDataFrame(
        [(3, None)], "id long, v double"
    )
    with pytest.raises(S.ConstraintViolation, match="v_nonneg"):
        S.snapshot_merge(spark, root, nul, keys=["id"])

    # a clean merge commits and carries the constraint set forward
    ok = spark.createDataFrame([(3, 30.0)], "id long, v double")
    m2 = S.snapshot_merge(spark, root, ok, keys=["id"])
    assert m2["constraints"] == cons
    assert S.snapshot_read(spark, root).count() == 3


def test_constraints_drop_and_stats_path_and_extra_rejected(spark, root):
    """drop_constraints is the only way to remove a persisted CHECK;
    extra['constraints'] is rejected on both write paths (recorded
    must equal enforced); and the stats/bloom write path establishes
    constraints in the SAME commit."""
    from pyspark.sql import functions as F

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    m = S.snapshot_write_with_stats(
        df, root, stats_cols=["id"], bloom_cols=["id"],
        constraints={"v_nonneg": "v >= 0"},
    )
    assert m["constraints"] == {"v_nonneg": "v >= 0"}
    assert m["stats_cols"] == ["id"] and m["bloom_cols"] == ["id"]
    with pytest.raises(ValueError, match="extra"):
        S.snapshot_write(df, root, extra={"constraints": {}})
    # drop, then a previously-violating write commits
    bad = spark.createDataFrame([(1, -1.0)], "id long, v double")
    with pytest.raises(S.ConstraintViolation):
        S.snapshot_merge(spark, root, bad, keys=["id"])
    m2 = S.snapshot_write(
        S.snapshot_read(spark, root).union(bad),
        root,
        drop_constraints=["v_nonneg"],
    )
    assert "constraints" not in m2 or not m2["constraints"]


def test_merge_evolution_rejects_case_variant_column(spark, root):
    """A case-variant source column (v vs V) must NOT be treated as
    new: Spark resolves case-insensitively, and widening would
    silently NULL the existing column."""
    base = spark.createDataFrame([(1, 10.0)], "id long, v double")
    S.snapshot_write(base, root)
    upd = spark.createDataFrame([(1, 11.0)], "id long, V double")
    m = S.snapshot_merge(
        spark, root, upd, keys=["id"], evolve_schema=True
    )
    assert "evolved_cols" not in m
    got = S.snapshot_read(spark, root).head()
    assert got.v == 11.0


def test_delete_versioned_null_semantics_and_cdf(spark, root):
    """snapshot_delete: copy-on-write DELETE — predicate-TRUE rows
    vanish from the new version, NULL-predicate rows are KEPT (SQL
    DELETE proves, never assumes), every prior version still reads,
    the manifest records predicate + n_deleted, and the change data
    feed reconstructs exactly the removed keys."""
    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)],
        "k long, v double",
    )
    S.snapshot_write(base, root)
    m2 = S.snapshot_delete(spark, root, "v >= 20.0")
    assert m2["op"] == "delete"
    assert m2["n_deleted"] == 2          # rows 2 and 4; NULL row kept
    assert m2["predicate"] == "v >= 20.0"
    assert _rows(S.snapshot_read(spark, root)) == {(1, 10.0), (3, None)}
    assert _rows(S.snapshot_read(spark, root, version=1)) == _rows(base)
    # manifest persists the audit trail
    versions = {m["version"]: m for m in S.snapshot_versions(root)}
    assert versions[2]["n_deleted"] == 2
    # CDF between the two versions = exactly the removed keys
    changes = S.snapshot_changes(spark, root, 1, 2, keys=["k"])
    assert {(r.k, r.status) for r in changes.collect()} == {
        (2, "removed"), (4, "removed"),
    }


def test_delete_carries_constraints_forward(spark, root):
    """A DELETE commit re-records and keeps enforcing persisted CHECK
    constraints (recorded == enforced holds on every commit path)."""
    base = spark.createDataFrame([(1, 5.0), (2, 9.0)], "k long, v double")
    S.snapshot_write(base, root, constraints={"v_pos": "v > 0"})
    S.snapshot_delete(spark, root, "k = 2")
    versions = S.snapshot_versions(root)
    assert versions[-1]["constraints"] == {"v_pos": "v > 0"}
    # and a later write that violates still fails
    bad = spark.createDataFrame([(9, -1.0)], "k long, v double")
    with pytest.raises(S.ConstraintViolation):
        S.snapshot_merge(spark, root, bad, keys=["k"])


def test_update_reads_pre_update_values_and_enforces(spark, root):
    """snapshot_update: assignments all read the OLD row (a swap
    update proves it — chained evaluation would make b = old a twice),
    NULL-predicate rows pass through, unknown target columns reject,
    the manifest records the audit fields, and a violating UPDATE
    commits nothing under a persisted constraint."""
    base = spark.createDataFrame(
        [(1, 10.0, 100.0), (2, 20.0, 200.0), (3, None, 300.0)],
        "k long, a double, b double",
    )
    S.snapshot_write(base, root, constraints={"b_pos": "b > 0"})
    m2 = S.snapshot_update(
        spark, root, "a >= 20.0", {"a": "b", "b": "a"}
    )
    assert m2["op"] == "update" and m2["n_updated"] == 1
    assert _rows(S.snapshot_read(spark, root)) == {
        (1, 10.0, 100.0),
        (2, 200.0, 20.0),        # swapped from the same old row
        (3, None, 300.0),        # NULL predicate: untouched
    }
    assert _rows(S.snapshot_read(spark, root, version=1)) == _rows(base)
    versions = {m["version"]: m for m in S.snapshot_versions(root)}
    assert versions[2]["set"] == {"a": "b", "b": "a"}

    with pytest.raises(ValueError):
        S.snapshot_update(spark, root, "k = 1", {"nope": "1"})
    # an UPDATE that breaks the persisted constraint commits nothing
    with pytest.raises(S.ConstraintViolation):
        S.snapshot_update(spark, root, "k = 1", {"b": "-1.0"})
    assert S.snapshot_versions(root)[-1]["version"] == 2


def test_tag_pins_version_and_survives_vacuum(spark, root):
    dfs = [
        spark.createDataFrame([(i, float(i))], "k long, v double")
        for i in range(1, 6)
    ]
    m1 = S.snapshot_write(dfs[0], root)
    for d in dfs[1:]:
        S.snapshot_write(d, root)
    S.snapshot_create_tag(root, "train-run-1", version=1)

    # resolve by ref == explicit version
    assert _rows(S.snapshot_read(spark, root, ref="train-run-1")) == {
        (1, 1.0)
    }
    # vacuum keeps the tagged dir even though it is far outside the
    # retention window; untagged old dirs go
    removed = S.snapshot_vacuum(root, keep_last=2)
    assert m1["data_dir"] not in removed
    assert len(removed) == 2  # v2, v3 (v4, v5 retained; v1 pinned)
    assert _rows(S.snapshot_read(spark, root, ref="train-run-1")) == {
        (1, 1.0)
    }
    # tags are immutable: same name again conflicts
    with pytest.raises(S.SnapshotConflict):
        S.snapshot_create_tag(root, "train-run-1", version=2)
    # ... until deleted and recreated
    S.snapshot_delete_ref(root, "train-run-1")
    S.snapshot_create_tag(root, "train-run-1", version=4)
    assert S._read_ref(root, "train-run-1")["version"] == 4


def test_branch_write_audit_publish_flow(spark, root):
    base = spark.createDataFrame([(1, "a")], "k long, s string")
    S.snapshot_write(base, root)
    S.snapshot_create_branch(root, "staging")

    # nothing staged yet: branch head == base; publish refuses
    assert _rows(S.snapshot_read(spark, root, ref="staging")) == {(1, "a")}
    with pytest.raises(ValueError, match="no staged commits"):
        S.snapshot_publish(root, "staging")

    staged1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    staged2 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, s string"
    )
    S.snapshot_write(staged1, root, branch="staging")
    m_head = S.snapshot_write(
        staged2, root, branch="staging", extra={"audit": "pending"}
    )

    # mainline latest, as_of, and versions-by-default are all blind to
    # the staged commits
    assert _rows(S.snapshot_read(spark, root)) == {(1, "a")}
    assert _rows(
        S.snapshot_read(spark, root, as_of=m_head["committed_at"])
    ) == {(1, "a")}
    # the branch ref sees the staged head
    assert _rows(S.snapshot_read(spark, root, ref="staging")) == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }

    pub = S.snapshot_publish(root, "staging")
    # publish fast-forwards: no data copy, payload carried over
    assert pub["data_dir"] == m_head["data_dir"]
    assert pub["audit"] == "pending"
    assert pub["published_from"] == {
        "branch": "staging",
        "head_version": m_head["version"],
        # the ref's unique id travels with the publish record so later
        # publish-guard checks can tell this branch run from a
        # deleted-and-recreated namesake
        "branch_id": S._read_ref(root, "staging")["id"],
    }
    assert _rows(S.snapshot_read(spark, root)) == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }


def test_ref_validation_and_errors(spark, root):
    S.snapshot_write(
        spark.createDataFrame([(1,)], "k long"), root
    )
    with pytest.raises(KeyError):
        S.snapshot_read(spark, root, ref="nope")
    with pytest.raises(ValueError):
        S._ref_file(root, "bad/name")
    with pytest.raises(ValueError):
        S.snapshot_read(spark, root, version=1, ref="x")
    # a ref cannot pin an uncommitted version
    with pytest.raises(KeyError):
        S.snapshot_create_tag(root, "t", version=99)
    # writing to a tag (not a branch) is rejected
    S.snapshot_create_tag(root, "release", version=1)
    with pytest.raises(ValueError, match="tag, not a branch"):
        S.snapshot_write(
            spark.createDataFrame([(2,)], "k long"), root, branch="release"
        )
    # publishing a tag is rejected too
    with pytest.raises(ValueError, match="tag, not a branch"):
        S.snapshot_publish(root, "release")


def test_maintain_grouped_sums_equals_recompute(spark):
    """The signed-delta maintenance path is EXACTLY a full recompute
    (decimal sums — no float drift), across inserts, updates (both
    images), and a whole-group deletion."""
    from dex_data_ingestor_spark.operators import matview as MV

    v0 = spark.createDataFrame(
        [
            ("a", 1, 10.5),
            ("a", 2, 0.25),
            ("b", 3, 7.0),
            ("c", 4, 1.125),
        ],
        "g string, k long, v double",
    )
    base = MV.grouped_sums(v0, ["g"], ["v"])

    # v1: update k=2 (pre+post), insert k=5 into b, delete group c
    removed = spark.createDataFrame(
        [("a", 2, 0.25), ("c", 4, 1.125)], "g string, k long, v double"
    )
    added = spark.createDataFrame(
        [("a", 2, 99.75), ("b", 5, -3.5)], "g string, k long, v double"
    )
    v1 = spark.createDataFrame(
        [
            ("a", 1, 10.5),
            ("a", 2, 99.75),
            ("b", 3, 7.0),
            ("b", 5, -3.5),
        ],
        "g string, k long, v double",
    )
    maintained = MV.maintain_grouped_sums(
        base, removed, added, ["g"], ["v"]
    )
    assert _rows(maintained) == _rows(MV.grouped_sums(v1, ["g"], ["v"]))
    # group c is gone, not zero-row
    assert not [r for r in maintained.collect() if r.g == "c"]


def test_snapshot_refresh_agg_incremental_loop(spark, root, tmp_path):
    """Fact table evolves by MERGE and DELETE; one refresh call per
    fact version rolls the snapshot-stored aggregate forward, and the
    maintained aggregate stays EXACTLY equal to a from-scratch
    recompute of the fact head at every step."""
    from dex_data_ingestor_spark.operators import matview as MV

    agg_root = str(tmp_path / "agg")
    fact = spark.createDataFrame(
        [(1, "x", 5.0), (2, "x", 2.5), (3, "y", 4.0)],
        "k long, g string, v double",
    )
    S.snapshot_write(fact, root)
    S.snapshot_write(MV.grouped_sums(fact, ["g"], ["v"]), agg_root)

    # v2: update k=2, insert k=4 (new group z)
    S.snapshot_merge(
        spark,
        root,
        spark.createDataFrame(
            [(2, "x", 100.0), (4, "z", 1.0)], "k long, g string, v double"
        ),
        keys=["k"],
    )
    m = MV.snapshot_refresh_agg(
        spark, root, agg_root, from_version=1,
        group_cols=["g"], measures=["v"],
    )
    assert m["op"] == "refresh" and m["fact_from_version"] == 1
    want = MV.grouped_sums(
        S.snapshot_read(spark, root), ["g"], ["v"]
    )
    assert _rows(S.snapshot_read(spark, agg_root)) == _rows(want)

    # v3: delete all of group x -> the maintained agg must drop it
    S.snapshot_delete(spark, root, "g = 'x'")
    MV.snapshot_refresh_agg(
        spark, root, agg_root, from_version=2,
        group_cols=["g"], measures=["v"], keys=["k"],
    )
    want = MV.grouped_sums(
        S.snapshot_read(spark, root), ["g"], ["v"]
    )
    got = S.snapshot_read(spark, agg_root)
    assert _rows(got) == _rows(want)
    assert not [r for r in got.collect() if r.g == "x"]


def test_streaming_refresh_agg_drained_parity_and_replay(
    spark, sf_dir, tmp_path
):
    """The streaming roll-up sink, drained over multiple micro-batches,
    is bit-equal to a from-scratch grouped_sums of everything
    ingested; a same-writer replay commits nothing (double-applying a
    delta is undetectable after the fact — the guard must hold)."""
    from dex_data_ingestor_spark.io import load_table
    from dex_data_ingestor_spark.operators import matview as MV
    from dex_data_ingestor_spark.streaming.jobs import (
        events_stream_from_parquet,
        foreach_batch_refresh_agg,
    )

    src = str(tmp_path / "src")
    ev = load_table(spark, sf_dir, "events").limit(200)
    ev.limit(120).write.mode("overwrite").parquet(src)
    ev.subtract(ev.limit(120)).write.mode("append").parquet(src)

    agg_root = str(tmp_path / "agg")
    cols = ["event_id", "event_type", "value"]
    q = foreach_batch_refresh_agg(
        events_stream_from_parquet(
            spark, src, max_files_per_trigger=1
        ).select(*cols),
        str(tmp_path / "ckpt"),
        agg_root,
        group_cols=["event_type"],
        measures=["value"],
        spark=spark,
    )
    q.awaitTermination(timeout=180)

    versions = S.snapshot_versions(agg_root)
    n_before = len(versions)
    assert n_before >= 2  # one maintenance commit per micro-batch
    assert {m["op"] for m in versions} == {"stream-refresh"}
    want = MV.grouped_sums(
        spark.read.parquet(src).select(*cols),
        ["event_type"],
        ["value"],
    )
    assert _rows(S.snapshot_read(spark, agg_root)) == _rows(want)

    # same-writer replay (checkpoint cleared, same path => same app
    # id, batch numbering restarts): every delta must be skipped
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"))
    q2 = foreach_batch_refresh_agg(
        events_stream_from_parquet(
            spark, src, max_files_per_trigger=1
        ).select(*cols),
        str(tmp_path / "ckpt"),
        agg_root,
        group_cols=["event_type"],
        measures=["value"],
        spark=spark,
    )
    q2.awaitTermination(timeout=180)
    assert len(S.snapshot_versions(agg_root)) == n_before
    assert _rows(S.snapshot_read(spark, agg_root)) == _rows(want)


def test_vacuum_pins_mainline_latest_under_staged_tail(spark, root):
    """Staged branch commits can fill the keep_last tail of the shared
    log; vacuum must never evict the MAINLINE-latest data dir — the
    version every default read resolves to."""
    S.snapshot_write(spark.createDataFrame([(1,)], "k long"), root)
    m2 = S.snapshot_write(spark.createDataFrame([(2,)], "k long"), root)
    S.snapshot_create_branch(root, "staging", version=1)
    for i in (3, 4, 5):
        S.snapshot_write(
            spark.createDataFrame([(i,)], "k long"), root,
            branch="staging",
        )
    removed = S.snapshot_vacuum(root, keep_last=3)
    assert m2["data_dir"] not in removed
    assert os.path.isdir(m2["data_dir"])
    assert _rows(S.snapshot_read(spark, root)) == {(2,)}


def test_branch_constraints_stay_invisible_until_publish(spark, root):
    """A CHECK constraint staged on an unpublished branch must not
    govern mainline writes; after publish it must."""
    S.snapshot_write(spark.createDataFrame([(1,)], "v long"), root)
    S.snapshot_create_branch(root, "staging")
    S.snapshot_write(
        spark.createDataFrame([(5,)], "v long"), root,
        branch="staging", constraints={"v_pos": "v > 0"},
    )
    # mainline is blind to the staged constraint
    m = S.snapshot_write(spark.createDataFrame([(-1,)], "v long"), root)
    assert m["constraints"] == {}
    # staged commits on the branch DO inherit it
    with pytest.raises(S.ConstraintViolation):
        S.snapshot_write(
            spark.createDataFrame([(-2,)], "v long"), root,
            branch="staging",
        )
    # mainline advanced past the staged run above, so this branch can
    # no longer fast-forward; restage on a fresh branch and publish —
    # only NOW does the constraint govern mainline
    S.snapshot_create_branch(root, "staging2")
    S.snapshot_write(
        spark.createDataFrame([(6,)], "v long"), root,
        branch="staging2", constraints={"v_pos": "v > 0"},
    )
    S.snapshot_publish(root, "staging2")
    with pytest.raises(S.ConstraintViolation):
        S.snapshot_write(spark.createDataFrame([(-3,)], "v long"), root)


def test_publish_is_fast_forward_only(spark, root):
    """Re-publishing an already-published head (or publishing after
    mainline advanced past the staged run) must raise instead of
    silently rolling mainline back to stale staged data."""
    S.snapshot_write(spark.createDataFrame([(1,)], "k long"), root)
    S.snapshot_create_branch(root, "staging")
    S.snapshot_write(
        spark.createDataFrame([(2,)], "k long"), root, branch="staging"
    )
    S.snapshot_publish(root, "staging")
    assert _rows(S.snapshot_read(spark, root)) == {(2,)}
    S.snapshot_write(spark.createDataFrame([(3,)], "k long"), root)
    with pytest.raises(S.SnapshotConflict, match="fast-forward"):
        S.snapshot_publish(root, "staging")
    # mainline is untouched by the refused retry
    assert _rows(S.snapshot_read(spark, root)) == {(3,)}


def test_recreated_branch_does_not_adopt_abandoned_staged_commits(
    spark, root
):
    """Deleting a branch and recreating the same name at the same base
    must start EMPTY — the abandoned run's staged commits stay
    unreachable except by explicit version."""
    S.snapshot_write(spark.createDataFrame([(1,)], "k long"), root)
    S.snapshot_create_branch(root, "staging", version=1)
    S.snapshot_write(
        spark.createDataFrame([(99,)], "k long"), root, branch="staging"
    )
    S.snapshot_delete_ref(root, "staging")
    S.snapshot_create_branch(root, "staging", version=1)
    assert _rows(S.snapshot_read(spark, root, ref="staging")) == {(1,)}
    with pytest.raises(ValueError, match="no staged commits"):
        S.snapshot_publish(root, "staging")


def test_maintain_grouped_sums_null_group(spark):
    """groupBy treats NULL as a real group; the maintenance join must
    merge it too (null-safe key equality), not leave the stale base
    row beside an unmerged delta row."""
    from dex_data_ingestor_spark.operators import matview as MV

    v0 = spark.createDataFrame(
        [(None, 1, 10.0), (None, 2, 1.5), ("a", 3, 2.0)],
        "g string, k long, v double",
    )
    base = MV.grouped_sums(v0, ["g"], ["v"])
    removed = spark.createDataFrame(
        [(None, 2, 1.5)], "g string, k long, v double"
    )
    added = spark.createDataFrame(
        [(None, 4, 7.25)], "g string, k long, v double"
    )
    v1 = spark.createDataFrame(
        [(None, 1, 10.0), (None, 4, 7.25), ("a", 3, 2.0)],
        "g string, k long, v double",
    )
    maintained = MV.maintain_grouped_sums(
        base, removed, added, ["g"], ["v"]
    )
    assert _rows(maintained) == _rows(MV.grouped_sums(v1, ["g"], ["v"]))
    # exactly ONE row for the NULL group
    assert len([r for r in maintained.collect() if r.g is None]) == 1


def test_refresh_agg_records_resolved_to_version(spark, root, tmp_path):
    """to_version=None must resolve 'latest' once up front and RECORD
    it, so the next refresh knows where to resume."""
    from dex_data_ingestor_spark.operators import matview as MV

    agg_root = str(tmp_path / "agg")
    fact = spark.createDataFrame(
        [(1, "x", 5.0)], "k long, g string, v double"
    )
    S.snapshot_write(fact, root)
    S.snapshot_write(MV.grouped_sums(fact, ["g"], ["v"]), agg_root)
    S.snapshot_merge(
        spark, root,
        spark.createDataFrame(
            [(2, "y", 3.0)], "k long, g string, v double"
        ),
        keys=["k"],
    )
    m = MV.snapshot_refresh_agg(
        spark, root, agg_root, from_version=1,
        group_cols=["g"], measures=["v"],
    )
    assert m["fact_to_version"] == 2


def test_rollback_with_staged_branch_does_not_adopt_branch_constraints(
    spark, root
):
    """ADVICE r8 (medium): _commit's constraint carry-forward must read
    the MAINLINE-resolved prior, not the raw latest manifest — a
    rollback (or commit_existing) on mainline while a branch holds
    staged constraint changes must NOT record, and thereafter enforce,
    the branch's unpublished constraints on mainline."""
    S.snapshot_write(spark.createDataFrame([(1,)], "v long"), root)
    S.snapshot_write(spark.createDataFrame([(2,)], "v long"), root)
    S.snapshot_create_branch(root, "staging")
    S.snapshot_write(
        spark.createDataFrame([(5,)], "v long"), root,
        branch="staging", constraints={"v_pos": "v > 0"},
    )
    m = S.snapshot_rollback(root, to_version=1)
    # the rollback commit carries MAINLINE's constraint state (none),
    # not the branch's staged set
    assert m.get("constraints", {}) == {}
    # and mainline writes stay ungoverned by the unpublished constraint
    m2 = S.snapshot_write(spark.createDataFrame([(-1,)], "v long"), root)
    assert m2["constraints"] == {}
    # the branch chain itself still carries its staged set
    with pytest.raises(S.SnapshotConflict):
        # mainline advanced; staging can no longer publish, but its
        # head state is intact for auditing
        S.snapshot_publish(root, "staging")


def test_publish_rejects_interleaved_mainline_commit(spark, root):
    """ADVICE r8 (low): base v1, staged v2, mainline v3, staged v4 —
    the head is newer than mainline, so the pure version guard passes,
    but publishing would silently overwrite the interleaved mainline
    write. Must raise SnapshotConflict (Iceberg-style WAP publish)."""
    S.snapshot_write(spark.createDataFrame([(1,)], "k long"), root)
    S.snapshot_create_branch(root, "staging")
    S.snapshot_write(
        spark.createDataFrame([(2,)], "k long"), root, branch="staging"
    )
    S.snapshot_write(spark.createDataFrame([(3,)], "k long"), root)  # v3
    S.snapshot_write(
        spark.createDataFrame([(4,)], "k long"), root, branch="staging"
    )
    with pytest.raises(S.SnapshotConflict, match="overwrite mainline"):
        S.snapshot_publish(root, "staging")
    # mainline untouched by the refusal
    assert _rows(S.snapshot_read(spark, root)) == {(3,)}


def test_publish_then_restage_then_publish_again_is_allowed(spark, root):
    """The interleaved-commit guard must not break the documented
    keep-staging flow: publish, stage more on the same branch, publish
    again — the intermediate mainline commit IS this branch's own
    publish, not an interloper."""
    S.snapshot_write(spark.createDataFrame([(1,)], "k long"), root)
    S.snapshot_create_branch(root, "staging")
    S.snapshot_write(
        spark.createDataFrame([(2,)], "k long"), root, branch="staging"
    )
    S.snapshot_publish(root, "staging")
    S.snapshot_write(
        spark.createDataFrame([(5,)], "k long"), root, branch="staging"
    )
    S.snapshot_publish(root, "staging")
    assert _rows(S.snapshot_read(spark, root)) == {(5,)}


def test_debounce_rejects_reserved_prev_ts_column(spark):
    """ADVICE r8 (low): debounce stages an internal _prev_ts column; an
    input already carrying one must be rejected, not silently
    clobbered and dropped."""
    from pyspark.sql import functions as F

    from dex_data_ingestor_spark.operators.timeseries import debounce

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "x")],
        "user_id long, ts string, _prev_ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError, match="_prev_ts"):
        debounce(df, ["user_id"], "ts")


def test_refresh_agg_rejects_discontinuous_from_version(spark, root, tmp_path):
    """Refresh continuity: the aggregate's manifest records the fact
    version it is maintained through; resuming from any other version
    double-applies (re-run after success) or skips deltas into an
    aggregate that still claims recompute-equality. The mismatch is
    now fatal by name; the correct resume still works."""
    import pytest

    from dex_data_ingestor_spark.operators import matview as MV

    agg_root = str(tmp_path / "agg")
    fact = spark.createDataFrame(
        [(1, "x", 5.0), (2, "y", 2.0)], "k long, g string, v double"
    )
    S.snapshot_write(fact, root)
    S.snapshot_write(MV.grouped_sums(fact, ["g"], ["v"]), agg_root)

    S.snapshot_merge(
        spark, root,
        spark.createDataFrame([(1, "x", 7.0)], "k long, g string, v double"),
        keys=["k"],
    )
    MV.snapshot_refresh_agg(
        spark, root, agg_root, from_version=1,
        group_cols=["g"], measures=["v"],
    )
    # replaying the SAME refresh (stale caller state / re-run after
    # success) would double-apply v1->v2's deltas — fatal
    with pytest.raises(ValueError, match="maintained\nthrough|maintained through"):
        MV.snapshot_refresh_agg(
            spark, root, agg_root, from_version=1,
            group_cols=["g"], measures=["v"],
        )
    # the recorded resume point works and stays exact
    S.snapshot_merge(
        spark, root,
        spark.createDataFrame([(3, "z", 1.0)], "k long, g string, v double"),
        keys=["k"],
    )
    MV.snapshot_refresh_agg(
        spark, root, agg_root, from_version=2,
        group_cols=["g"], measures=["v"],
    )
    want = MV.grouped_sums(S.snapshot_read(spark, root), ["g"], ["v"])
    assert _rows(S.snapshot_read(spark, agg_root)) == _rows(want)


def test_read_modify_write_base_guard_prevents_lost_update(spark, root):
    """The lost-update race: two writers both read v1 as their merge
    base; A commits v2, then B's commit — derived from v1 — must raise
    SnapshotConflict, NOT silently claim v3 (which would erase every
    row A merged). Simulated by handing snapshot_write B's stale
    expected_base after A's commit landed."""
    base_df = spark.createDataFrame([(1, 10.0)], "k long, v double")
    S.snapshot_write(base_df, root)  # v1

    # writer A lands v2
    S.snapshot_merge(
        spark, root,
        spark.createDataFrame([(2, 20.0)], "k long, v double"),
        keys=["k"],
    )
    # writer B derived its output from v1 — stale base must conflict
    stale_output = spark.createDataFrame(
        [(1, 10.0), (3, 30.0)], "k long, v double"
    )
    with pytest.raises(S.SnapshotConflict, match="base was v1"):
        S.snapshot_write(
            stale_output, root, op="merge", expected_base=1
        )
    # v2's merged row is intact (nothing was lost)
    assert (2, 20.0) in _rows(S.snapshot_read(spark, root))

    # retry from a FRESH base succeeds
    S.snapshot_merge(
        spark, root,
        spark.createDataFrame([(3, 30.0)], "k long, v double"),
        keys=["k"],
    )
    assert _rows(S.snapshot_read(spark, root)) == {
        (1, 10.0), (2, 20.0), (3, 30.0),
    }


def test_base_guard_ignores_interleaved_branch_commits(spark, root):
    """expected_base compares against the committing LINEAGE's head:
    a branch-STAGED commit claiming the next shared version number
    must not make a mainline read-modify-write spuriously conflict
    (version numbers are shared across lineages; bases are not)."""
    S.snapshot_write(
        spark.createDataFrame([(1, 10.0)], "k long, v double"), root
    )  # v1 mainline
    S.snapshot_create_branch(root, "audit")
    S.snapshot_write(
        spark.createDataFrame([(9, 90.0)], "k long, v double"),
        root,
        branch="audit",
    )  # v2 staged
    # mainline merge read v1 as its base; the staged v2 is not in its
    # lineage, so the commit goes through (as v3)
    m = S.snapshot_merge(
        spark, root,
        spark.createDataFrame([(2, 20.0)], "k long, v double"),
        keys=["k"],
    )
    assert m["version"] == 3
    assert (9, 90.0) not in _rows(S.snapshot_read(spark, root))


def test_write_with_stats_handles_date_columns_and_branch(spark, root):
    """Footer min/max for DATE columns used to crash json.dump at
    commit time (datetime.date is not JSON-serializable), killing
    exactly the pruning-index writes a date-partitioned table wants;
    bounds are now ISO strings (order-preserving), and the stats
    writer takes the same branch staging the plain writer has."""
    import datetime as dtm

    df = spark.createDataFrame(
        [(1, dtm.date(2024, 1, 1)), (2, dtm.date(2024, 6, 1))],
        "k long, d date",
    ).repartitionByRange(2, "d")
    m = S.snapshot_write_with_stats(df, root, stats_cols=["d"])
    assert m["version"] == 1
    for f in m["files"]:
        for lo, hi in f["stats"].values():
            assert isinstance(lo, str) and isinstance(hi, str)
    # pruning works with ISO-string bounds
    pruned = S.snapshot_scan_pruned(
        spark, root, "d", "2024-05-01", "2024-12-31"
    )
    assert {r.k for r in pruned.collect()} == {2}

    # branch staging through the stats writer: invisible to mainline
    S.snapshot_create_branch(root, "wap")
    S.snapshot_write_with_stats(
        spark.createDataFrame([(3, dtm.date(2025, 1, 1))], "k long, d date"),
        root,
        stats_cols=["d"],
        branch="wap",
    )
    assert {r.k for r in S.snapshot_read(spark, root).collect()} == {1, 2}
    assert {
        r.k for r in S.snapshot_read(spark, root, ref="wap").collect()
    } == {3}


def test_stream_merge_base_is_mainline_not_staged_branch(
    spark, tmp_path
):
    """The stream sink's merge base is the MAINLINE head: with a
    branch-staged commit sitting at the raw log tail, merging into the
    tail would publish unaudited branch data as mainline without
    snapshot_publish. The staged rows must stay invisible to mainline
    after the stream commit, and the branch head must be untouched."""
    from dex_data_ingestor_spark.streaming.jobs import (
        foreach_batch_merge_snapshots,
    )

    root = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.createDataFrame([(1, 10.0)], "event_id long, value double"),
        root,
    )  # v1 mainline
    S.snapshot_create_branch(root, "audit")
    S.snapshot_write(
        spark.createDataFrame([(99, 99.0)], "event_id long, value double"),
        root,
        branch="audit",
    )  # v2 staged at the log tail

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(2, 20.0)], "event_id long, value double"
    ).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("event_id long, value double")
        .parquet(src)
    )
    q = foreach_batch_merge_snapshots(
        stream, str(tmp_path / "ckpt"), root, keys=["event_id"],
        spark=spark,
    )
    q.awaitTermination(timeout=120)

    main_rows = _rows(S.snapshot_read(spark, root))
    assert main_rows == {(1, 10.0), (2, 20.0)}  # no staged leak
    assert _rows(S.snapshot_read(spark, root, ref="audit")) == {
        (99, 99.0)
    }


def test_offset_suffixed_string_bounds_canonicalize(spark, root):
    """ADVICE r12 (medium): offset-suffixed ISO string bounds
    ('...+05:00', '...Z') passed the _TS_STAT_RE/_ISO_T_RE prefix
    matches and compared VERBATIM against stored UTC-naive renderings
    — the suffix sorts after digits and a non-UTC offset is hours
    wrong, so a lo bound could exceed a file's true max and silently
    prune matching rows. String bounds now parse via fromisoformat and
    canonicalize aware -> UTC-naive like datetime bounds do."""
    import datetime as dt

    from pyspark.sql import functions as F

    df = (
        spark.range(0, 4_000)
        .select(
            F.col("id").alias("k"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
                + F.make_interval(hours=F.col("id") % 96)
            ).alias("ts"),
        )
        .repartitionByRange(8, "ts")
    )
    S.snapshot_write_with_stats(df, root, stats_cols=["ts"])
    naive = (dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 2, 6))
    expect = sorted(
        S.snapshot_scan_pruned(spark, root, "ts", *naive).inputFiles()
    )
    assert 0 < len(expect) < 8
    # same instants spelled three aware ways: UTC suffix, Z, +05:00
    for lo, hi in [
        ("2024-01-02 00:00:00+00:00", "2024-01-02 06:00:00+00:00"),
        ("2024-01-02T00:00:00Z", "2024-01-02T06:00:00Z"),
        ("2024-01-02 05:00:00+05:00", "2024-01-02 11:00:00+05:00"),
    ]:
        got = sorted(
            S.snapshot_scan_pruned(spark, root, "ts", lo, hi).inputFiles()
        )
        assert got == expect, (lo, hi)
    # trailing garbage after a valid prefix must reject loudly, not
    # compare verbatim
    with pytest.raises(TypeError, match="unparseable timestamp"):
        S.snapshot_scan_pruned(
            spark, root, "ts",
            "2024-01-02 00:00:00junk", "2024-01-02 06:00:00junk",
        )


def test_legacy_aware_stored_stats_not_mispruned(spark, root):
    """ADVICE r12 (low): manifests written BEFORE the aware->UTC-naive
    write-side canonicalization store timestamp stats with a '+00:00'
    suffix; an inclusive boundary match (stored min '...06:00:00+00:00'
    vs hi bound '...06:00:00', same instant) was wrongly pruned.
    Stored timestamp-form values are now canonicalized at compare
    time. Simulated by rewriting a fresh manifest to the legacy
    rendering (aware suffix + no stats_forms tag)."""
    import datetime as dt
    import json

    from pyspark.sql import functions as F

    df = (
        spark.range(0, 4_000)
        .select(
            F.col("id").alias("k"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
                + F.make_interval(hours=F.col("id") % 96)
            ).alias("ts"),
        )
        .repartitionByRange(8, "ts")
    )
    m = S.snapshot_write_with_stats(df, root, stats_cols=["ts"])
    naive = (dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 2, 6))
    expect = sorted(
        S.snapshot_scan_pruned(spark, root, "ts", *naive).inputFiles()
    )
    assert 0 < len(expect) < 8
    # rewrite the manifest to the pre-r12 legacy form
    path = S._manifest_file(root, m["version"])
    with open(path) as fh:
        manifest = json.load(fh)
    manifest.pop("stats_forms", None)
    for f in manifest["files"]:
        if "ts" in f["stats"]:
            f["stats"]["ts"] = [v + "+00:00" for v in f["stats"]["ts"]]
    with open(path, "w") as fh:
        json.dump(manifest, fh)
    got = sorted(
        S.snapshot_scan_pruned(spark, root, "ts", *naive).inputFiles()
    )
    assert got == expect


def test_manifest_publish_falls_back_without_hard_links(
    spark, root, monkeypatch
):
    """ADVICE r12 (low): the atomic os.link publish made every commit
    depend on hard-link support; on filesystems without it (FUSE/CIFS/
    object gateways) EPERM/ENOTSUP made the table unwritable. Non-
    FileExistsError OSErrors now fall back to an O_EXCL claim +
    rename, preserving one-winner-per-version."""
    import os as _os

    real_link = _os.link

    def no_link(src, dst, *a, **kw):
        raise PermissionError("hard links not supported here")

    monkeypatch.setattr(_os, "link", no_link)
    v1 = spark.createDataFrame([(1, 10.0)], "k long, v double")
    m1 = S.snapshot_write(v1, root)
    assert m1["version"] == 1
    v2 = spark.createDataFrame([(2, 20.0)], "k long, v double")
    m2 = S.snapshot_write(v2, root)
    assert m2["version"] == 2
    assert _rows(S.snapshot_read(spark, root)) == {(2, 20.0)}
    assert _rows(S.snapshot_read(spark, root, version=1)) == {(1, 10.0)}
    # manifest on disk is complete, parseable JSON (not the 0-byte
    # claim file)
    import json

    with open(S._manifest_file(root, 2)) as fh:
        assert json.load(fh)["version"] == 2
    # one winner per version number: while an in-flight 0-byte claim
    # sits at v3, another committer computes v3 too (last READABLE+1)
    # and gets SnapshotConflict from the O_EXCL claim — it must NOT
    # skip to v4 over the in-flight commit (lost update)
    target = S._manifest_file(root, 3)
    _os.close(_os.open(target, _os.O_WRONLY | _os.O_CREAT | _os.O_EXCL))
    v3 = spark.createDataFrame([(3, 30.0)], "k long, v double")
    with pytest.raises(S.SnapshotConflict):
        S.snapshot_write(v3, root)
    # readers inside the claim window walk back to the last readable
    # version instead of crashing on the 0-byte file
    assert _rows(S.snapshot_read(spark, root)) == {(2, 20.0)}
    assert [m["version"] for m in S.snapshot_versions(root)] == [1, 2]
    monkeypatch.setattr(_os, "link", real_link)
    # once the orphan claim is cleared, writes proceed at v3
    _os.unlink(target)
    m3 = S.snapshot_write(v3, root)
    assert m3["version"] == 3


@pytest.mark.parametrize("link_works", [True, False])
def test_concurrent_committers_race_one_winner_per_version(
    spark, root, monkeypatch, tmp_path, link_works
):
    """Multithreaded commit race over BOTH publish paths (os.link and
    the link-less O_EXCL-claim fallback — ADVICE r12): 8 threads x 5
    commit attempts each against one table, retrying version conflicts
    from a fresh read. Invariants:

    - every version number 1..N is claimed by exactly ONE winner (no
      duplicate, no gap once the dust settles);
    - a concurrent READER polling latest during the storm never
      crashes and only ever sees monotonically non-decreasing
      versions (the atomic-visibility contract, degraded to
      walk-past-claims on the fallback path);
    - the final log parses completely (no partial manifest survives).
    """
    import json
    import os as _os
    import threading

    if not link_works:
        def no_link(src, dst, *a, **kw):
            raise PermissionError("no hard links on this fs")

        monkeypatch.setattr(_os, "link", no_link)

    # pre-write one data dir per thread (spark is not thread-safe to
    # hammer here and the race under test is the LOG, not the data)
    dirs = []
    for i in range(8):
        d = str(tmp_path / f"data{i}")
        spark.createDataFrame(
            [(i, float(i))], "k long, v double"
        ).write.parquet(d)
        dirs.append(d)
    S.snapshot_write(
        spark.createDataFrame([(0, 0.0)], "k long, v double"), root
    )

    stop = threading.Event()
    seen_versions: list[int] = []
    reader_errs: list[BaseException] = []

    def reader():
        last = 0
        while not stop.is_set():
            try:
                m = S._resolve(root)
            except BaseException as e:  # noqa: BLE001
                reader_errs.append(e)
                return
            v = m["version"]
            if v < last:
                reader_errs.append(
                    AssertionError(f"version went backwards {last}->{v}")
                )
                return
            last = v
            seen_versions.append(v)

    committed: list[int] = []
    lock = threading.Lock()
    errs: list[BaseException] = []

    def committer(i: int):
        done = 0
        while done < 5:
            try:
                m = S.snapshot_commit_existing(
                    root, dirs[i], op=f"race{i}"
                )
                with lock:
                    committed.append(m["version"])
                done += 1
            except S.SnapshotConflict:
                continue  # lost the claim: retry from a fresh read
            except BaseException as e:  # noqa: BLE001
                errs.append(e)
                return

    rt = threading.Thread(target=reader)
    rt.start()
    threads = [
        threading.Thread(target=committer, args=(i,)) for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    rt.join()

    assert not errs, errs[:3]
    assert not reader_errs, reader_errs[:3]
    # exactly one winner per number, contiguous through 41 (1 seed +
    # 8 threads x 5)
    assert sorted(committed) == list(range(2, 42)), sorted(committed)
    names = S._manifest_names(root)
    assert names == [f"{v:08d}.json" for v in range(1, 42)]
    for n in names:
        with open(os.path.join(S._log_path(root), n)) as fh:
            json.load(fh)  # every surviving manifest is complete
    assert seen_versions, "reader never observed a version"


def test_null_count_stats_prune_all_null_and_no_null_files(spark, root):
    """Null-count data skipping (the Delta/Iceberg nullCount
    dimension): per-file null counts recorded at write time let
    (a) IS NOT NULL scans skip ALL-NULL files, (b) IS NULL scans skip
    no-null files, and (c) RANGE scans skip all-null files — which
    min/max alone can never do, because parquet stats exclude nulls
    and an all-null file simply has no range stats (it was
    conservatively read before this)."""
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 4_000)
        .select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 2_000, F.col("id"))
            .otherwise(F.lit(None))
            .alias("v"),
        )
        .repartitionByRange(8, "k")
    )
    m = S.snapshot_write_with_stats(df, root, stats_cols=["k", "v"])
    n_files = len(m["files"])
    assert n_files == 8

    nn = S.snapshot_scan_null_pruned(spark, root, "v", non_null=True)
    assert len(nn.inputFiles()) < n_files
    assert nn.filter(F.col("v").isNotNull()).count() == 2_000
    # superset guarantee: nothing non-null lives outside the kept set
    assert (
        S.snapshot_read(spark, root).filter(F.col("v").isNotNull()).count()
        == 2_000
    )

    isnull = S.snapshot_scan_null_pruned(spark, root, "v", non_null=False)
    assert len(isnull.inputFiles()) < n_files
    assert isnull.filter(F.col("v").isNull()).count() == 2_000

    # range scan on v skips the all-null files too (they cannot hold
    # any value in the range)
    rng = S.snapshot_scan_pruned(spark, root, "v", 0, 3_999)
    assert len(rng.inputFiles()) < n_files
    assert rng.filter(F.col("v").between(0, 3_999)).count() == 2_000

    # legacy manifest (no nulls/rows recorded): conservative — every
    # file is kept on all three paths
    import json

    path = S._manifest_file(root, m["version"])
    with open(path) as fh:
        manifest = json.load(fh)
    for f in manifest["files"]:
        f.pop("nulls", None)
        f.pop("rows", None)
    with open(path, "w") as fh:
        json.dump(manifest, fh)
    assert len(
        S.snapshot_scan_null_pruned(spark, root, "v").inputFiles()
    ) == n_files
    assert len(
        S.snapshot_scan_null_pruned(
            spark, root, "v", non_null=False
        ).inputFiles()
    ) == n_files


def test_file_stats_absent_column_records_all_null(spark, tmp_path):
    """Schema evolution: a file written BEFORE a column existed reads
    back as all-NULL for it, and the stats writer must record exactly
    that (nulls[c] == rows) so IS NOT NULL scans can skip the file —
    absent-column and all-null are physically the same read."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "old")
    spark.range(0, 100).select(F.col("id").alias("k")).coalesce(
        1
    ).write.parquet(d)
    import os as _os

    fname = next(
        n for n in _os.listdir(d) if n.endswith(".parquet")
    )
    st = S._one_file_stats(_os.path.join(d, fname), ["k", "later_col"])
    assert st["rows"] == 100
    assert st["nulls"]["later_col"] == 100
    assert st["nulls"]["k"] == 0
    assert "later_col" not in st["stats"]
    assert st["stats"]["k"] == [0, 99]


def test_multi_column_pruning_multiplies_zorder_selectivity(spark, root):
    """The conjunctive scan the Z-order layout exists for: on a 64x64
    grid z-ordered into 16 files, a BOX filter (a in [0,7] AND b in
    [0,7]) through snapshot_scan_pruned_multi keeps strictly fewer
    files than either single-column prune (the hypercube property:
    conjunctive bounds multiply selectivities), returns exactly the
    box's rows, and the single-column scan is now literally the
    multi scan with one bound (shared predicate core)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    ).repartition(8)
    S.snapshot_write_with_stats(df, root, stats_cols=["a", "b"])
    S.snapshot_compact(
        spark, root, target_files=16, zorder_by=["a", "b"], zorder_bits=6
    )
    one_a = len(S.snapshot_scan_pruned(spark, root, "a", 0, 7).inputFiles())
    one_b = len(S.snapshot_scan_pruned(spark, root, "b", 0, 7).inputFiles())
    box = S.snapshot_scan_pruned_multi(
        spark, root, {"a": (0, 7), "b": (0, 7)}
    )
    n_box = len(box.inputFiles())
    assert n_box < min(one_a, one_b), (n_box, one_a, one_b)
    got = _rows(
        box.filter(F.col("a").between(0, 7) & F.col("b").between(0, 7))
    )
    assert len(got) == 64
    want = _rows(
        S.snapshot_read(spark, root).filter(
            F.col("a").between(0, 7) & F.col("b").between(0, 7)
        )
    )
    assert sorted(got) == sorted(want)
    with pytest.raises(ValueError, match="at least one column"):
        S.snapshot_scan_pruned_multi(spark, root, {})


def test_timestamp_bound_canonicalization_property():
    """Property pin for the r13 bound canonicalization: for ANY
    instant and ANY offset spelling — naive, UTC-aware, arbitrary
    fixed offset; 'T' or space separator; with/without microseconds —
    the normalized query bound equals _stat_bound of the UTC-naive
    datetime, so every spelling of one instant compares identically
    against stored stats. And _stored_ts maps any legacy aware
    rendering of a stored stat to the same canonical form (idempotent
    on already-canonical values)."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    base = st.datetimes(
        min_value=dt.datetime(1971, 1, 1),
        max_value=dt.datetime(2199, 12, 31),
    )
    offsets = st.integers(min_value=-14 * 60, max_value=14 * 60)
    micros = st.booleans()

    @settings(max_examples=300, deadline=None)
    @given(base, offsets, micros, st.booleans(), st.booleans())
    def check(naive_utc, off_min, keep_us, use_t, lo):
        if not keep_us:
            naive_utc = naive_utc.replace(microsecond=0)
        want = S._stat_bound(naive_utc, lo=lo)
        tz = dt.timezone(dt.timedelta(minutes=off_min))
        aware = naive_utc.replace(tzinfo=dt.timezone.utc).astimezone(tz)
        spellings = [
            naive_utc.isoformat(sep="T" if use_t else " "),
            aware.isoformat(sep="T" if use_t else " "),
        ]
        if off_min == 0:
            spellings.append(
                naive_utc.isoformat(sep="T" if use_t else " ") + "+00:00"
            )
        sample = "2000-01-01 00:00:00"  # timestamp-form stored stat
        for s in spellings:
            got = S._query_bound(s, lo=lo, sample=sample, form="timestamp")
            assert got == want, (s, got, want)
        # datetime bounds (naive and aware) land on the same rendering
        assert S._query_bound(
            naive_utc, lo=lo, sample=sample, form="timestamp"
        ) == want
        assert S._query_bound(
            aware, lo=lo, sample=sample, form="timestamp"
        ) == want
        # stored-side legacy canonicalization agrees and is idempotent
        assert S._stored_ts(aware.isoformat(sep=" ")) == want
        assert S._stored_ts(want) == want

    check()

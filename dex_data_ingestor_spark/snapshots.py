"""Versioned snapshot tables: a minimal commit-log table format with
time travel, versioned MERGE, and copy-free rollback.

The reference's warehouse writes are destructive upserts with no
history (`INSERT ... ON DUPLICATE KEY UPDATE`, reference
src/ingestion/tasks/bifrost/Bifrost.py:116-124 — a bad batch is
unrecoverable). The production answer is a transactional table format
(Delta/Iceberg); delta-spark is environment-gated here (NOTES.md
records the failed install), so this module implements the same
commit-log idea self-contained:

- data for each version lives in an immutable directory
  ``<root>/data/<uuid>/`` written once by Spark executors;
- a commit is ONE atomic manifest file ``<root>/_log/<v>.json``
  (``O_CREAT|O_EXCL`` — concurrent committers race on the version
  number and exactly one wins; the loser retries on the next number);
- readers resolve a version (latest, explicit, or latest-at-
  timestamp) from the manifest log and read ONLY that version's data
  directory — uncommitted/orphaned data dirs are invisible;
- rollback commits a NEW manifest pointing at an OLD version's data
  directory — no data is copied or deleted, and history stays intact;
- named refs under ``<root>/_refs/``: immutable TAGS pin 'the state
  run X read' (vacuum-pinned past retention), and BRANCHES stage
  commits invisible to mainline until :func:`snapshot_publish`
  fast-forwards them — write-audit-publish without copying data.

Scale posture: the driver touches only the tiny JSON manifests; all
data moves through ``spark.read``/``df.write`` (distributed, columnar).
:func:`snapshot_write_with_stats` additionally records per-file
min/max ranges (from parquet footers) in the manifest, and
:func:`snapshot_scan_pruned` uses them for manifest-level data
skipping — the same idea Delta/Iceberg file skipping implements.
Works on any Hadoop-visible FS path for data; the manifest commit
uses POSIX ``O_EXCL``, so the log directory must be on a filesystem
with atomic create (local/NFS here; object stores need a
conditional-put variant).
"""

from __future__ import annotations

import contextlib
import datetime as dt
import decimal
import json
import math
import os
import re
import uuid
from collections.abc import Sequence

from pyspark.sql import (
    Column,
    DataFrame,
    SparkSession,
    functions as F,
)

LOG_DIR = "_log"
DATA_DIR = "data"
#: deletion-vector sidecars (merge-on-read DELETE): parquet dirs of
#: (file, pos) rows under root/_dv/<uuid>, referenced by manifests'
#: ``dv_dirs`` list. Deliberately OUTSIDE DATA_DIR so the vacuum
#: orphan scan for data dirs never touches them.
DV_DIR = "_dv"
REFS_DIR = "_refs"

#: Writer-transaction watermarks (the streaming sink's replay guard)
#: are dropped once this many versions pass without that writer
#: committing — Delta bounds the same state with a time-based txn
#: retention; version-based is equivalent here and needs no clock. A
#: writer idle for 10k versions that then replays is treated as new
#: (its merge is idempotent), while the map stays O(active writers).
TXN_RETENTION_VERSIONS = 10_000


def _has_fs_scheme(path: str) -> bool:
    """True for scheme-qualified (non-local) paths like hdfs:// or
    s3a:// — driver-side os.path checks do not apply to those."""
    return re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path) is not None


class SnapshotConflict(Exception):
    """Another committer won this version number; retry the commit."""


def _log_path(root: str) -> str:
    return os.path.join(root, LOG_DIR)


def _manifest_file(root: str, version: int) -> str:
    return os.path.join(_log_path(root), f"{version:08d}.json")


def _manifest_names(root: str) -> list[str]:
    """Committed manifest FILENAMES, ascending by version — no JSON
    parse; the commit path needs only names (next version, latest)."""
    log = _log_path(root)
    if not os.path.isdir(log):
        return []
    return sorted(n for n in os.listdir(log) if n.endswith(".json"))


def _read_manifest(root: str, name: str) -> dict:
    with open(os.path.join(_log_path(root), name)) as f:
        return json.load(f)


def _list_manifests(root: str) -> list[dict]:
    """All committed manifests, ascending by version (full parse — use
    only where the whole history is genuinely needed: versions listing,
    as_of resolution, vacuum).

    A TRAILING run of unreadable manifests is tolerated and excluded:
    on link-less filesystems the O_EXCL-claim fallback (see _commit)
    exposes a brief 0-byte window at the top of the log, and a reader
    landing inside it must see the previous version, not crash
    (ADVICE r12). Unreadable manifests that are NOT the newest files
    are real corruption and stay loud — silently skipping mid-history
    would mislead vacuum and as_of."""
    names = _manifest_names(root)
    parsed: list[dict | None] = []
    for n in names:
        try:
            parsed.append(_read_manifest(root, n))
        except (json.JSONDecodeError, ValueError):
            parsed.append(None)
    k = len(parsed)
    while k and parsed[k - 1] is None:
        k -= 1
    bad = [names[i] for i in range(k) if parsed[i] is None]
    if bad:
        raise ValueError(
            f"unreadable manifest(s) {bad} under {root} with newer "
            "readable commits present — corrupt log, not an in-flight "
            "claim"
        )
    return parsed[:k]  # type: ignore[return-value]


def _latest_manifest(root: str) -> dict | None:
    """Latest READABLE manifest with O(1) file reads in the common
    case — the commit and streaming paths call this per
    commit/micro-batch, so it must not scale with table history (a
    high-frequency merge table reaches thousands of versions;
    re-parsing the whole log per commit would be O(n^2) driver I/O
    over the table lifetime). Walks back past a trailing run of
    unreadable in-flight claim files (the link-less-filesystem
    fallback's 0-byte window — ADVICE r12); an unreadable manifest
    BELOW a readable one re-raises (corrupt log)."""
    names = _manifest_names(root)
    for i, n in enumerate(reversed(names)):
        try:
            return _read_manifest(root, n)
        except (json.JSONDecodeError, ValueError):
            if i + 1 < len(names):
                # peek one deeper: if it parses, n was in-flight
                continue
            raise
    return None


def snapshot_versions(root: str) -> list[dict]:
    """Commit history (oldest first): version, committed_at (UTC ISO),
    op, data_dir, and the writer-supplied extra metadata."""
    return _list_manifests(root)


def _resolve(
    root: str,
    version: int | None = None,
    as_of: dt.datetime | str | None = None,
    ref: str | None = None,
) -> dict:
    names = _manifest_names(root)
    if not names:
        raise FileNotFoundError(f"no committed snapshots under {root}")
    if sum(x is not None for x in (version, as_of, ref)) > 1:
        raise ValueError("pass at most one of version / as_of / ref")
    if ref is not None:
        r = _read_ref(root, ref)
        if r["type"] == "tag":
            return _resolve(root, version=r["version"])
        return _branch_head(root, ref, r)
    if version is not None:
        name = f"{version:08d}.json"
        if name not in names:
            raise KeyError(f"version {version} not committed under {root}")
        return _read_manifest(root, name)
    if as_of is None:
        # MAINLINE latest: walk back past branch (write-audit-publish
        # staging) commits — cost is O(trailing branch commits), which
        # a publish or mainline write resets to O(1). A trailing
        # unreadable file is an in-flight O_EXCL claim (link-less-FS
        # commit fallback, ADVICE r12): skip it; unreadable BELOW a
        # readable manifest is corruption and re-raises.
        tail = True
        for n in reversed(names):
            try:
                m = _read_manifest(root, n)
            except (json.JSONDecodeError, ValueError):
                if tail:
                    continue
                raise
            tail = False
            if "branch" not in m:
                return m
        raise KeyError(
            f"no mainline version under {root} (branch commits only)"
        )
    if isinstance(as_of, dt.datetime):
        # a NAIVE datetime is taken as UTC (the manifests' zone);
        # astimezone() on naive input would silently reinterpret it
        # in the box's LOCAL zone and time-travel to a wrong version
        if as_of.tzinfo is None:
            as_of = as_of.replace(tzinfo=dt.timezone.utc)
        as_of = as_of.astimezone(dt.timezone.utc).isoformat()
    eligible = [
        m
        for m in _list_manifests(root)
        if m["committed_at"] <= as_of and "branch" not in m
    ]
    if not eligible:
        raise KeyError(f"no snapshot committed at or before {as_of}")
    return eligible[-1]


def _commit(
    root: str,
    data_dir: str,
    op: str,
    extra: dict | None,
    expected_base: int | None = None,
) -> dict:
    """Atomically claim the next version number. O_CREAT|O_EXCL makes
    exactly one concurrent committer win each number.

    ``expected_base`` is the read-modify-write guard: the version the
    committing operation READ as its base (merge/delete/update/compact
    and the stream sink all derive their output from a specific
    lineage head). Without it, a committer that lost a race would
    silently claim base+2 instead — its output was derived from
    base, so every row the winning base+1 commit introduced VANISHES
    from latest (the classic lost update; the O_EXCL claim alone only
    catches the two writers computing the SAME number). The check
    compares against the committing lineage's CURRENT head right
    before claiming; a mismatch raises :class:`SnapshotConflict`, and
    two same-base racers are still serialized by the O_EXCL claim —
    the loser re-raises and retries from a fresh read."""
    os.makedirs(_log_path(root), exist_ok=True)
    latest = _latest_manifest(root)
    # version = last READABLE + 1, deliberately NOT newest-filename+1:
    # while a fallback claim at N is in flight (unreadable — the
    # link-less-FS 0-byte window, ADVICE r12), other committers must
    # compute N too and CONFLICT on the claim, exactly like the two
    # same-base racers the O_EXCL serialization exists for — skipping
    # to N+1 would let a read-modify-write derived from N-1 land over
    # the in-flight commit (the lost update). Corollary: a committer
    # that crashes inside the fallback window leaves a permanent
    # 0-byte claim that blocks writers with a loud SnapshotConflict
    # naming the version (readers walk past it) — delete the orphan
    # claim file to unblock; the pre-fallback behavior on such
    # filesystems was an unreadable TABLE, strictly worse.
    version = (latest["version"] + 1) if latest else 1
    extra = dict(extra or {})
    # Carried-forward state (constraints, txn watermarks) must come
    # from this commit's OWN lineage — the mainline latest for
    # mainline commits, the branch head for branch-staged ones — never
    # the raw latest manifest, which may belong to the OTHER lineage:
    # a rollback/commit_existing on mainline while a branch holds
    # staged constraint changes would otherwise record (and thereafter
    # enforce) the branch's unpublished constraints on mainline. The
    # raw latest IS the right prior whenever it belongs to the same
    # lineage (the common case), keeping this O(1) per commit on the
    # hot mainline/streaming path.
    prior = latest
    if latest is not None and (
        latest.get("branch"),
        latest.get("branch_id"),
    ) != (extra.get("branch"), extra.get("branch_id")):
        prior = _prior_manifest(root, extra.get("branch"))
    if expected_base is not None:
        head = prior["version"] if prior else 0
        if head != expected_base:
            raise SnapshotConflict(
                f"read-modify-write base was v{expected_base} but the "
                f"lineage head is now v{head} under {root}: a "
                "concurrent commit landed after the base was read — "
                "re-read the head and retry the operation"
            )
    # carry the per-writer transaction watermarks forward so the
    # streaming sink's replay guard survives interleaved non-stream
    # commits (compact/rollback/manual merge) and needs only the
    # LATEST manifest to decide — O(1) per micro-batch.
    txn = dict(prior.get("txn", {})) if prior else {}
    # LEGACY manifests (pre-dict-form) stored txn as {app: batch_id};
    # the read path tolerates both forms, and so must the carry — a
    # bare int would crash the retention filter below and brick every
    # later commit on the table (review r12). A legacy entry has no
    # recorded commit version, so it adopts THIS commit's version
    # (retention restarts; strictly conservative for a replay guard).
    txn = {
        app: (e if isinstance(e, dict) else {"b": e, "v": version})
        for app, e in txn.items()
    }
    # new entries arrive as {app: batch_id}; stored form is
    # {app: {"b": batch_id, "v": committing_version}} so stale
    # writers can be expired by version distance (see
    # TXN_RETENTION_VERSIONS) instead of growing the map forever.
    for app, b in extra.pop("txn", {}).items():
        txn[app] = {"b": b, "v": version}
    txn = {
        app: e
        for app, e in txn.items()
        if version - e["v"] <= TXN_RETENTION_VERSIONS
    }
    # table CHECK constraints persist across commits (Delta ADD
    # CONSTRAINT semantics): once recorded, every later version
    # carries — and is expected to have enforced — the same set,
    # unless a commit explicitly rewrites it.
    if "constraints" not in extra and prior and prior.get("constraints"):
        extra["constraints"] = prior["constraints"]
    manifest = {
        "version": version,
        "committed_at": dt.datetime.now(dt.timezone.utc).isoformat(),
        "op": op,
        "data_dir": data_dir,
        **({"txn": txn} if txn else {}),
        **extra,
    }
    # Publish atomically: write the FULL payload to a private temp
    # file first, then claim the version number with os.link — link
    # fails with FileExistsError exactly like O_CREAT|O_EXCL (one
    # winner per number), but the manifest becomes visible with its
    # complete contents in one step. The previous open-then-dump form
    # exposed a 0-byte manifest between the two calls: concurrent
    # readers crashed on JSONDecodeError instead of reading v-1, and a
    # writer killed mid-commit left a permanently unreadable table
    # (review r12).
    target = _manifest_file(root, version)
    tmp = f"{target}.tmp.{os.getpid()}.{id(manifest)}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, target)
    except FileExistsError as e:
        raise SnapshotConflict(
            f"version {version} was committed concurrently under {root}"
        ) from e
    except OSError:
        # hard links unsupported on this filesystem (EPERM/ENOTSUP on
        # some FUSE/CIFS/object-store gateways where the old O_EXCL
        # open worked — ADVICE r12): fall back to an O_EXCL claim of
        # the version number, then rename the fsynced temp over it.
        # One winner per number is preserved; the atomic-visibility
        # guarantee degrades to a brief 0-byte window between the two
        # calls — only on link-less filesystems, where POSIX offers
        # nothing better without a lock protocol.
        try:
            os.close(os.open(
                target, os.O_WRONLY | os.O_CREAT | os.O_EXCL
            ))
        except FileExistsError as e:
            raise SnapshotConflict(
                f"version {version} was committed concurrently "
                f"under {root}"
            ) from e
        os.rename(tmp, target)
        return manifest
    finally:
        # after the fallback's rename the temp no longer exists
        with contextlib.suppress(FileNotFoundError):
            os.unlink(tmp)
    return manifest


def _prior_manifest(root: str, branch: str | None = None) -> dict | None:
    """The manifest whose PERSISTED STATE (constraints) a new commit
    inherits: the branch head for branch-staged writes, the MAINLINE
    latest otherwise — never the raw latest manifest, which may be an
    unpublished branch commit whose staged constraint changes must
    stay invisible to mainline until publish."""
    try:
        if branch is not None:
            return _branch_head(root, branch)
        return _resolve(root)
    except (FileNotFoundError, KeyError):
        return None


def _effective_constraints(
    root: str,
    constraints: dict[str, str] | None,
    drop_constraints: Sequence[str] | None,
    extra: dict | None,
    branch: str | None = None,
) -> dict[str, str]:
    """The constraint set a commit must enforce and record: the
    table's persisted set (mainline's, or the branch head's for a
    branch-staged write — see :func:`_prior_manifest`), minus explicit
    drops, plus/overriding the caller's additions.
    ``extra['constraints']`` is rejected — it would record a set that
    was never enforced (or be silently clobbered by the persisted
    one); the typed parameters are the only path, so recorded ==
    enforced always holds."""
    if extra and "constraints" in extra:
        raise ValueError(
            "pass constraints/drop_constraints parameters, not "
            "extra['constraints'] — recorded constraints must be the "
            "enforced ones"
        )
    prior = _prior_manifest(root, branch)
    effective = dict((prior or {}).get("constraints") or {})
    for name in drop_constraints or []:
        effective.pop(name, None)
    effective.update(constraints or {})
    return effective


def snapshot_write(
    df: DataFrame,
    root: str,
    op: str = "write",
    extra: dict | None = None,
    constraints: dict[str, str] | None = None,
    drop_constraints: Sequence[str] | None = None,
    branch: str | None = None,
    expected_base: int | None = None,
) -> dict:
    """Write ``df`` as a NEW snapshot version and return its manifest.

    The data directory is written first (executors, parquet); the
    version exists only once the manifest commit succeeds — a job that
    dies mid-write leaves an orphan directory readers never see.
    Raises :class:`SnapshotConflict` if a concurrent committer claims
    the version number first (data stays; re-commit with
    :func:`snapshot_commit_existing` or rewrite).

    ``constraints`` (name -> boolean SQL expression) adds/overrides
    table CHECK constraints; ``drop_constraints`` removes persisted
    ones by name. The effective set is enforced on the WRITTEN FILES
    between write and commit (not on the input plan — a
    non-deterministic lineage could pass a pre-write check and then
    persist different rows; checking what actually landed closes that
    TOCTOU), raising :class:`ConstraintViolation` and leaving only an
    orphan dir vacuum reclaims. The set is recorded in the manifest,
    and every subsequent write/MERGE re-enforces it — constraints
    persist like Delta's, they are not a one-shot assertion.

    ``branch`` stages the commit on a named branch
    (:func:`snapshot_create_branch`): it claims a version number in
    the shared log but stays INVISIBLE to mainline reads until
    :func:`snapshot_publish` fast-forwards it — the write-audit-
    publish pattern (stage, validate, then expose atomically)."""
    effective = _effective_constraints(
        root, constraints, drop_constraints, extra, branch=branch
    )
    extra = _with_branch_extra(root, branch, extra)
    # ALWAYS recorded (even when empty) so _commit's carry-forward
    # cannot resurrect a dropped constraint
    extra["constraints"] = effective
    data_dir = _write_and_enforce(df, root, op, effective)
    return _commit(root, data_dir, op, extra, expected_base=expected_base)


def _with_branch_extra(
    root: str, branch: str | None, extra: dict | None
) -> dict:
    """Copy ``extra`` with the branch-staging fields attached (shared
    by both write entry points, so a stats-indexed write can stage on
    a branch exactly like a plain one)."""
    extra = dict(extra or {})
    if branch is not None:
        r = _read_ref(root, branch)
        if r["type"] != "branch":
            raise ValueError(f"ref {branch!r} is a tag, not a branch")
        extra["branch"] = branch
        # the ref's unique id travels with every staged commit, so a
        # deleted-then-recreated branch of the same name can never
        # resurrect an abandoned run's staged commits as its head
        if r.get("id") is not None:
            extra["branch_id"] = r["id"]
    return extra


def _write_and_enforce(
    df: DataFrame, root: str, op: str, effective: dict[str, str]
) -> str:
    """Write the data dir and re-enforce persisted constraints on the
    WRITTEN FILES (the TOCTOU-closing sequence both write entry points
    must share — see snapshot_write's docstring). Returns the dir."""
    data_dir = os.path.join(root, DATA_DIR, uuid.uuid4().hex)
    df.write.mode("error").parquet(data_dir)
    if effective and op != "compact":
        # compact rewrites content that already passed at its
        # original commit; re-reading it would double every
        # maintenance pass for nothing
        snapshot_check_constraints(
            df.sparkSession.read.parquet(data_dir), effective
        )
    return data_dir


class ConstraintViolation(Exception):
    """A commit-time CHECK constraint failed; nothing was committed."""


def snapshot_check_constraints(
    df: DataFrame, constraints: dict[str, str], sample: int = 5
) -> None:
    """Enforce named CHECK constraints (boolean SQL expressions over
    the rows — Delta's ``ADD CONSTRAINT`` semantics: NULL predicate
    counts as a VIOLATION, so a constraint can never pass by way of a
    NULL input) before a version commits. ONE distributed pass
    counts every constraint's violations simultaneously (conditional
    count aggregation — no per-constraint job), and the error carries
    per-constraint counts plus a row sample of the first offender for
    the post-mortem. Raises :class:`ConstraintViolation`; the caller
    commits nothing, so readers never observe a bad version — the
    versioned-table answer to the reference pipeline's
    write-then-audit ordering."""
    if not constraints:
        return
    aggs = [
        F.count(
            F.when(~F.coalesce(F.expr(expr), F.lit(False)), 1)
        ).alias(name)
        for name, expr in constraints.items()
    ]
    counts = df.agg(*aggs).head().asDict()
    bad = {k: v for k, v in counts.items() if v}
    if bad:
        first = next(iter(bad))
        rows = (
            df.filter(
                ~F.coalesce(F.expr(constraints[first]), F.lit(False))
            )
            .limit(sample)
            .collect()
        )
        raise ConstraintViolation(
            f"constraint violations {bad}; first offender rows for "
            f"{first!r} ({constraints[first]!r}): {rows}"
        )


def snapshot_commit_existing(
    root: str, data_dir: str, op: str, extra: dict | None = None
) -> dict:
    """Commit an already-written data directory as the next version
    (rollback, or retry after :class:`SnapshotConflict`). Refuses a
    LOCAL directory that no longer exists (e.g. a VACUUMED old
    version) — committing it would make the table's LATEST version
    unreadable. Scheme-qualified paths (hdfs://, s3a://) are not
    checkable driver-side without a Hadoop FS handle and pass
    through — the module docstring's remote-data layout keeps
    rollback/retry working there."""
    if not _has_fs_scheme(data_dir) and not os.path.isdir(data_dir):
        raise FileNotFoundError(
            f"cannot commit {data_dir}: directory missing (vacuumed or "
            "never written) — the commit would brick the latest version"
        )
    return _commit(root, data_dir, op, extra)


def _all_dirs(m: dict) -> list[str]:
    """A version's data directories: the primary ``data_dir`` plus
    any merge-on-read APPEND dirs (``extra_dirs`` — see
    :func:`snapshot_append`)."""
    return [m["data_dir"], *(m.get("extra_dirs") or [])]


def _entry_path(m: dict, f: dict) -> str:
    """Absolute path of one manifest file-stats entry: appended files
    carry their own ``dir``; original entries live in ``data_dir``."""
    return os.path.join(f.get("dir", m["data_dir"]), f["file"])


def _read_data(
    spark: SparkSession, m: dict, files: Sequence[str] | None = None
) -> DataFrame:
    """The ONE way to read a manifest's live rows: the parquet scan
    (whole data dir, or an explicit pruned file subset) minus the
    version's deletion vectors, when it has any. Every consumer of a
    version's content — snapshot_read, the DML bases, compact, the
    pruned scans, the streaming merge sink — must come through here,
    or merge-on-read deletes silently resurrect (the classic DV
    integration bug in real lakehouse formats).

    DV application is a LEFT ANTI join on (_metadata.file_name,
    _metadata.row_index) against the exploded (file, pos) sidecar —
    the DV side is |deleted| rows, so AQE broadcasts it in practice;
    versions without DVs pay nothing (plain scan, zero extra plan
    nodes)."""
    src = spark.read.parquet(*(files or _all_dirs(m)))
    dirs = m.get("dv_dirs") or []
    if not dirs:
        return src
    dv = spark.read.parquet(*dirs).select(
        F.col("file").alias("__dv_file"),
        F.col("pos").alias("__dv_pos"),
    )
    tagged = src.select(
        "*",
        F.col("_metadata.file_name").alias("__file"),
        F.col("_metadata.row_index").alias("__pos"),
    )
    return tagged.join(
        dv,
        (tagged["__file"] == dv["__dv_file"])
        & (tagged["__pos"] == dv["__dv_pos"]),
        "left_anti",
    ).drop("__file", "__pos")


def snapshot_read(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    as_of: dt.datetime | str | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Read a snapshot: mainline latest by default, or an explicit
    ``version``, or the latest mainline commit at-or-before ``as_of``
    (UTC), or a named ``ref`` (tag = its pinned version; branch = the
    branch head). Staged branch commits are invisible to every
    non-ref read until published. Merge-on-read deletion vectors
    (``snapshot_delete(mode='mor')``) are applied transparently."""
    return _read_data(spark, _resolve(root, version, as_of, ref))


def snapshot_merge(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    evolve_schema: bool = False,
    mode: str = "copy",
) -> dict:
    """MERGE ``updates`` into the latest snapshot and commit the result
    as a new version (read latest -> merge_upsert -> snapshot_write).

    ``mode='mor'`` (merge-on-read): matched live rows' positions land
    in a deletion-vector sidecar and the merge's OUTPUT rows for them
    (plus all unmatched-batch inserts) in an append dir — one commit
    at O(|batch| + |matched|) cost, no table rewrite (Delta's
    DV-backed MERGE shape; the upsert itself is still
    operators/merge.merge_upsert with its NULL-SAFE key contract).
    Incompatible with ``evolve_schema`` (widening rewrites; evolve in
    copy mode first); constraints enforce on the new images only.

    This is the versioned twin of the reference's destructive per-row
    upsert loop (Bifrost.py:116-124): same key semantics
    (operators/merge.py merge_upsert), but every pre-merge state stays
    readable and a bad batch rolls back with :func:`snapshot_rollback`.
    Copy-on-write at version granularity — the right trade for
    daily/hourly batch merges; per-file copy-on-write is what the real
    table formats add.

    Schema evolution (the Delta ``mergeSchema`` semantics): columns in
    ``updates`` that the table lacks are REJECTED by default —
    merge_upsert would otherwise silently drop them, the worst failure
    mode of an ingest pipeline whose producer added a field. With
    ``evolve_schema=True`` the table widens first (existing rows take
    NULL for the new columns, with the source's types), the evolved
    column list is recorded in the manifest, and every PRIOR version
    still reads with its own schema (each version owns its data dir —
    time travel across an evolution boundary needs no reconciliation).
    """
    from dex_data_ingestor_spark.operators.merge import merge_upsert

    base = _resolve(root)
    current = _read_data(spark, base)  # DV-aware base
    # case-INSENSITIVE name comparison: Spark resolves columns
    # case-insensitively by default, so treating a case-variant as
    # "new" would make withColumn silently REPLACE the existing
    # column with NULLs — the exact data loss evolution exists to
    # prevent
    existing_lc = {c.lower() for c in current.columns}
    new_cols = [
        c for c in updates.columns if c.lower() not in existing_lc
    ]
    if new_cols and not evolve_schema:
        raise ValueError(
            f"updates add columns {new_cols} the table lacks; pass "
            "evolve_schema=True to widen the table (merge would "
            "silently drop them otherwise)"
        )
    if new_cols:
        src_types = dict(updates.dtypes)
        for c in new_cols:
            current = current.withColumn(
                c, F.lit(None).cast(src_types[c])
            )
    extra = {"keys": list(keys)}
    if new_cols:
        extra["evolved_cols"] = new_cols
    if mode == "mor":
        if new_cols:
            raise ValueError(
                "evolve_schema requires mode='copy' (widening "
                "rewrites the table; evolve first, then merge "
                "merge-on-read)"
            )
        live = _tagged_live(spark, base).alias("__l")
        u = updates.select(*keys).alias("__u")
        on = None
        for k in keys:
            c = F.col(f"__l.{k}").eqNullSafe(F.col(f"__u.{k}"))
            on = c if on is None else (on & c)
        matched = live.join(u, on, "leftsemi")
        hits = matched.select(
            F.col("__file").alias("file"),
            F.col("__pos").cast("long").alias("pos"),
        )
        # merge_upsert over ONLY the matched rows: its output is
        # exactly the appended content — matched rows with their
        # post-merge values plus every unmatched-batch insert;
        # untouched rows stay live in the base files
        new_rows = merge_upsert(
            matched.drop("__file", "__pos"), updates, keys, update_cols
        )
        _require_same_schema(current, new_rows, "MERGE")
        return _commit_mor(
            spark, root, base, "merge", hits, new_rows, extra,
            count_key="n_matched",
        )
    if mode != "copy":
        raise ValueError(f"unknown merge mode {mode!r}")
    merged = merge_upsert(current, updates, keys, update_cols)
    return snapshot_write(
        merged, root, op="merge", extra=extra,
        expected_base=base["version"],
    )


def _require_same_schema(
    table_df: DataFrame, new_df: DataFrame, what: str
) -> None:
    """A merge-on-read commit's appended images must match the table
    column-for-column (names AND types): a widening expression would
    write a dir whose parquet schema diverges from the base dirs and
    corrupt later multi-dir reads. Copy-on-write modes may widen
    (they rewrite everything); MOR modes reject."""
    a = [
        (f.name.lower(), f.dataType.simpleString())
        for f in table_df.schema.fields
    ]
    b = [
        (f.name.lower(), f.dataType.simpleString())
        for f in new_df.schema.fields
    ]
    if a != b:
        raise ValueError(
            f"{what} changes the row schema under mode='mor' "
            f"(table {a} vs new rows {b}); use mode='copy' for "
            "type-changing operations"
        )


def _tagged_live(spark: SparkSession, base: dict) -> DataFrame:
    """The base version's LIVE rows with their (__file, __pos) scan
    identity — the merge-on-read DML working set (existing deletion
    vectors already subtracted, so a MOR op can never double-record
    an already-dead row)."""
    tagged = spark.read.parquet(*_all_dirs(base)).select(
        "*",
        F.col("_metadata.file_name").alias("__file"),
        F.col("_metadata.row_index").alias("__pos"),
    )
    prior = base.get("dv_dirs") or []
    if prior:
        dv0 = spark.read.parquet(*prior).select(
            F.col("file").alias("__dv_file"),
            F.col("pos").alias("__dv_pos"),
        )
        tagged = tagged.join(
            dv0,
            (tagged["__file"] == dv0["__dv_file"])
            & (tagged["__pos"] == dv0["__dv_pos"]),
            "left_anti",
        )
    return tagged


def _parquet_dir_rows(d: str) -> int:
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(d, n)).metadata.num_rows
        for n in os.listdir(d)
        if n.endswith(".parquet")
    )


def _extend_indexes(
    spark: SparkSession, base: dict, new_dir: str | None, extra: dict
) -> None:
    """Carry the base's data-descriptive payload into a merge-on-read
    commit's ``extra``, extending the per-file stats/bloom entries
    for ``new_dir`` when the base records those indexes (appended
    entries carry their dir) — pruned scans and point lookups stay
    exact across MOR commits. Base min/max stay SUPERSETS of the live
    rows (deletes only shrink), and the null-skip judgments survive
    deletes (removing rows can neither add nulls to a no-null file
    nor add values to an all-null one)."""
    for k in ("stats_cols", "stats_forms",
              "bloom_cols", "bloom_types", "bloom_conf"):
        if k in base:
            extra[k] = base[k]
    if base.get("stats_cols") and new_dir:
        new_files = _file_stats(spark, new_dir, base["stats_cols"])
        for f in new_files:
            f["dir"] = new_dir
        extra["files"] = list(base.get("files") or []) + new_files
    elif "files" in base:
        extra["files"] = base["files"]
    if base.get("bloom_cols") and new_dir:
        conf = base["bloom_conf"]
        new_blooms = _file_blooms(
            spark,
            new_dir,
            base["bloom_cols"],
            conf["num_bits"],
            conf["num_hashes"],
        )
        dup = set(new_blooms) & set(base.get("blooms") or {})
        if dup:  # task-uuid part names make this unreachable, but a
            # silent overwrite would break scan_point's exactness
            raise RuntimeError(f"filename collision: {dup}")
        extra["blooms"] = {**(base.get("blooms") or {}), **new_blooms}
    elif "blooms" in base:
        extra["blooms"] = base["blooms"]


def _commit_mor(
    spark: SparkSession,
    root: str,
    base: dict,
    op: str,
    hits: DataFrame,
    new_rows: DataFrame | None,
    extra: dict,
    count_key: str = "n_hits",
) -> dict:
    """Commit one merge-on-read DML version: ``hits`` — the matched
    live rows' (file, pos) — become a deletion-vector sidecar;
    ``new_rows`` (their replacement images plus any inserts; None for
    a pure delete) become an append dir with index extension. Both
    ride ONE atomic commit guarded by ``expected_base``; the hit
    count lands in ``extra[count_key]``. Returns the manifest.
    Persisted CHECK constraints enforce on the
    NEW rows only — surviving rows are a subset of rows that passed
    at their own commit."""
    import shutil

    extra = dict(extra)
    dv_dir = os.path.join(root, DV_DIR, uuid.uuid4().hex)
    hits.write.mode("error").parquet(dv_dir)
    n_hits = _parquet_dir_rows(dv_dir)
    prior_dv = base.get("dv_dirs") or []
    extra["dv_dirs"] = list(prior_dv) + ([dv_dir] if n_hits else [])
    if not n_hits:
        shutil.rmtree(dv_dir)
    new_dir = None
    if new_rows is not None:
        new_dir = os.path.join(root, DATA_DIR, uuid.uuid4().hex)
        new_rows.write.mode("error").parquet(new_dir)
        if not _parquet_dir_rows(new_dir):
            shutil.rmtree(new_dir)
            new_dir = None
        else:
            effective = _effective_constraints(root, None, None, None)
            if effective:
                try:
                    snapshot_check_constraints(
                        spark.read.parquet(new_dir), effective
                    )
                except Exception:
                    shutil.rmtree(new_dir)
                    if n_hits:
                        shutil.rmtree(dv_dir)
                    raise
            extra["extra_dirs"] = [
                *(base.get("extra_dirs") or []), new_dir
            ]
    if new_dir is None and "extra_dirs" in base:
        extra["extra_dirs"] = base["extra_dirs"]
    _extend_indexes(spark, base, new_dir, extra)
    extra[count_key] = n_hits
    return _commit(
        root,
        base["data_dir"],
        op=op,
        extra=extra,
        expected_base=base["version"],
    )


def snapshot_append(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    extra: dict | None = None,
) -> dict:
    """APPEND ``df``'s rows as a new version at O(|batch|) cost — the
    merge-on-read INSERT twin of ``snapshot_delete(mode='mor')``, and
    the op an hourly micro-batch ingest actually needs (the reference
    daemon appends every hour; rewriting the whole table per batch is
    the one cost shape that cannot survive table growth). Only the
    batch is written (a fresh dir recorded in ``extra_dirs``); the
    base version's dirs are reused untouched, so time travel, CDF,
    and rollback keep their contracts. The next copy-on-write commit
    (MERGE/UPDATE/copy-DELETE/compact) folds the appended dirs back
    into one.

    Contracts preserved per manifest payload:

    - persisted CHECK constraints are enforced on the NEW files only
      (existing rows already passed at their own commit);
    - if the base records file stats (and/or a Bloom index), the new
      files get theirs computed and merged in — appended entries
      carry their ``dir`` — so pruned scans and point lookups stay
      exact across appends;
    - deletion vectors carry forward (they reference base files);
    - schema must match the table column-for-column (case-insensitive
      names + types). Appending is ingest, not evolution — widen via
      ``snapshot_merge(evolve_schema=True)`` first.

    Concurrency: the commit carries ``expected_base``, so an append
    racing any other commit loses cleanly with
    :class:`SnapshotConflict` (its extra-dirs chain would be stale)
    and should retry from a fresh read."""
    base = _resolve(root)
    base_schema = {
        (f.name.lower(), f.dataType.simpleString())
        for f in spark.read.parquet(*_all_dirs(base)).schema.fields
    }
    new_schema = {
        (f.name.lower(), f.dataType.simpleString())
        for f in df.schema.fields
    }
    if base_schema != new_schema:
        raise ValueError(
            "append schema mismatch: "
            f"table-only {sorted(base_schema - new_schema)}, "
            f"batch-only {sorted(new_schema - base_schema)} — append "
            "is ingest, not evolution (widen via snapshot_merge("
            "evolve_schema=True) first)"
        )
    effective = _effective_constraints(root, None, None, None)
    new_dir = os.path.join(root, DATA_DIR, uuid.uuid4().hex)
    df.write.mode("error").parquet(new_dir)
    if effective:
        snapshot_check_constraints(
            spark.read.parquet(new_dir), effective
        )
    reserved = {
        "extra_dirs", "files", "blooms", "dv_dirs", "stats_cols",
        "stats_forms", "bloom_cols", "bloom_types", "bloom_conf",
    }
    bad_keys = reserved & set(extra or {})
    if bad_keys:
        raise ValueError(
            f"extra may not override append payload keys: {bad_keys}"
        )
    extra = {
        **(extra or {}),
        "extra_dirs": [*(base.get("extra_dirs") or []), new_dir],
    }
    for k in ("dv_dirs", "stats_cols", "stats_forms",
              "bloom_cols", "bloom_types", "bloom_conf"):
        if k in base:
            extra[k] = base[k]
    if base.get("stats_cols"):
        new_files = _file_stats(spark, new_dir, base["stats_cols"])
        for f in new_files:
            f["dir"] = new_dir
        extra["files"] = list(base.get("files") or []) + new_files
    if base.get("bloom_cols"):
        conf = base["bloom_conf"]
        new_blooms = _file_blooms(
            spark,
            new_dir,
            base["bloom_cols"],
            conf["num_bits"],
            conf["num_hashes"],
        )
        dup = set(new_blooms) & set(base.get("blooms") or {})
        if dup:  # task-uuid part names make this unreachable, but a
            # silent overwrite would break scan_point's exactness
            raise RuntimeError(f"append filename collision: {dup}")
        extra["blooms"] = {**(base.get("blooms") or {}), **new_blooms}
    return _commit(
        root,
        base["data_dir"],
        op="append",
        extra=extra,
        expected_base=base["version"],
    )


def snapshot_delete(
    spark: SparkSession,
    root: str,
    predicate: str,
    mode: str = "copy",
) -> dict:
    """DELETE FROM the latest snapshot: commit a new version holding
    only the rows ``predicate`` does NOT prove true — the Delta
    DELETE semantics, versioned (copy-on-write at version
    granularity: every pre-delete state stays readable, a bad delete
    rolls back with :func:`snapshot_rollback`, and
    :func:`snapshot_changes` reconstructs exactly which keys were
    removed). Completes the table format's CRUD surface next to
    write/MERGE/rollback.

    ``predicate`` is a Spark SQL boolean expression over the current
    schema. SQL DELETE semantics on NULLs: a row is removed only when
    the predicate evaluates TRUE — NULL keeps the row (the mirror of
    the CHECK-constraint rule, where NULL counts as a violation:
    deletes must prove, constraints must prove too). The deleted
    count and the predicate are recorded in the manifest; persisted
    CHECK constraints carry forward and re-enforce (a row subset
    cannot newly violate them, but the invariant "recorded ==
    enforced" stays uniform across every commit path).

    ``mode='copy'`` (default) rewrites the surviving rows — O(table)
    write, zero read overhead afterwards. ``mode='mor'`` is the
    MERGE-ON-READ form (the Delta/Iceberg deletion-vector idea): the
    data dir is NOT rewritten; the deleted rows' (file, row-position)
    pairs land in a sidecar parquet dir under ``root/_dv/`` and every
    reader subtracts them at scan time (:func:`_read_data`'s anti
    join). O(|deleted|) commit cost — the right trade for small
    deletes on big tables (GDPR erasure, late-arriving retractions);
    consecutive MOR deletes accumulate sidecars, and the next
    copy-on-write commit (write/MERGE/UPDATE/compact/copy-delete)
    materializes them away. Constraints are NOT re-enforced on a MOR
    delete — the surviving rows are a subset of rows that already
    passed at their own commit."""
    if mode not in ("copy", "mor"):
        raise ValueError(f"unknown delete mode {mode!r}")
    base = _resolve(root)
    current = _read_data(spark, base)
    cond = F.expr(predicate)
    if mode == "mor":
        # live rows matching the predicate, by (file, row position) —
        # _tagged_live already subtracted earlier DVs, so re-deleting
        # an already-deleted row can never double-record it
        live = _tagged_live(spark, base)
        hits = live.filter(F.coalesce(cond, F.lit(False))).select(
            F.col("__file").alias("file"),
            F.col("__pos").cast("long").alias("pos"),
        )
        return _commit_mor(
            spark, root, base, "delete", hits, None,
            {"predicate": predicate}, count_key="n_deleted",
        )
    remaining = current.filter(~F.coalesce(cond, F.lit(False)))
    # ONE pass over the LATEST version's immutable data dir for the
    # manifest metadata (deterministic lineage, so counting before the
    # write is safe — unlike the constraint TOCTOU, which guards
    # arbitrary inputs); the previous current.count() - remaining
    # .count() form paid two full scans for one number
    n_deleted = current.select(
        F.count(F.when(F.coalesce(cond, F.lit(False)), 1)).alias("n")
    ).collect()[0].n
    return snapshot_write(
        remaining,
        root,
        op="delete",
        extra={"predicate": predicate, "n_deleted": n_deleted},
        expected_base=base["version"],
    )


def snapshot_update(
    spark: SparkSession,
    root: str,
    predicate: str,
    set_exprs: dict[str, str],
    mode: str = "copy",
) -> dict:
    """UPDATE the latest snapshot: commit a new version where rows
    the ``predicate`` proves TRUE take the ``set_exprs`` column
    values (column -> Spark SQL expression over the PRE-update row,
    standard UPDATE semantics — all assignments read the old values)
    and every other row — including NULL-predicate rows — passes
    through unchanged. Completes the Delta DML triad beside
    :func:`snapshot_merge` and :func:`snapshot_delete`, with the same
    versioned copy-on-write guarantees (time travel, rollback, CDF).

    Unknown target columns are rejected (an UPDATE that silently
    widens the table is schema evolution's job — see snapshot_merge's
    evolve_schema); the matched-row count and assignments land in the
    manifest; persisted CHECK constraints re-enforce on the result,
    so an UPDATE that would break an invariant commits nothing.

    ``mode='mor'`` (merge-on-read): the matched rows' positions land
    in a deletion-vector sidecar and their POST-update images in an
    append dir — ONE commit at O(|matched|) cost, no table rewrite
    (Delta's DV-backed UPDATE shape). Constraints then enforce on the
    new images only; unmatched rows are a subset of rows that already
    passed."""
    if mode not in ("copy", "mor"):
        raise ValueError(f"unknown update mode {mode!r}")
    base = _resolve(root)
    current = _read_data(spark, base)  # DV-aware base
    existing_lc = {c.lower() for c in current.columns}
    unknown = [c for c in set_exprs if c.lower() not in existing_lc]
    if unknown:
        raise ValueError(
            f"UPDATE targets columns {unknown} the table lacks; use "
            "snapshot_merge(evolve_schema=True) to widen the schema"
        )
    cond = F.coalesce(F.expr(predicate), F.lit(False))
    if mode == "mor":
        matched = _tagged_live(spark, base).filter(cond)
        hits = matched.select(
            F.col("__file").alias("file"),
            F.col("__pos").cast("long").alias("pos"),
        )
        # standard UPDATE semantics: every assignment reads the
        # PRE-update row (withColumns applies all exprs over the
        # original columns in one projection)
        new_rows = matched.withColumns(
            {col: F.expr(expr) for col, expr in set_exprs.items()}
        ).drop("__file", "__pos")
        _require_same_schema(current, new_rows, "UPDATE SET")
        return _commit_mor(
            spark, root, base, "update", hits, new_rows,
            {"predicate": predicate, "set": dict(set_exprs)},
            count_key="n_updated",
        )
    # one agg pass for the manifest metadata, not a second full scan
    n_updated = current.select(
        F.count(F.when(cond, 1)).alias("n")
    ).collect()[0].n
    updated = current.withColumns(
        {
            col: F.when(cond, F.expr(expr)).otherwise(F.col(col))
            for col, expr in set_exprs.items()
        }
    )
    return snapshot_write(
        updated,
        root,
        op="update",
        extra={
            "predicate": predicate,
            "set": dict(set_exprs),
            "n_updated": n_updated,
        },
        expected_base=base["version"],
    )


def default_merge_keys(root: str, upper: int) -> list:
    """The table's de facto primary key: the key set recorded by the
    most recent MERGE commit at or before version ``upper``. The ONE
    canonical resolution rule — the change feed and the incremental
    aggregate refresh both defer here, so they can never disagree."""
    recorded = [
        m.get("keys")
        for m in _list_manifests(root)
        if m["version"] <= upper and m.get("keys")
    ]
    if not recorded:
        raise ValueError(
            "no MERGE commit records a key set at or before "
            f"version {upper}; pass keys=[...] explicitly"
        )
    return list(recorded[-1])


def snapshot_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
    keys: Sequence[str] | None = None,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change data feed between two committed versions — the Delta
    CDF idea, DERIVED rather than stored: one row per key that was
    added, removed, or changed between ``from_version`` and
    ``to_version`` (default latest), with the changed column list.
    Because every version owns an immutable data dir, the feed is
    reconstructable for ANY version pair after the fact — no
    enable-before-you-need-it flag, at the price of a full-outer join
    over the two versions instead of a stored delta (the right trade
    for daily batch versions; high-frequency CDC belongs to the
    streaming merge sink's own inputs).

    ``keys`` defaults to the key set recorded by the most recent
    MERGE commit at or before ``to_version`` — the table's de facto
    primary key. Comparison spans the columns the two versions SHARE
    (schema evolution adds columns; a version that predates one
    simply never reports it changed).

    Plan: both sides shuffle-partition on the key for the full-outer
    join; output is |delta|-sized (operators/merge.table_diff)."""
    from dex_data_ingestor_spark.operators.merge import table_diff

    if keys is None:
        upper = (
            to_version
            if to_version is not None
            else _resolve(root)["version"]
        )
        keys = default_merge_keys(root, upper)
    old = snapshot_read(spark, root, version=from_version)
    new = snapshot_read(spark, root, version=to_version)
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = [
            c for c in new.columns if c in shared and c not in keys
        ]
    return table_diff(old, new, list(keys), list(compare_cols))


def snapshot_rollback(root: str, to_version: int) -> dict:
    """Commit a new version whose data is an OLD version's directory.
    No data is copied; history is preserved (the bad version stays
    readable for the post-mortem). The target's file stats (if any)
    are carried into the new manifest — same data dir, same footers —
    so :func:`snapshot_scan_pruned` readers and a later
    :func:`snapshot_compact` keep working after a rollback."""
    target = _resolve(root, version=to_version)
    extra: dict = {"rolled_back_to": to_version}
    # carry EVERY data-descriptive payload the target recorded — same
    # data dir, same footers, so stats-pruned scans, bloom point
    # lookups, and a later compact's index recompute all keep working
    # after a rollback (review r12: the bloom keys were dropped, which
    # broke snapshot_scan_point on latest and made the next compact
    # silently drop the bloom index from the table for good)
    for k in ("files", "stats_cols", "stats_forms", "dv_dirs", "extra_dirs",
              "blooms", "bloom_cols", "bloom_types", "bloom_conf"):
        if k in target:
            extra[k] = target[k]
    return snapshot_commit_existing(
        root, target["data_dir"], op="rollback", extra=extra
    )


# ---------------------------------------------------------------------------
# File-level stats + data skipping
# ---------------------------------------------------------------------------


def _stat_bound(v, *, lo: bool):
    """A footer min/max as a JSON-SAFE, ORDER-PRESERVING manifest
    value — raw pyarrow statistics can be date / datetime / Decimal /
    bytes, which ``json.dump`` in _commit rejects (the commit would
    then crash AFTER the data dir was written, leaving an orphan, for
    exactly the date columns a pruning index is most wanted on).
    Dates/timestamps become ISO strings (lexicographic order ==
    chronological; scan callers pass bounds in the same ISO form);
    Decimals become floats widened one ULP OUTWARD so the recorded
    range still CONTAINS the true value (pruning is a superset
    guarantee — shrinking the range would wrongly exclude files);
    bytes return None (no stats: the file is conservatively read)."""
    if isinstance(v, bool) or isinstance(v, (int, float, str)):
        return v
    if isinstance(v, dt.datetime):  # before date: datetime IS a date
        # canonicalize tz-AWARE values (pyarrow instant-typed stats)
        # to UTC-naive before rendering: an aware isoformat carries a
        # '+00:00' suffix that sorts AFTER the same instant's naive
        # rendering, so mixed forms would compare lexicographically
        # out of order and mis-prune (review r12)
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return math.nextafter(f, -math.inf if lo else math.inf)
    return None


#: isoformat() timestamp shape ('T' separator) and _stat_bound's
#: stored renderings (space-separated timestamp / date-only).
_ISO_T_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}")
_TS_STAT_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}")
_DATE_STAT_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _stats_form(dtype_simple: str) -> str | None:
    """The pruning FORM a Spark column type's stats take in the
    manifest ('numeric' | 'timestamp' | 'date' | 'string' | 'bool';
    None = no form, stats for the column are never recorded). Written
    into the manifest at commit time (``stats_forms``) so bound
    normalization dispatches on the column's declared logical type
    instead of inferring it from a sampled stat VALUE's shape — a
    plain string column whose min value happens to look like
    'YYYY-MM-DD HH:MM:SS' (timestamp-prefixed log text) must still
    compare verbatim, which shape inference gets wrong."""
    if dtype_simple in ("timestamp", "timestamp_ntz"):
        return "timestamp"
    if dtype_simple == "date":
        return "date"
    # char(n)/varchar(n) surface when preserveCharVarcharTypeInfo is
    # on — they must tag as string, or the column silently falls back
    # to the sampled-shape inference this tag exists to eliminate
    if dtype_simple == "string" or dtype_simple.startswith(
            ("char(", "varchar(")):
        return "string"
    if dtype_simple == "boolean":
        return "bool"
    if dtype_simple in ("tinyint", "smallint", "int", "bigint",
                        "float", "double") or dtype_simple.startswith(
                            "decimal"):
        return "numeric"
    return None


def _infer_form(sample) -> str:
    """Legacy-manifest fallback: infer a column's stats form from one
    STORED value's shape, for manifests written before ``stats_forms``
    existed (documented misclassification risk — a plain string column
    whose values look like timestamps infers 'timestamp'; kept only
    for the legacy path)."""
    if isinstance(sample, (int, float)):
        return "numeric"
    if isinstance(sample, str):
        if _TS_STAT_RE.match(sample):
            return "timestamp"
        if _DATE_STAT_RE.match(sample):
            return "date"
        return "string"
    raise TypeError(
        f"unsupported stored stat type {type(sample).__name__}"
    )


#: the exact rendering _stat_bound writes for a naive timestamp —
#: anything else stored under a timestamp-form column is a legacy
#: aware rendering that must be canonicalized before comparison.
_TS_NAIVE_FULL_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d+)?$"
)


def _stored_ts(s):
    """A STORED timestamp-form stat value canonicalized for
    comparison. The r12 write-side fix renders tz-aware stats
    UTC-naive, but manifests written BEFORE it store aware renderings
    with an offset suffix ('...05+00:00'); a naive-rendered bound
    compares lexicographically out of order against those — an
    inclusive boundary match (stored min '...05+00:00' vs hi bound
    '...05', same instant) is wrongly pruned (ADVICE r12). Parse and
    re-render mirrors the write side; unparseable values return
    unchanged (the file is conservatively kept — both bounds of a
    kept-range comparison only widen)."""
    if not isinstance(s, str) or _TS_NAIVE_FULL_RE.match(s):
        return s
    try:
        parsed = dt.datetime.fromisoformat(s)
    except ValueError:
        return s
    if parsed.tzinfo is not None:
        parsed = parsed.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return parsed.isoformat(sep=" ")


def _query_bound(v, *, lo: bool, sample, form: str | None = None):
    """A caller-supplied scan bound rendered the way :func:`_stat_bound`
    rendered THIS COLUMN's manifest values (``sample`` is one stored
    bound for the column; None when the column has no recorded stats,
    in which case every file is kept and the bound is never compared).
    ``form`` is the column's logical form recorded in the manifest at
    write time (:func:`_stats_form`); pre-form manifests fall back to
    inferring the form from ``sample``'s shape — an inference a plain
    string column with timestamp-looking values defeats, which is why
    new writes record the tag.
    Normalizing by the bound's Python type ALONE is not enough — a
    datetime bound against DATE-form stats ('2024-01-02') renders as
    '2024-01-02 00:00:00', which sorts after the day it names and
    silently prunes matching files — so form mismatches raise instead
    of guessing:

    - numeric stats: int/float pass; Decimal widens one ULP OUTWARD
      (lo toward -inf, hi toward +inf — the range only grows, so
      skipping stays a superset guarantee); temporal/str bounds raise.
    - timestamp-form stats ('YYYY-MM-DD HH:MM:SS...'): datetime
      renders via _stat_bound (space separator); a 'T'-form isoformat
      string gets its separator replaced (it would otherwise sort
      after every stored value); a date bound raises — whether given
      as datetime.date OR as a bare 'YYYY-MM-DD' string (is an
      inclusive day's hi midnight or end-of-day? — caller must say,
      with a datetime or a full timestamp string).
    - date-form stats ('YYYY-MM-DD'): date renders via isoformat;
      datetime raises (same ambiguity, mirrored).
    - string stats (a plain string column): string bounds pass
      through UNTOUCHED — the stored values were never rewritten, so
      the bound must not be either (a string column legitimately
      holding 'T'-form ISO text compares verbatim).
    """
    if isinstance(v, bool):
        return v
    if sample is None:
        return v  # no stats recorded: never compared, any form is fine
    if form is None:
        form = _infer_form(sample)
    if form in ("numeric", "bool"):
        if isinstance(v, (int, float)):
            return v
        if isinstance(v, decimal.Decimal):
            return _stat_bound(v, lo=lo)
        raise TypeError(
            f"column stores numeric stats; got bound of type "
            f"{type(v).__name__}"
        )
    if form == "timestamp":
        if isinstance(v, dt.datetime):
            return _stat_bound(v, lo=lo)  # aware -> UTC-naive there
        if isinstance(v, str):
            if _DATE_STAT_RE.match(v):
                raise TypeError(
                    "column stores timestamp-form stats; a bare "
                    f"'YYYY-MM-DD' string bound ({v!r}) is ambiguous "
                    "— as a hi bound it sorts BEFORE every timestamp "
                    "inside the day it names and silently prunes "
                    "matching files. Say midnight or end-of-day with "
                    "a datetime or a full timestamp string."
                )
            if _ISO_T_RE.match(v) or _TS_STAT_RE.match(v):
                # the prefix match alone is not enough: an
                # offset-suffixed rendering ('...+05:00', '...Z')
                # would compare VERBATIM against stored UTC-naive
                # renderings — the suffix sorts after any digit and a
                # non-UTC offset is hours wrong, so a lo bound can
                # exceed a file's true max and silently prune matching
                # rows (ADVICE r12). Parse and canonicalize through
                # the same path as datetime bounds: aware -> UTC-naive
                # -> the stored space-separated rendering.
                try:
                    parsed = dt.datetime.fromisoformat(v)
                except ValueError as e:
                    raise TypeError(
                        f"unparseable timestamp string bound {v!r}; "
                        "pass ISO 'YYYY-MM-DD HH:MM:SS[.ffffff]"
                        "[+HH:MM]' (space or 'T' separator, seconds "
                        "included) or a datetime"
                    ) from e
                return _stat_bound(parsed, lo=lo)
            # a seconds-less or otherwise unrecognized string would
            # pass through and sort after every same-day stored value
            # ('T' > ' '), silently pruning the whole day (review r12)
            raise TypeError(
                f"unrecognized timestamp string bound {v!r}; pass "
                "'YYYY-MM-DD HH:MM:SS[.ffffff]' (space or 'T' "
                "separator, seconds included) or a datetime"
            )
        raise TypeError(
            "column stores timestamp-form stats; pass a datetime "
            f"or an ISO string, got {type(v).__name__} (a date is "
            "ambiguous at the hi bound — say midnight or "
            "end-of-day with a datetime)"
        )
    if form == "date":
        if isinstance(v, dt.datetime):
            raise TypeError(
                "column stores DATE-form stats; pass a "
                "datetime.date or a 'YYYY-MM-DD' string (a "
                "datetime would render with a time part and sort "
                "after the day it names, silently mis-pruning)"
            )
        if isinstance(v, dt.date):
            return v.isoformat()
        if isinstance(v, str):
            return v
        raise TypeError(
            f"column stores DATE-form stats; got {type(v).__name__}"
        )
    if form == "string":
        if isinstance(v, str):
            return v  # plain string column: verbatim comparison
        raise TypeError(
            f"column stores string stats; got bound of type "
            f"{type(v).__name__}"
        )
    raise TypeError(f"unsupported stats form {form!r}")


def _one_file_stats(path: str, cols: Sequence[str]) -> dict:
    """min/max + null counts for ``cols`` from ONE parquet file's
    FOOTER (no data pages are read). Pure function of the path — runs
    executor-side.

    Null counts are collected INDEPENDENTLY of min/max: an all-null
    column has no min/max (parquet stats exclude nulls) but a
    perfectly known null count — exactly the file a null-aware scan
    most wants to skip. A column listed in ``cols`` but absent from
    the file's physical schema (schema evolution: written before the
    column existed) reads back as all-NULL, so it records
    ``nulls[c] == rows`` — accurate, and lets IS NOT NULL scans skip
    the file. A column whose footer lacks null counts is simply
    omitted from ``nulls`` (conservatively unknown)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    stats: dict[str, list] = {}
    nulls: dict[str, int] = {}
    for c in cols:
        if c not in idx:
            nulls[c] = md.num_rows  # physically absent: reads as NULL
            continue
        los, his = [], []
        nc, nc_known = 0, True
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx[c]).statistics
            n = getattr(s, "null_count", None) if s is not None else None
            if n is None:
                nc_known = False
            else:
                nc += n
            if s is None or not s.has_min_max:
                los = [None]  # unknown -> no min/max for this col
                continue
            los.append(s.min)
            his.append(s.max)
        if nc_known:
            nulls[c] = nc
        if los and None not in los:
            b_lo = _stat_bound(min(los), lo=True)
            b_hi = _stat_bound(max(his), lo=False)
            if b_lo is not None and b_hi is not None:
                stats[c] = [b_lo, b_hi]
    return {
        "file": os.path.basename(path),
        "stats": stats,
        "nulls": nulls,
        "rows": md.num_rows,
    }


def _file_stats(spark: SparkSession, data_dir: str, cols: Sequence[str]
                ) -> list[dict]:
    """Per-file min/max for ``cols``, the footer reads FANNED OUT over
    executors — the shape real table formats use at write time. The
    driver only holds the file NAME list (it already owns that: the
    names go in the manifest) and the O(#files) stat dicts coming
    back, which likewise land in the manifest; no per-file I/O
    serializes on the driver. At 10^5-10^6 files per 100 TB version
    this is a wide, trivially-parallel metadata stage instead of a
    driver-side scan."""
    names = sorted(
        n for n in os.listdir(data_dir) if n.endswith(".parquet")
    )
    if not names:
        return []
    cols = list(cols)
    sc = spark.sparkContext
    slices = min(len(names), max(sc.defaultParallelism, 1))
    out = (
        sc.parallelize(
            [os.path.join(data_dir, n) for n in names], slices
        )
        .map(lambda p: _one_file_stats(p, cols))
        .collect()
    )
    return sorted(out, key=lambda d: d["file"])


#: Per-file Bloom index sizing: 2^13 bits = 128 manifest longs
#: (~1 KiB JSON) per (file, column) — ~1% false-positive rate at
#: ~800 distinct values per file with 5 hashes; raise num_bits for
#: bigger files (10 bits per distinct value is the rule of thumb).
BLOOM_INDEX_BITS = 1 << 13
BLOOM_INDEX_HASHES = 5


def _file_blooms(
    spark: SparkSession,
    data_dir: str,
    cols: Sequence[str],
    num_bits: int,
    num_hashes: int,
) -> dict[str, dict[str, list[int]]]:
    """Per-(file, column) Bloom bitmaps of the written data, built
    DISTRIBUTED in ONE scan: every row explodes to its
    (column, bit-position) pairs (the operators.bloom
    Kirsch-Mitzenmacher scheme — the probe side must replay it
    bit-for-bit; NULL keys contribute nothing), tagged with
    ``_metadata.file_name``, and words fold with bit_or under a
    (file, column, word) grouping. Only the
    O(#files * #cols * num_bits/64) word lists come back to the
    driver — manifest payload, same order as the min/max stats
    themselves. A per-column loop here would rescan the just-written
    data once per indexed column."""
    from dex_data_ingestor_spark.operators.bloom import _bit_positions

    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("c"),
                pos.alias("bit"),
                F.col(c).isNotNull().alias("ok"),
            )
            for c in cols
            for pos in _bit_positions(F.col(c), num_bits, num_hashes)
        ]
    )
    words = (
        spark.read.parquet(data_dir)
        .select(
            F.col("_metadata.file_name").alias("fname"),
            F.explode(pairs).alias("p"),
        )
        .filter(F.col("p.ok"))
        .groupBy(
            "fname",
            F.col("p.c").alias("c"),
            F.shiftright(F.col("p.bit"), 6).alias("w"),
        )
        .agg(
            F.bit_or(
                F.expr("shiftleft(1L, CAST(p.bit % 64 AS INT))")
            ).alias("word")
        )
        .groupBy("fname", "c")
        .agg(F.collect_list(F.struct("w", "word")).alias("ws"))
        .collect()
    )
    out: dict[str, dict[str, list[int]]] = {}
    for r in words:
        dense = [0] * (num_bits // 64)
        for s in r.ws:
            dense[s.w] = s.word
        out.setdefault(r.fname, {})[r.c] = dense
    return out


def snapshot_write_with_stats(
    df: DataFrame,
    root: str,
    stats_cols: Sequence[str],
    op: str = "write",
    extra: dict | None = None,
    bloom_cols: Sequence[str] | None = None,
    constraints: dict[str, str] | None = None,
    drop_constraints: Sequence[str] | None = None,
    branch: str | None = None,
    expected_base: int | None = None,
) -> dict:
    """:func:`snapshot_write` + per-file min/max AND null-count stats
    for ``stats_cols`` recorded in the manifest (read from parquet
    footers after the write). Cluster the data on the stats columns
    first (``df.repartitionByRange(*stats_cols)``) or the per-file
    ranges all overlap and skipping prunes nothing. Null counts feed
    :func:`snapshot_scan_null_pruned` (IS [NOT] NULL skipping) and
    let range scans skip ALL-NULL files, which have no min/max.

    ``bloom_cols`` additionally records a per-file Bloom bitmap per
    listed column — the Delta bloom-filter-index idea: min/max stats
    only prune columns the LAYOUT is clustered on, while a Bloom
    answers point lookups on any high-cardinality column scattered
    across every file (:func:`snapshot_scan_point`).

    ``constraints`` / ``drop_constraints`` follow the
    :func:`snapshot_write` contract (post-write pre-commit
    enforcement on the written files; the set persists), so a table
    can establish its skipping indexes AND its CHECK constraints in
    one commit."""
    effective = _effective_constraints(
        root, constraints, drop_constraints, extra, branch=branch
    )
    extra = _with_branch_extra(root, branch, extra)
    data_dir = _write_and_enforce(df, root, op, effective)
    files = _file_stats(df.sparkSession, data_dir, stats_cols)
    payload = {
        **extra,
        "files": files,
        "stats_cols": list(stats_cols),
        # the column's declared logical form, recorded at write time
        # so scan-bound normalization never infers it from a sampled
        # stat VALUE's shape (ADVICE r11: a string column whose min
        # looks like a timestamp was misclassified)
        "stats_forms": {
            c: _stats_form(df.schema[c].dataType.simpleString())
            for c in stats_cols
            if c in df.columns
        },
        "constraints": effective,
    }
    if bloom_cols:
        blooms = _file_blooms(
            df.sparkSession,
            data_dir,
            bloom_cols,
            BLOOM_INDEX_BITS,
            BLOOM_INDEX_HASHES,
        )
        payload["blooms"] = blooms
        payload["bloom_cols"] = list(bloom_cols)
        # stored types ride the manifest so a point lookup can hash
        # its literal with the writer's exact type WITHOUT opening
        # the version's footers first
        payload["bloom_types"] = {
            c: df.schema[c].dataType.simpleString() for c in bloom_cols
        }
        payload["bloom_conf"] = {
            "num_bits": BLOOM_INDEX_BITS,
            "num_hashes": BLOOM_INDEX_HASHES,
        }
    return _commit(root, data_dir, op, payload, expected_base=expected_base)


def snapshot_scan_point(
    spark: SparkSession,
    root: str,
    col: str,
    value,
    version: int | None = None,
):
    """Point-lookup file skipping via the manifest Bloom index: read
    only the files whose bitmap for ``col`` MIGHT contain ``value``
    (false positives read harmlessly; a bloom-absent verdict is
    exact). Files without a recorded bitmap for ``col`` are
    conservatively INCLUDED. Superset guarantee like
    :func:`snapshot_scan_pruned` — the caller still applies the exact
    predicate.

    The probe hashes the literal ENGINE-SIDE (one 1-row job, cast to
    the column's stored type) so it is the same xxhash64 the write
    side used, then replays the Kirsch-Mitzenmacher positions on the
    manifest words in Python — O(#files * k) driver work on data the
    driver already holds. A file absent from the bloom map entirely
    contributed no non-null key to ANY indexed column, so it cannot
    contain the (non-null) lookup value — skipping it is exact, not
    heuristic. Lookups of NULL are rejected (NULL never equals)."""
    if value is None:
        raise ValueError("point lookup of NULL is never a match")
    m = _resolve(root, version=version)
    blooms = m.get("blooms")
    conf = m.get("bloom_conf")
    # PRESENCE check, not truthiness (review r12): an indexed write
    # whose rows were all NULL (or empty) legitimately records
    # blooms={} — the exact verdict for any non-null lookup is "no
    # file can match", not a missing-index error.
    if blooms is None or not conf:
        raise ValueError(
            f"version {m['version']} has no bloom index (written via "
            "snapshot_write_with_stats(bloom_cols=...)?)"
        )
    indexed = m.get("bloom_cols") or []
    if col not in indexed:
        # the absent-file exactness argument below only holds for
        # INDEXED columns; pruning on anything else would silently
        # drop matching rows
        raise ValueError(
            f"column {col!r} is not bloom-indexed in version "
            f"{m['version']} (indexed: {indexed})"
        )
    num_bits, num_hashes = conf["num_bits"], conf["num_hashes"]
    # the indexed column's stored type was recorded at write time —
    # no need to open the version's footers just to resolve a dtype
    typestr = m["bloom_types"][col]
    h64 = (
        spark.range(1)
        .select(F.xxhash64(F.lit(value).cast(typestr)).alias("h"))
        .head()["h"]
    )
    h1 = h64 & 0xFFFFFFFF
    h2 = ((h64 & 0xFFFFFFFFFFFFFFFF) >> 32) | 1
    # appended files live outside data_dir: the stats entries carry
    # their dir, and blooms are keyed by basename only
    fdir = {
        f["file"]: f.get("dir", m["data_dir"])
        for f in (m.get("files") or [])
    }
    keep = []
    for fname, per_col in sorted(blooms.items()):
        path = os.path.join(fdir.get(fname, m["data_dir"]), fname)
        words = per_col.get(col)
        if words is None:
            keep.append(path)
            continue
        hit = True
        for i in range(num_hashes):
            pos = (h1 + i * h2) % num_bits
            if not (words[pos >> 6] >> (pos % 64)) & 1:
                hit = False
                break
        if hit:
            keep.append(path)
    if not keep:
        return spark.read.parquet(m["data_dir"]).limit(0)
    return _read_data(spark, m, files=keep)


def snapshot_scan_pruned(
    spark: SparkSession,
    root: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
):
    """Read only the files whose recorded [min, max] for ``col``
    overlaps [lo, hi] — manifest-level data skipping, the same idea
    partition pruning and Delta/Iceberg file skipping implement. Files
    without recorded stats for ``col`` are conservatively INCLUDED —
    except files whose recorded null count equals their row count
    (provably all-NULL for the column, incl. files written before the
    column existed): those hold no value in ANY range and are skipped.
    Returns the DataFrame (caller still applies the exact predicate —
    skipping is a superset guarantee, not a filter).

    ``lo``/``hi`` are normalized through the SAME rendering
    :func:`_stat_bound` used when the manifest was written, keyed on
    the column's logical form RECORDED IN THE MANIFEST at write time
    (``stats_forms``; pre-form manifests fall back to sampled-shape
    inference — see :func:`_query_bound`): datetime bounds against
    timestamp-form
    stats render with the stored space separator, 'T'-form isoformat
    strings get their separator replaced, date bounds against
    DATE-form stats render as 'YYYY-MM-DD', Decimals against numeric
    stats widen one ULP OUTWARD (more files kept, never fewer) — and
    FORM MISMATCHES (a datetime against DATE-form stats, a date
    against timestamp-form stats) raise TypeError instead of silently
    pruning wrong files. Plain string columns compare verbatim."""
    return snapshot_scan_pruned_multi(
        spark, root, {col: (lo, hi)}, version=version
    )


def _col_overlap_pred(m: dict, files: list, col: str, lo, hi):
    """Per-file survival predicate for ONE column's [lo, hi] bound —
    the normalization/comparison core shared by the single- and
    multi-column pruned scans."""
    sample = next(
        (f["stats"][col][0] for f in files if f["stats"].get(col)), None
    )
    form = (m.get("stats_forms") or {}).get(col)
    lo = _query_bound(lo, lo=True, sample=sample, form=form)
    hi = _query_bound(hi, lo=False, sample=sample, form=form)
    # legacy manifests (written before the r12 aware->UTC-naive
    # write-side canonicalization) store timestamp stats with an
    # offset suffix; canonicalize STORED values at compare time so a
    # naive-rendered bound orders correctly against them (ADVICE r12).
    # Gated on the column's effective form — a plain STRING column
    # legitimately holding offset-suffixed text must keep comparing
    # verbatim on both sides.
    eff = form if form is not None else (
        _infer_form(sample) if sample is not None else None
    )
    canon = _stored_ts if eff == "timestamp" else (lambda s: s)

    def keep(f: dict) -> bool:
        rng = f["stats"].get(col)
        if rng is None:
            # no min/max recorded — usually conservatively kept, with
            # ONE knowable exception: a file whose recorded null count
            # equals its row count is all-NULL for the column (parquet
            # min/max exclude nulls, so all-null files never get
            # range stats) and cannot contain a value in ANY [lo, hi]
            nc, rows = f.get("nulls", {}).get(col), f.get("rows")
            return not (
                nc is not None and rows is not None and nc >= rows > 0
            )
        return not (hi < canon(rng[0]) or lo > canon(rng[1]))

    return keep


def snapshot_scan_pruned_multi(
    spark: SparkSession,
    root: str,
    bounds: dict,
    version: int | None = None,
):
    """Conjunctive multi-column data skipping: read only the files
    whose recorded stats overlap EVERY column's [lo, hi] in
    ``bounds`` (``{col: (lo, hi), ...}``) — the scan shape a Z-ordered
    layout exists for (:func:`zorder_key`: each file covers a small
    HYPERCUBE of the joint key space, so conjunctive bounds multiply
    their selectivities instead of pruning on one dimension and
    reading the rest). Bound normalization and the null/legacy
    handling follow :func:`snapshot_scan_pruned` per column; files
    without stats for a column pass that column's test conservatively.
    Skipping remains a superset guarantee."""
    m = _resolve(root, version=version)
    files = m.get("files")
    if not files:
        raise ValueError(
            f"version {m['version']} has no file stats (written via "
            "snapshot_write_with_stats?)"
        )
    if not bounds:
        raise ValueError("bounds must name at least one column")
    preds = [
        _col_overlap_pred(m, files, col, lo, hi)
        for col, (lo, hi) in bounds.items()
    ]
    keep = [
        _entry_path(m, f)
        for f in files
        if all(p(f) for p in preds)
    ]
    if not keep:
        # empty selection: preserve schema by reading the dir and
        # filtering everything out
        return spark.read.parquet(m["data_dir"]).limit(0)
    return _read_data(spark, m, files=keep)


def snapshot_scan_null_pruned(
    spark: SparkSession,
    root: str,
    col: str,
    non_null: bool = True,
    version: int | None = None,
):
    """Read only the files that can satisfy a null predicate on
    ``col`` — the null-count dimension of manifest data skipping
    (Delta/Iceberg record the same per-file ``nullCount``):

    - ``non_null=True`` (an ``IS NOT NULL`` consumer): skip files
      whose recorded null count equals their row count — all-NULL
      files, including files written BEFORE the column existed
      (schema evolution reads them as NULL, and the stats writer
      records them as such);
    - ``non_null=False`` (an ``IS NULL`` consumer): skip files whose
      recorded null count is zero.

    Files without recorded null counts (legacy manifests, or footers
    lacking the optional parquet null_count) are conservatively KEPT.
    Skipping remains a superset guarantee — the caller still applies
    the exact predicate."""
    m = _resolve(root, version=version)
    files = m.get("files")
    if not files:
        raise ValueError(
            f"version {m['version']} has no file stats (written via "
            "snapshot_write_with_stats?)"
        )
    keep = []
    for f in files:
        nc, rows = f.get("nulls", {}).get(col), f.get("rows")
        if nc is not None and rows is not None:
            if non_null and nc >= rows > 0:
                continue
            if not non_null and nc == 0 and rows > 0:
                continue
        keep.append(_entry_path(m, f))
    if not keep:
        return spark.read.parquet(m["data_dir"]).limit(0)
    return _read_data(spark, m, files=keep)


# ---------------------------------------------------------------------------
# Lifecycle: compaction + vacuum
# ---------------------------------------------------------------------------


def zorder_key(cols: Sequence[str], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of the
    given NON-NEGATIVE integer columns — bit i of column j lands at
    position ``i*len(cols) + j``. Sorting by this single key gives a
    space-filling-curve layout where a contiguous key range maps to a
    small HYPERCUBE of the value space, so per-file min/max stats
    prune on EVERY participating column (linear clustering prunes
    only on its leading column) — the idea behind Delta's
    OPTIMIZE ZORDER BY.

    Contract: values must lie in [0, 2**bits) — higher bits are not
    read, so out-of-range values ALIAS (two far-apart keys collate
    together and the layout silently degrades; range-rank or bin
    real-valued/unbounded columns into the domain first). The key
    stays a long for len(cols)*bits <= 63. Pure flat bit arithmetic
    (shift/and/or) — whole-stage-codegen friendly, 2*bits terms per
    column, no UDF."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError("len(cols) * bits must stay under 64")
    out = None
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), i).bitwiseAND(
                F.lit(1)
            )
            term = F.shiftleft(bit, i * n + j)
            out = term if out is None else out + term
    return out


def snapshot_compact(
    spark: SparkSession,
    root: str,
    target_files: int = 1,
    cluster_by: Sequence[str] | None = None,
    zorder_by: Sequence[str] | None = None,
    zorder_bits: int = 16,
) -> dict:
    """Rewrite the LATEST version's data as ``target_files`` files and
    commit it as a new version (op='compact') — the small-files answer
    for high-frequency micro-batch merges (each stream-merge commit
    writes a full version; hourly cadence x small batches = many tiny
    files; compaction folds them without changing content). History is
    unchanged: the uncompacted version stays readable.

    ``cluster_by`` additionally range-clusters the rewrite
    (repartitionByRange + sortWithinPartitions on the given columns):
    each output file then covers a DISJOINT value range, so the
    per-file min/max footer stats become selective and
    :func:`snapshot_scan_pruned` on those columns prunes to the few
    overlapping files instead of reading everything — the
    OPTIMIZE-with-clustering maintenance step of the lakehouse
    formats (Delta ZORDER / Iceberg sort orders, in its
    single-dimension form). Micro-batch ingest appends in arrival
    order, so without a clustering rewrite the stats of every file
    span the whole key domain and skipping never fires. The clustered
    columns are added to the recorded stats set.

    ``zorder_by`` instead MULTI-DIMENSIONALLY clusters the rewrite on
    the Morton key of the given integer columns (see
    :func:`zorder_key`): each output file covers a small hypercube of
    the joint key space, so :func:`snapshot_scan_pruned` prunes on a
    filter over ANY of the z-ordered columns — a trailing-column
    filter that linear ``cluster_by`` cannot prune at all. Stats are
    recorded for the RAW columns (the key itself is layout, not
    schema). Mutually exclusive with ``cluster_by``.

    If the prior version recorded file stats (written via
    :func:`snapshot_write_with_stats`), the compacted version
    RECOMPUTES them for the same columns — compaction is routine
    maintenance and must not silently break
    :func:`snapshot_scan_pruned` readers."""
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are exclusive")
    prior = _resolve(root)
    current = _read_data(spark, prior)  # DV-aware: compact materializes MOR deletes away
    stats_cols = list(prior.get("stats_cols") or [])
    if cluster_by:
        compacted = current.repartitionByRange(
            max(1, target_files), *cluster_by
        ).sortWithinPartitions(*cluster_by)
        stats_cols = sorted(set(stats_cols) | set(cluster_by))
    elif zorder_by:
        zk = zorder_key(zorder_by, bits=zorder_bits)
        compacted = current.repartitionByRange(
            max(1, target_files), zk
        ).sortWithinPartitions(zk)
        stats_cols = sorted(set(stats_cols) | set(zorder_by))
    else:
        compacted = current.coalesce(max(1, target_files))
    bloom_cols = list(prior.get("bloom_cols") or [])
    if stats_cols or bloom_cols:
        return snapshot_write_with_stats(
            compacted,
            root,
            stats_cols,
            op="compact",
            bloom_cols=bloom_cols or None,
            expected_base=prior["version"],
        )
    return snapshot_write(
        compacted, root, op="compact", expected_base=prior["version"]
    )


def snapshot_vacuum(
    root: str,
    keep_last: int = 3,
    orphans_min_age_s: float | None = None,
) -> list[str]:
    """Delete data directories referenced ONLY by versions older than
    the last ``keep_last`` manifests; returns the removed dirs.

    Reference-counted by data_dir: rollback/compact commits may point
    several versions at one directory, and a directory survives if ANY
    retained version references it. Retained manifests stay readable;
    older manifests remain in the log (history is an audit trail) but
    their time-travel reads will fail once vacuumed — same contract as
    Delta's VACUUM vs retention window.

    ``orphans_min_age_s`` additionally reclaims ORPHAN data dirs —
    directories no manifest references at all (writer died between
    data write and manifest commit, or lost a SnapshotConflict race).
    The format guarantees producing these, so a vacuum that cannot
    reclaim them leaks full-copy dirs unboundedly on long-lived
    tables. Only dirs whose mtime is older than the threshold are
    removed, so an IN-FLIGHT write (data written, commit imminent) is
    never raced — pick an age far above the longest expected
    write-to-commit gap (Delta's VACUUM has the same tombstone-age
    contract)."""
    import shutil
    import time

    if keep_last < 1:
        # manifests[-0:] is the WHOLE list — keep_last=0 would
        # silently retain everything (the opposite of the request)
        # instead of reclaiming it; there is no meaningful "retain
        # nothing" for a live table, so reject loudly (review r12)
        raise ValueError(f"keep_last must be >= 1: {keep_last}")
    manifests = _list_manifests(root)
    # normalize EVERY side before comparing: manifests store the
    # writer's verbatim spelling of data_dir, and two manifests can
    # legitimately spell the SAME physical dir differently (a
    # commit_existing/rollback issued from another cwd with an
    # absolute path). A verbatim-string comparison would let a
    # retained version's dir ride the removable set under its other
    # spelling and be deleted out from under it (review r12 — the
    # hazard was documented here but the normalization was applied
    # only to the orphan scan).
    rp = os.path.realpath
    referenced = {
        rp(d) for m in manifests for d in _all_dirs(m)
    }
    removed = []
    # named refs PIN their data dirs past the retention window: a tag
    # exists precisely so 'the table state run X read' stays readable,
    # and an unpublished branch head must survive a mainline vacuum
    ref_pinned = set()
    # the MAINLINE LATEST is always pinned: staged branch commits can
    # fill the keep_last tail of the shared log, and evicting the
    # version every default read resolves to would break the table
    pinned_ms: list[dict] = []
    try:
        latest_m = _resolve(root)
        ref_pinned.add(rp(latest_m["data_dir"]))
        pinned_ms.append(latest_m)
    except (FileNotFoundError, KeyError):
        pass
    for r in snapshot_refs(root):
        try:
            rm = _resolve(root, version=r["version"])
            ref_pinned.add(rp(rm["data_dir"]))
            pinned_ms.append(rm)
            if r["type"] == "branch":
                bm = _branch_head(root, r["name"], r)
                ref_pinned.add(rp(bm["data_dir"]))
                pinned_ms.append(bm)
        except (KeyError, FileNotFoundError):
            continue

    def _dv_set(ms) -> set:
        return {
            rp(d) for m in ms for d in (m.get("dv_dirs") or [])
        }

    if len(manifests) > keep_last:
        retained = {
            rp(d) for m in manifests[-keep_last:] for d in _all_dirs(m)
        } | ref_pinned | {rp(d) for m in pinned_ms for d in _all_dirs(m)}
        removable = {
            rp(d) for m in manifests[:-keep_last] for d in _all_dirs(m)
        } - retained
        for d in sorted(removable):
            if os.path.isdir(d):
                shutil.rmtree(d)
                removed.append(d)
        # deletion-vector sidecars are reference-counted exactly like
        # data dirs: a dv dir survives while ANY retained or pinned
        # manifest lists it (consecutive MOR deletes share prefixes
        # of the sidecar list, so old dv dirs stay live until every
        # retained version materialized past them)
        dv_retained = _dv_set(manifests[-keep_last:]) | _dv_set(
            pinned_ms
        )
        for d in sorted(_dv_set(manifests[:-keep_last]) - dv_retained):
            if os.path.isdir(d):
                shutil.rmtree(d)
                removed.append(d)
    if orphans_min_age_s is not None:
        now = time.time()
        data_root = os.path.join(root, DATA_DIR)
        if os.path.isdir(data_root):
            for name in sorted(os.listdir(data_root)):
                d = os.path.join(data_root, name)
                if (
                    os.path.isdir(d)
                    and os.path.realpath(d) not in referenced
                    and now - os.path.getmtime(d) >= orphans_min_age_s
                ):
                    shutil.rmtree(d)
                    removed.append(d)
        # orphan DV dirs: written by a MOR delete that died (or lost
        # its race) before commit — same age guard as data orphans
        dv_root = os.path.join(root, DV_DIR)
        dv_referenced = _dv_set(manifests)
        if os.path.isdir(dv_root):
            for name in sorted(os.listdir(dv_root)):
                d = os.path.join(dv_root, name)
                if (
                    os.path.isdir(d)
                    and os.path.realpath(d) not in dv_referenced
                    and now - os.path.getmtime(d) >= orphans_min_age_s
                ):
                    shutil.rmtree(d)
                    removed.append(d)
    return removed


# ---------------------------------------------------------------------------
# Named refs: tags (immutable) + branches (write-audit-publish staging)
# ---------------------------------------------------------------------------


def _refs_path(root: str) -> str:
    return os.path.join(root, REFS_DIR)


def _ref_file(root: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid ref name {name!r}")
    return os.path.join(_refs_path(root), f"{name}.json")


def _read_ref(root: str, name: str) -> dict:
    try:
        with open(_ref_file(root, name)) as f:
            return json.load(f)
    except FileNotFoundError as e:
        raise KeyError(f"no ref {name!r} under {root}") from e


def snapshot_refs(root: str) -> list[dict]:
    """All named refs (tags + branches), sorted by name."""
    p = _refs_path(root)
    if not os.path.isdir(p):
        return []
    out = []
    for n in sorted(os.listdir(p)):
        if n.endswith(".json"):
            with open(os.path.join(p, n)) as f:
                out.append(json.load(f))
    return out


def _create_ref(root: str, name: str, kind: str, version: int) -> dict:
    # the version must exist before a ref can pin it
    _resolve(root, version=version)
    os.makedirs(_refs_path(root), exist_ok=True)
    ref = {
        "name": name,
        "type": kind,
        "version": version,
        # unique per CREATION: staged branch commits stamp this id, so
        # deleting a branch and recreating the name starts empty
        # instead of adopting the abandoned run's staged commits
        "id": uuid.uuid4().hex,
        "created_at": dt.datetime.now(dt.timezone.utc).isoformat(),
    }
    try:
        fd = os.open(
            _ref_file(root, name), os.O_WRONLY | os.O_CREAT | os.O_EXCL
        )
    except FileExistsError as e:
        raise SnapshotConflict(
            f"ref {name!r} already exists under {root}"
        ) from e
    with os.fdopen(fd, "w") as f:
        json.dump(ref, f)
    return ref


def snapshot_create_tag(
    root: str, name: str, version: int | None = None
) -> dict:
    """Pin an immutable named TAG at ``version`` (default: mainline
    latest) — the Iceberg tag idea: 'the exact table state training
    run X read' survives vacuum (tagged data dirs are retention-
    pinned) and later commits. O_EXCL create: a tag can never be
    silently repointed; delete and recreate to move it
    (:func:`snapshot_delete_ref`)."""
    if version is None:
        version = _resolve(root)["version"]
    return _create_ref(root, name, "tag", version)


def snapshot_create_branch(
    root: str, name: str, version: int | None = None
) -> dict:
    """Create a named BRANCH based at ``version`` (default: mainline
    latest). Writes with ``snapshot_write(..., branch=name)`` land on
    the branch — version-numbered in the shared log but invisible to
    mainline/tag/as_of reads — until :func:`snapshot_publish` exposes
    the branch head atomically (write-audit-publish). The branch head
    is the LATEST branch-marked commit after the base, or the base
    itself when nothing has been staged yet."""
    if version is None:
        version = _resolve(root)["version"]
    return _create_ref(root, name, "branch", version)


def snapshot_delete_ref(root: str, name: str) -> None:
    """Drop a ref. Its data dirs lose vacuum pinning (tags) or the
    staged commits become unreachable except by explicit version
    (branches); the manifest log itself is never touched."""
    try:
        os.remove(_ref_file(root, name))
    except FileNotFoundError as e:
        raise KeyError(f"no ref {name!r} under {root}") from e


def _branch_head(root: str, name: str, ref: dict | None = None) -> dict:
    """Latest manifest staged on branch ``name`` after its base, else
    the base manifest. Staged commits must carry THIS ref's creation
    id — commits staged by a same-named branch that was later deleted
    belong to that abandoned run, not to a recreated branch."""
    r = ref if ref is not None else _read_ref(root, name)
    if r["type"] != "branch":
        raise ValueError(f"ref {name!r} is a tag, not a branch")
    head = None
    for m in _list_manifests(root):
        if (
            m.get("branch") == name
            and m.get("branch_id") == r.get("id")
            and m["version"] > r["version"]
        ):
            head = m
    return head if head is not None else _resolve(root, r["version"])


#: manifest keys that identify the COMMIT rather than describe the
#: data; everything else (files/stats/blooms/constraints/keys/...)
#: transfers verbatim when a publish fast-forwards a branch head.
_COMMIT_IDENTITY_KEYS = frozenset(
    {"version", "committed_at", "op", "data_dir", "branch",
     "branch_id", "txn"}
)


def snapshot_publish(root: str, branch: str) -> dict:
    """Fast-forward MAINLINE to the head of ``branch`` — the publish
    step of write-audit-publish: a new mainline manifest points at the
    branch head's existing data directory (no data copied, the
    rollback trick in reverse), carrying the head's descriptive
    payload (file stats, blooms, constraints) so skipping and
    enforcement survive the publish. The staged history remains in
    the log as an audit trail; the branch ref stays and can keep
    staging from the published state. Raises if nothing was staged —
    publishing a no-op silently would let an audit gate pass
    vacuously."""
    r = _read_ref(root, branch)
    if r["type"] != "branch":
        raise ValueError(f"ref {branch!r} is a tag, not a branch")
    head = _branch_head(root, branch, r)
    if "branch" not in head:
        raise ValueError(
            f"branch {branch!r} has no staged commits to publish"
        )
    # publish is a FAST-FORWARD only: once the head is published (or
    # mainline advances past the staged run), a retry must fail loudly
    # instead of silently rolling mainline back to stale staged data
    try:
        mainline = _resolve(root)
    except (FileNotFoundError, KeyError):
        mainline = None
    if mainline is not None and head["version"] <= mainline["version"]:
        raise SnapshotConflict(
            f"publish of {branch!r} is not a fast-forward: staged head "
            f"v{head['version']} is not newer than mainline "
            f"v{mainline['version']} (already published, or mainline "
            "advanced past the staged run — restage on a fresh branch)"
        )
    # A newer head alone does not make a fast-forward: a mainline
    # commit interleaved BETWEEN staged commits (base v1, staged v2,
    # mainline v3, staged v4) leaves the head newest yet publishing
    # would silently overwrite v3 — the lost update this guard must
    # fail loudly on (Iceberg-style WAP publish semantics). Any
    # mainline commit newer than the branch base that is not itself a
    # publish OF THIS branch means mainline diverged from the staged
    # lineage.
    interlopers = [
        m["version"]
        for m in _list_manifests(root)
        if "branch" not in m
        and m["version"] > r["version"]
        and not (
            m.get("op") == "publish"
            and m.get("published_from", {}).get("branch") == branch
            and m["published_from"].get("branch_id", r.get("id"))
            == r.get("id")
        )
    ]
    if interlopers:
        raise SnapshotConflict(
            f"publish of {branch!r} would overwrite mainline: mainline "
            f"version(s) {interlopers} were committed after the branch "
            f"base v{r['version']} outside this branch's staged lineage "
            "— merge/restage on a fresh branch from current mainline"
        )
    payload = {
        k: v
        for k, v in head.items()
        if k not in _COMMIT_IDENTITY_KEYS
    }
    payload["published_from"] = {
        "branch": branch,
        "head_version": head["version"],
        **({"branch_id": r["id"]} if r.get("id") is not None else {}),
    }
    # expected_base closes the check-then-claim window (review r12):
    # a mainline commit landing between the interloper scan above and
    # the version claim would otherwise be silently overwritten — the
    # exact lost update the guard exists to fail loudly on. The
    # publish's read base is the mainline head it verified against.
    return _commit(
        root,
        head["data_dir"],
        "publish",
        payload,
        expected_base=mainline["version"] if mainline else 0,
    )

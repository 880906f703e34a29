"""Change-data-feed DataSource over the commit-log snapshot tables —
the Spark 4 Python DataSource API (``pyspark.sql.datasource``) wired
to :mod:`dex_data_ingestor_spark.snapshots`.

Reference scope: the reference pipelines poll a warehouse table and
re-derive "what changed since my bookmark" by timestamp column
(reference SqlDbEtl.py incremental SELECTs); a versioned table can
answer that exactly instead. This source exposes the snapshot log's
derived CDF (:func:`snapshots.snapshot_changes` semantics) through
Spark's own source contracts:

- ``spark.read.format("snapshot_cdf")`` — BOUNDED feed between two
  versions (Delta's ``table_changes``): options ``startingVersion``
  (first version whose changes are included, default 1 = everything,
  where version 1 diffs against empty) and ``endingVersion``
  (default: mainline latest).
- ``spark.readStream.format("snapshot_cdf")`` — CONTINUOUS feed:
  offsets are MAINLINE version numbers, each micro-batch carries the
  per-key changes of the versions committed since the last batch.
  ``startingVersion`` streams history first; default starts AFTER
  the mainline latest at stream start (only new commits). Offsets
  live in the stream checkpoint; version data dirs are immutable, so
  replaying a version range after a crash reproduces the batch
  byte-for-byte — exactly-once composes with any idempotent sink.

Output schema: the table's columns (NEW-side values; pre-image values
for deletes) + ``_change_type`` ('insert' | 'update' | 'delete') +
``_commit_version`` (the version whose commit produced the change).

Scale shape: planning touches only the manifest log, and only the
BATCH'S SLICE of it — version numbers are the filenames, so
latestOffset costs O(trailing branch commits) and partition planning
parses just the versions in (start, end] plus one predecessor, never
the table's whole history (a 10k-version merge table must not pay
10k JSON parses per trigger).
Each (version-step x key-bucket) becomes one input partition; the
executor diffs two file lists with an embedded DuckDB full-outer
join keyed NULL-safely, filtered to its bucket by a key hash both
sides share — N_BUCKETS-way parallel per version step, no Spark
shuffle at all (the join runs inside the scan). Buckets default to
:data:`DEFAULT_BUCKETS`; raise for big versions. Arrow batches flow
back through the DataSource arrow path (no per-row Python).

Branch-staged commits are INVISIBLE to the feed (mainline lineage
only) — same contract as ``snapshot_read``'s default resolve.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: key-hash fan-out per version step (one input partition per bucket)
DEFAULT_BUCKETS = 4

_CHANGE_COLS = ("_change_type", "_commit_version")


def _parquet_files(data_dir: str) -> list[str]:
    if not os.path.isdir(data_dir):
        return []
    return sorted(
        os.path.join(data_dir, n)
        for n in os.listdir(data_dir)
        if n.endswith(".parquet")
    )


def _version_files(m: dict) -> list[str]:
    """All of a version's data files: the primary dir plus any
    merge-on-read append dirs (snapshots.snapshot_append)."""
    return [
        f
        for d in [m["data_dir"], *(m.get("extra_dirs") or [])]
        for f in _parquet_files(d)
    ]


def _arrow_schema(files: list[str]):
    import pyarrow.parquet as pq

    return pq.ParquetFile(files[0]).schema_arrow


@dataclass
class _CdfPartition(InputPartition):
    """One (version step, key bucket) unit of CDF work. Carries
    everything read() needs — file LISTS (resolved driver-side from
    the manifests; empty old side = the first version, all inserts),
    key/compare column names, and the pickled Arrow schema the output
    batches are cast to."""

    old_files: list = field(default_factory=list)
    new_files: list = field(default_factory=list)
    #: deletion-vector sidecar files per side (merge-on-read deletes):
    #: (file, pos) rows subtracted from that side before diffing
    old_dv_files: list = field(default_factory=list)
    new_dv_files: list = field(default_factory=list)
    commit_version: int = 0
    bucket: int = 0
    n_buckets: int = 1
    keys: tuple = ()
    old_cols: tuple = ()
    new_cols: tuple = ()
    out_schema: object = None  # pyarrow.Schema of the table columns


def _q(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _bucket_expr(keys, n_buckets: int) -> str:
    parts = " || '|' || ".join(
        f"COALESCE(CAST({_q(k)} AS VARCHAR), chr(1))" for k in keys
    )
    return f"(hash({parts}) % {n_buckets})"


def _files_csv(files: list[str]) -> str:
    return ", ".join("'" + f.replace("'", "''") + "'" for f in files)


def _read_cdf_partition(p: _CdfPartition):
    """Executor-side: DuckDB full-outer diff of one bucket of one
    version step, yielded as Arrow record batches in the declared
    output schema. Stateless pure function of the partition. An empty
    old side (the first mainline version) degenerates to all-inserts;
    an empty new side (an empty-version commit) to all-deletes — the
    join path always has real files on both sides."""
    import duckdb
    import pyarrow as pa

    if not p.old_files and not p.new_files:
        return
    con = duckdb.connect()
    keys = list(p.keys)
    shared = [c for c in p.new_cols if c in p.old_cols and c not in keys]
    want = pa.schema(
        list(p.out_schema)
        + [
            pa.field("_change_type", pa.string()),
            pa.field("_commit_version", pa.int64()),
        ]
    )
    def live(files, dv_files, side_cols):
        """A side's LIVE rows in THIS partition's bucket: the file
        scan minus its deletion vectors (NOT EXISTS on basename +
        in-file row number — the DuckDB twin of
        snapshots._read_data's anti join). Bucketing hashes the key
        columns the side HAS; a side missing every key column (an
        evolved-in key: the join is then 'false', all rows
        insert/delete) falls back to row-number bucketing — any
        deterministic 1-of-n assignment gives coverage there."""
        side_keys = [k for k in keys if k in side_cols]
        bucket = (
            f"{_bucket_expr(side_keys, p.n_buckets)} = {p.bucket}"
            if side_keys
            else f"(file_row_number % {p.n_buckets}) = {p.bucket}"
        )
        src = (
            f"SELECT * FROM read_parquet([{_files_csv(files)}], "
            f"filename=true, file_row_number=true)"
        )
        anti = (
            f" AND NOT EXISTS ("
            f"SELECT 1 FROM read_parquet([{_files_csv(dv_files)}]) dv "
            f"WHERE dv.file = parse_filename(t.filename) "
            f"AND dv.pos = t.file_row_number)"
            if dv_files
            else ""
        )
        return (
            f"SELECT * EXCLUDE (filename, file_row_number) "
            f"FROM ({src}) t WHERE {bucket}{anti}"
        )

    if not p.old_files or not p.new_files:
        side_files = p.new_files or p.old_files
        side_dv = p.new_dv_files if p.new_files else p.old_dv_files
        side_cols = p.new_cols if p.new_files else p.old_cols
        ctype = "insert" if p.new_files else "delete"
        sel = ", ".join(
            (_q(c) if c in side_cols else f"NULL AS {_q(c)}")
            for c in p.out_schema.names
        )
        sql = f"""
        SELECT {sel}, '{ctype}' AS _change_type,
               {p.commit_version} AS _commit_version
        FROM ({live(side_files, side_dv, side_cols)})
        """
    else:
        # old side needs its keys + shared compare cols; a key column
        # the old schema lacks (evolved-in key) reads as NULL there —
        # NULL-safe equality then never matches it, so every old row
        # deletes and every new row inserts, matching Spark's evolved
        # read of the old version
        old_sel = [c for c in (*keys, *shared) if c in p.old_cols]
        on = " AND ".join(
            f"oj.{_q(k)} IS NOT DISTINCT FROM nj.{_q(k)}"
            if k in old_sel
            else "false"
            for k in keys
        )
        diff = " OR ".join(
            f"oj.{_q(c)} IS DISTINCT FROM nj.{_q(c)}" for c in shared
        ) or "false"
        out_cols = []
        for c in p.out_schema.names:
            new_v = f"nj.{_q(c)}" if c in p.new_cols else "NULL"
            old_v = f"oj.{_q(c)}" if c in old_sel else "NULL"
            out_cols.append(
                f"CASE WHEN nj.__n IS NULL THEN {old_v} "
                f"ELSE {new_v} END AS {_q(c)}"
            )
        sql = f"""
        WITH oj AS (
          SELECT {', '.join(_q(c) for c in old_sel)}, 1 AS __o
          FROM ({live(p.old_files, p.old_dv_files, p.old_cols)})
        ),
        nj AS (
          SELECT {', '.join(_q(c) for c in p.new_cols)}, 1 AS __n
          FROM ({live(p.new_files, p.new_dv_files, p.new_cols)})
        )
        SELECT
          {', '.join(out_cols)},
          CASE WHEN oj.__o IS NULL THEN 'insert'
               WHEN nj.__n IS NULL THEN 'delete'
               ELSE 'update' END AS _change_type,
          {p.commit_version} AS _commit_version
        FROM oj FULL OUTER JOIN nj ON {on}
        WHERE oj.__o IS NULL OR nj.__n IS NULL OR ({diff})
        """
    tbl = con.sql(sql).arrow()
    tbl = tbl.select([f.name for f in want]).cast(want)
    yield from tbl.to_batches(max_chunksize=1 << 16)


class _CdfPlanner:
    """Driver-side shared planning: mainline version walk, key
    resolution, partition construction."""

    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError(
                "snapshot_cdf requires .load(<table root>) or "
                "option('path', ...)"
            )
        self.n_buckets = int(options.get("buckets", DEFAULT_BUCKETS))
        if self.n_buckets < 1:
            raise ValueError(f"buckets must be >= 1: {self.n_buckets}")
        self.keys_opt = options.get("keys")
        self._keys_cache: list | None = None

    def latest_version(self) -> int:
        """Mainline latest WITHOUT parsing the whole log — O(trailing
        branch commits), the per-micro-batch cost of latestOffset on
        a long-lived table (a 10k-version merge table must not pay
        10k JSON parses per trigger)."""
        from dex_data_ingestor_spark import snapshots as S

        try:
            return S._resolve(self.root)["version"]
        except FileNotFoundError:
            return 0

    def mainline_range(self, start_v: int, end_v: int) -> list[dict]:
        """Mainline manifests with version <= ``end_v``, descending
        until one with version <= ``start_v`` is included (the first
        version step's predecessor), ascending on return. Parses only
        that slice of the log — version numbers ARE the filenames, so
        the batch's planning cost is O(batch versions + interleaved
        branch commits), not O(table history)."""
        from dex_data_ingestor_spark import snapshots as S

        out: list[dict] = []
        for n in reversed(S._manifest_names(self.root)):
            v = int(n.split(".")[0])
            if v > end_v:
                continue
            try:
                m = S._read_manifest(self.root, n)
            except ValueError:
                continue  # in-flight O_EXCL claim (trailing only)
            if "branch" in m:
                continue
            out.append(m)
            if v <= start_v:
                break
        return list(reversed(out))

    def keys(self, upper: int) -> list[str]:
        if self.keys_opt:
            return [k.strip() for k in self.keys_opt.split(",") if k.strip()]
        if self._keys_cache is not None:
            return self._keys_cache
        from dex_data_ingestor_spark import snapshots as S

        try:
            self._keys_cache = list(S.default_merge_keys(self.root, upper))
        except ValueError as e:
            raise ValueError(
                "snapshot_cdf: table records no MERGE key set; pass "
                "option('keys', 'k1,k2')"
            ) from e
        return self._keys_cache

    def table_arrow_schema(self, manifests: list[dict]):
        files = _version_files(manifests[-1])
        if not files:
            raise ValueError(
                f"latest mainline version of {self.root} has no "
                "parquet files"
            )
        return _arrow_schema(files)

    def spark_schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        latest = self.latest_version()
        if not latest:
            raise ValueError(
                f"no committed snapshots under {self.root}"
            )
        base = from_arrow_schema(
            self.table_arrow_schema(
                self.mainline_range(latest, latest)
            )
        )
        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_version", LongType(), False),
            ]
        )

    def step_partitions(
        self, manifests: list[dict], start_v: int, end_v: int
    ) -> list[_CdfPartition]:
        """Partitions for every mainline version v with
        start_v < v <= end_v, each diffed against its mainline
        PREDECESSOR (None for the first mainline version = all
        inserts), fanned out n_buckets ways. The output schema is the
        one AT end_v — commits landing after the batch's end offset
        must not drift the in-flight batch's schema."""
        upto = [m for m in manifests if m["version"] <= end_v]
        out_schema = self.table_arrow_schema(upto or manifests)
        keys = self.keys(end_v)
        missing = [k for k in keys if k not in out_schema.names]
        if missing:
            raise ValueError(
                f"key column(s) {missing} absent from the table "
                f"schema {out_schema.names}"
            )
        parts: list[_CdfPartition] = []
        for i, m in enumerate(manifests):
            v = m["version"]
            if not (start_v < v <= end_v):
                continue
            prev = manifests[i - 1] if i > 0 else None
            new_files = _version_files(m)
            old_files = _version_files(prev) if prev else []
            old_cols = (
                tuple(_arrow_schema(old_files).names) if old_files else ()
            )
            new_cols = (
                tuple(_arrow_schema(new_files).names)
                if new_files
                else tuple(out_schema.names)
            )

            def dv_files(mm) -> list:
                return [
                    f
                    for d in (mm.get("dv_dirs") or [])
                    for f in _parquet_files(d)
                ]

            for b in range(self.n_buckets):
                parts.append(
                    _CdfPartition(
                        old_files=old_files,
                        new_files=new_files,
                        old_dv_files=dv_files(prev) if prev else [],
                        new_dv_files=dv_files(m),
                        commit_version=v,
                        bucket=b,
                        n_buckets=self.n_buckets,
                        keys=tuple(keys),
                        old_cols=old_cols,
                        new_cols=new_cols,
                        out_schema=out_schema,
                    )
                )
        return parts


class SnapshotCdfBatchReader(DataSourceReader):
    def __init__(self, options):
        self.planner = _CdfPlanner(options)
        self.start = int(options.get("startingversion", 1))
        self.end = options.get("endingversion")

    def partitions(self):
        latest = self.planner.latest_version()
        if not latest:
            raise ValueError(
                f"no committed snapshots under {self.planner.root}"
            )
        end = int(self.end) if self.end is not None else latest
        return self.planner.step_partitions(
            self.planner.mainline_range(self.start - 1, end),
            self.start - 1,
            end,
        )

    def read(self, partition):
        return _read_cdf_partition(partition)


class SnapshotCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.planner = _CdfPlanner(options)
        self.starting = options.get("startingversion")

    def initialOffset(self) -> dict:
        if self.starting is not None:
            return {"version": int(self.starting) - 1}
        return {"version": self.planner.latest_version()}

    def latestOffset(self) -> dict:
        return {"version": self.planner.latest_version()}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        return self.planner.step_partitions(
            self.planner.mainline_range(lo, hi), lo, hi
        )

    def read(self, partition):
        return _read_cdf_partition(partition)

    def commit(self, end: dict) -> None:
        pass  # the log is immutable; nothing to release


class SnapshotCdfDataSource(DataSource):
    """``format("snapshot_cdf")`` — register once per session:

    >>> spark.dataSource.register(SnapshotCdfDataSource)
    """

    @classmethod
    def name(cls) -> str:
        return "snapshot_cdf"

    def schema(self) -> StructType:
        return _CdfPlanner(self.options).spark_schema()

    def reader(self, schema) -> DataSourceReader:
        return SnapshotCdfBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return SnapshotCdfStreamReader(self.options)

"""CSV / JSON line file sources with explicit schemas and drift
handling.

The reference's schemas are implicit in SQL column lists (SURVEY
§1.3); this engine declares them (schemas.py) and enforces them at the
source. Design rules, all 100 TB-motivated:

- **Never infer.** Schema inference reads the data twice and lets a
  malformed day silently retype a column for the whole job. Every
  reader takes an explicit ``StructType``.
- **PERMISSIVE + corrupt-record capture.** A bad row lands in
  ``_corrupt_record`` instead of failing the job or (worse) being
  dropped; the caller splits good/bad with :func:`split_corrupt` and
  quarantines the bad file-rows for replay. FAILFAST is opt-in for
  bootstrap loads where any corruption means a broken export.
- **Drift is explicit.** :func:`conform_to_schema` projects whatever
  arrived onto the declared schema: missing columns become typed
  NULLs, extra columns are dropped (optionally collected into an
  ``_extras`` JSON string for audit), and types are cast — the
  "schema-on-read with a contract" posture that keeps a 1000-file
  partition readable when one producer lags a schema version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    """The declared schema plus the corrupt-record capture column."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    out = StructType(schema.fields[:])
    return out.add(CORRUPT_COL, "string")


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    failfast: bool = False,
    **options: str,
) -> DataFrame:
    """CSV reader with declared schema and corrupt-row capture."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("mode", "FAILFAST" if failfast else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.schema(_with_corrupt(schema)).csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    failfast: bool = False,
    **options: str,
) -> DataFrame:
    """JSON-lines reader with declared schema and corrupt-row capture."""
    reader = (
        spark.read.option("mode", "FAILFAST" if failfast else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.schema(_with_corrupt(schema)).json(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the capture column, quarantine rows).

    Quarantine rows carry the raw record plus a ``_partial_parse``
    JSON of whatever fields did parse (audit/debug trail). Keeping the
    parsed columns referenced is also load-bearing: Spark refuses
    file-source queries whose referenced columns prune down to ONLY
    ``_corrupt_record`` (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN), so a corrupt-only projection would fail at the
    first count().
    """
    if CORRUPT_COL not in df.columns:
        return df, df.sparkSession.createDataFrame(
            [], f"{CORRUPT_COL} string, _partial_parse string"
        )
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    if not data_cols:
        raise ValueError(
            "split_corrupt needs at least one data column besides "
            f"{CORRUPT_COL!r}: a corrupt-only schema cannot pin the scan "
            "schema (and Spark rejects corrupt-only file-source queries)"
        )
    # Both filters must keep a data-column reference: under column
    # pruning (e.g. a bare count()) a corrupt-only reference set is
    # rejected by Spark for raw file sources, and the alternative the
    # docs offer — cache the whole parse — is not acceptable inside an
    # operator at 100 TB. The always-false disjunct only pins the scan
    # schema.
    pin = F.length(F.col(data_cols[0]).cast("string")) < F.lit(-1)
    clean = df.filter(F.col(CORRUPT_COL).isNull() | pin).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull() | pin).select(
        F.col(CORRUPT_COL),
        F.to_json(F.struct(*[F.col(c) for c in data_cols])).alias(
            "_partial_parse"
        ),
    )
    return clean, bad


def conform_to_schema(
    df: DataFrame,
    schema: StructType,
    keep_extras_json: bool = False,
) -> DataFrame:
    """Project an arbitrary DataFrame onto the declared schema.

    Missing columns -> typed NULLs; present columns -> cast to the
    declared type; extra columns -> dropped, or bundled into one
    ``_extras`` JSON string column when ``keep_extras_json`` (audit
    trail for producer drift). Pure narrow projection.
    """
    declared = {f.name: f for f in schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    if keep_extras_json:
        extras = [c for c in df.columns if c not in declared]
        if extras:
            cols.append(
                F.to_json(F.struct(*[F.col(c) for c in extras])).alias(
                    "_extras"
                )
            )
        else:
            cols.append(F.lit(None).cast("string").alias("_extras"))
    return df.select(*cols)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    """ORC reader (columnar alternate to parquet; same pushdown story).

    ORC is self-describing, so the schema is optional — when given it
    acts as a projection+cast contract (pair with
    :func:`conform_to_schema` for drift). Predicate pushdown and column
    pruning reach the ORC stripes exactly as they do parquet row
    groups, so the 100 TB scan posture is format-independent.
    """
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """ORC writer (zstd by default, matching the parquet write path)."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Spark's built-in ``binaryFile`` source: one row per file with
    (path, modificationTime, length, content) — the ingest source for
    multimodal corpora (images/audio/video as opaque payloads), feeding
    operators/multimodal.py's decode/stats/resize kernels directly.

    ``glob`` maps to pathGlobFilter (e.g. ``*.png``) and prunes at FILE
    LISTING time, before any read. ``max_bytes`` adds a length filter;
    binaryFile pushes length predicates into the listing too, so
    oversized media never reach an executor. At 100 TB the directory
    layout is the partition scheme (e.g. .../date=.../source=...), and
    listing-level pruning is the difference between scanning a shard
    and scanning an object store. Each file must fit in one task's
    memory (the source does not split files) — media that large should
    be chunk-encoded upstream instead.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df

"""Local differential harness mirroring the driver's DuckDB-oracle
compare: row count + column names + order-insensitive value equality.

Stricter than a hash compare where it matters: floats are compared
BITWISE (struct-packed), because any canonical value hash the driver
computes will agree iff the bits agree.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import struct

import duckdb


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    """Canonical hashable form of one value."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", struct.pack("<d", v))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, dt.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_canon(x) for x in v))
    return (type(v).__name__, str(v))


def _rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = {}
    for row in rows:
        key = tuple(_canon(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


#: Spark result types that survive the driver's type-aware value hash.
#: Decimals are deliberately ABSENT: they are the registry's internal
#: exactness vehicle, but at the result boundary Spark materializes
#: Decimal objects while DuckDB's decimal surfaces as float64 — r9's
#: q_incremental_agg went driver-red on exactly that (bitwise-equal
#: values, type-divergent hash; the decimal twin of r8's HUGEINT).
_PORTABLE_SPARK_TYPES = {
    "string", "bigint", "int", "smallint", "double", "float",
    "date", "timestamp", "timestamp_ntz", "boolean", "binary",
}


def _portable(dtype: str) -> bool:
    if dtype.startswith("array<") and dtype.endswith(">"):
        return _portable(dtype[6:-1])
    return dtype in _PORTABLE_SPARK_TYPES


def _scan_nonfinite(v) -> bool:
    """True if v is (or contains, for lists) a NaN or ±inf float. A
    non-finite double at the RESULT boundary is always a leaked
    undefined computation (the registry's NULLIF/guard discipline
    exists to prevent it) and is a cross-engine hash hazard: pandas
    materialization conflates NaN with SQL NULL, so the driver's hash
    and the local bitwise compare can disagree about what a NaN means.
    Swept registry-wide in r10: zero emitters — this keeps it zero."""
    if isinstance(v, float):
        return not math.isfinite(v)
    if isinstance(v, (list, tuple)):
        return any(_scan_nonfinite(x) for x in v)
    return False


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems = []
    for name, dtype in spark_df.dtypes:
        if not _portable(dtype):
            problems.append(
                f"non-portable spark result type: {name}: {dtype} "
                "(cast to double/bigint at the query boundary — "
                "NOTES.md rulebook)"
            )
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    for row in s_rows:
        bad = [
            s_cols[i] for i, v in enumerate(row) if _scan_nonfinite(v)
        ]
        if bad:
            problems.append(
                f"non-finite float at the result boundary in {bad} "
                "(guard the divide/log with NULLIF — NOTES.md rulebook)"
            )
            break
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    s_ms = _rows_to_multiset(s_cols, s_rows)
    d_ms = _rows_to_multiset(d_cols, d_rows)
    if s_ms != d_ms:
        only_s = {k: c for k, c in s_ms.items() if d_ms.get(k) != c}
        only_d = {k: c for k, c in d_ms.items() if s_ms.get(k) != c}
        sample_s = list(only_s.items())[:3]
        sample_d = list(only_d.items())[:3]
        problems.append(
            f"value mismatch: {len(only_s)} spark-only / {len(only_d)} "
            f"duck-only row-groups; spark sample={sample_s}; duck sample={sample_d}"
        )
    return problems

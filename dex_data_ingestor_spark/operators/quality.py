"""Data-quality checks as declarative violation queries.

The reference's only quality mechanism is skip-and-log inside loops
(reference: Bifrost.py:83-84,98-99). The engine inverts that: every
constraint is a DataFrame returning the VIOLATING rows — empty means
the constraint holds, non-empty is reportable/alertable, and the check
itself is a distributed plan (anti-join / grouped count), never a scan
on the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def violations_duplicate_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of duplicated primary keys (count > 1 per key)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def violations_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Rows violating NOT NULL on any of ``cols``."""
    cond = None
    for c in cols:
        x = F.col(c).isNull()
        cond = x if cond is None else (cond | x)
    return df.filter(cond)


def violations_ref_integrity(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: Sequence[str],
    dim_key: Sequence[str],
) -> DataFrame:
    """Fact rows whose dimension key is absent (left-anti join) — the
    rows the reference silently skipped."""
    cond = None
    for fk, dk in zip(fact_key, dim_key):
        x = fact[fk] == dim[dk]
        cond = x if cond is None else (cond & x)
    return fact.join(dim, cond, "left_anti")


def violations_range(
    df: DataFrame, col: str, lo=None, hi=None
) -> DataFrame:
    """Rows outside [lo, hi] (either bound optional)."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    return df.filter(cond)


def check_all(
    checks: dict[str, DataFrame], fail_fast: bool = False
) -> dict[str, int]:
    """Evaluate named violation queries -> violation counts. With
    ``fail_fast`` raises on the first non-empty violation set."""
    results: dict[str, int] = {}
    for name, viol in checks.items():
        n = viol.count()
        results[name] = n
        if fail_fast and n:
            raise AssertionError(f"data-quality check failed: {name} ({n} rows)")
    return results

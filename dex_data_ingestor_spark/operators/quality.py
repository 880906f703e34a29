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
    """Rows violating NOT NULL on any of ``cols``. An empty column
    list is a misconfigured check — rejected by name rather than left
    to surface as ``df.filter(None)``'s opaque TypeError."""
    if not cols:
        raise ValueError("violations_null: empty column list")
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


def profile_columns(
    df: DataFrame,
    cols: Sequence,
    approx_distinct: bool = False,
) -> DataFrame:
    """One-pass ANALYZE-style table profile, one output row per column:
    (col_name, n_rows, n_nonnull, n_distinct, min_value, max_value).

    ``cols`` entries are column names or ``(name, Column)`` pairs (use a
    pair to pre-cast, e.g. double -> decimal, so min/max render
    identically everywhere). min/max compare in the NATIVE type and are
    cast to string only afterwards — casting first would compare
    lexically.

    Scale: one aggregate job. With exact distincts Catalyst plans an
    Expand (input ×(n_cols+1) through the shuffle) — the oracle-checked
    form; pass ``approx_distinct=True`` for the 100 TB profile (HLL++,
    no Expand, one pass).
    """
    pairs = [(c, F.col(c)) if isinstance(c, str) else c for c in cols]
    nd = (
        (lambda e: F.approx_count_distinct(e))
        if approx_distinct
        else (lambda e: F.count_distinct(e))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, expr in pairs:
        aggs += [
            F.count(expr).alias(f"__nn_{name}"),
            nd(expr).alias(f"__nd_{name}"),
            F.min(expr).cast("string").alias(f"__mn_{name}"),
            F.max(expr).cast("string").alias(f"__mx_{name}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{name}").alias("n_nonnull"),
                F.col(f"__nd_{name}").alias("n_distinct"),
                F.col(f"__mn_{name}").alias("min_value"),
                F.col(f"__mx_{name}").alias("max_value"),
            )
            for name, _ in pairs
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")

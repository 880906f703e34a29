"""Surrogate-key strategies for dimensions.

The reference relies on MySQL AUTO_INCREMENT plus a per-row readback
(``SELECT id ... WHERE chain_id=%s AND address=%s``, reference:
Bifrost.py:127-130, Hydration.py:66-69, Stellar.py:96-99) — inherently
serial and nondeterministic. Distributed replacements (SURVEY.md
§7.3-2):

- hash surrogate: ``xxhash64(natural key)`` — embarrassingly parallel,
  stable across runs and clusters; the production choice at 100 TB
  (collision probability over 64 bits is negligible at dimension
  cardinalities).
- dense surrogate: ``dense_rank`` over the natural key — compact ids,
  reproducible by any engine that can sort (what the DuckDB oracle
  checks); the global window is fine for dimension-sized data but is
  NOT for fact-sized data (documented trade-off).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def surrogate_key_hash(
    df: DataFrame, natural_key: Sequence[str], out_col: str = "id"
) -> DataFrame:
    """Deterministic 64-bit hash surrogate over the natural key.

    NULL key components are rejected LOUDLY: Spark's multi-column
    xxhash64 SKIPS null children (the running hash passes through
    unchanged), so natural keys that differ only in WHICH component is
    NULL — (NULL, "x") vs ("x", NULL) vs ("x" with the other column
    absent) — collide deterministically, silently merging distinct
    dimension members. The 64-bit negligible-collision argument only
    holds over non-null components, so the domain is enforced here
    (the packed_tick_order posture); callers with legitimately
    nullable key parts must coalesce to an explicit sentinel first,
    choosing their own encoding."""
    cols = [F.col(c) for c in natural_key]
    non_null = cols[0].isNotNull()
    for c in cols[1:]:
        non_null = non_null & c.isNotNull()
    guard = F.assert_true(
        non_null,
        F.concat(
            F.lit(
                "surrogate_key_hash: NULL in natural key "
                f"{list(natural_key)} (xxhash64 skips null children; "
                "distinct keys differing only in the null slot would "
                "collide): "
            ),
            *[
                F.coalesce(c.cast("string"), F.lit("NULL"))
                for c in cols
            ],
        ),
    )
    return df.withColumn(
        out_col,
        F.xxhash64(*cols)
        + F.coalesce(guard.cast("bigint"), F.lit(0).cast("bigint")),
    )


def surrogate_key_dense(
    df: DataFrame, natural_key: Sequence[str], out_col: str = "id"
) -> DataFrame:
    """Dense 1..N surrogate via ``dense_rank`` over the natural key.

    Single-partition window — use only for dimension-cardinality data.
    """
    w = Window.orderBy(*[F.col(c) for c in natural_key])
    return df.withColumn(out_col, F.dense_rank().over(w).cast("bigint"))

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
    """Deterministic 64-bit hash surrogate over the natural key."""
    return df.withColumn(out_col, F.xxhash64(*[F.col(c) for c in natural_key]))


def surrogate_key_dense(
    df: DataFrame, natural_key: Sequence[str], out_col: str = "id"
) -> DataFrame:
    """Dense 1..N surrogate via ``dense_rank`` over the natural key.

    Single-partition window — use only for dimension-cardinality data.
    """
    w = Window.orderBy(*[F.col(c) for c in natural_key])
    return df.withColumn(out_col, F.dense_rank().over(w).cast("bigint"))

"""Deterministic first-wins deduplication.

The reference keeps the first occurrence per key within a batch using
Python ``set`` bookkeeping (reference: Stellar.py:39,83,175,179,
Hydration.py:47,53,155,159, SqlDbEtl.py:192,205) — an order that
depends on MySQL scan order and is therefore unspecified. The engine
pins the order explicitly (SURVEY.md §7.3-3): "first" means first by
``order_by``, ties broken by the tiebreaker columns, implemented as a
rank window — shuffle on the key columns only, no global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def dedup_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per ``keys``: the first under ``order_by``.

    ``order_by`` must be a total order within each key group (include a
    unique tiebreaker column) or the result is nondeterministic — the
    precise failure the reference has and this engine removes.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

"""Skew-mitigation utilities for 100 TB joins/aggregations.

AQE's skew-join splitting handles most runtime skew; salting is the
explicit tool when one side of a shuffle join has pathological hot keys
(a handful of tokens carrying most volume is the norm in DEX data).

``salted_join`` replicates the small side R times and scatters the big
side's hot keys across R salt buckets: the shuffle for a hot key fans
out over R reducers instead of one. Correctness is unchanged for equi-
joins (each big-side row meets exactly one replica of its key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys (big side scattered, small side
    replicated ``salt_buckets``-fold). Use when the big side's key
    distribution is heavily skewed and the small side is too large to
    broadcast outright.

    Only ``inner`` and ``left`` joins are supported: replicating the
    small side is transparent for those (each big-side row meets
    exactly one replica of its key), but for right/full joins an
    unmatched small-side row would be emitted once per salt bucket.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "right/full would duplicate unmatched replicated small-side rows"
        )
    big_salted = big.withColumn(
        "__salt", (F.xxhash64(*[F.col(c) for c in on], F.monotonically_increasing_id()) % salt_buckets + salt_buckets) % salt_buckets
    )
    replicas = F.explode(
        F.array(*[F.lit(i) for i in range(salt_buckets)])
    ).alias("__salt")
    small_replicated = small.select("*", replicas)
    joined = big_salted.join(small_replicated, [*on, "__salt"], how)
    return joined.drop("__salt")


def explain_shuffle_partitions(df: DataFrame) -> int:
    """Count exchanges in the physical plan — a quick shuffle audit for
    tests and plan reviews."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    return plan.count("Exchange")


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation for pathologically hot group keys:
    stage 1 aggregates on (keys + salt) so a hot key's rows spread over
    ``salt_buckets`` reducers; stage 2 combines the per-salt partials
    on the true keys (tiny input: |groups| x salt_buckets rows).

    Emits ``n`` (count) and ``sum_<value_col>`` (decimal(18,6)-exact
    sum surfaced as double) — both exactly associative, so the result
    is bit-identical to the plain one-stage groupBy regardless of how
    rows scatter across salts.

    Note Spark's hash aggregate already does map-side partial
    aggregation, which covers MOST hot-key cases; explicit salting is
    for when the reduce-side per-key state itself is the bottleneck
    (e.g. very few distinct keys, so map partials still all land on
    one reducer)."""
    salt = (
        F.xxhash64(F.monotonically_increasing_id()) % salt_buckets
        + salt_buckets
    ) % salt_buckets
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__s"),
        )
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("__n").alias("n"),
            F.sum("__s").cast("double").alias(f"sum_{value_col}"),
        )
    )

"""Sketch / approximate-aggregate operators.

Spark's built-ins (approx_count_distinct HLL++, approx_percentile
t-digest) are the production defaults but their estimates are
implementation-specific — unverifiable against another engine. This
module adds a KMV (k-minimum-values) distinct-count sketch built on the
engine's portable md5-int64 hash: deterministic, mergeable, and
bit-reproducible anywhere the hash is (the property the oracle-checked
testbed needs).

KMV: with h uniform on [0, M), the k-th smallest hash m of the value
set estimates density k/m, so |S| ~= (k - 1) * M / m. Exact (observed
count) when the set is smaller than k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dex_data_ingestor_spark.functions.scalars import md5_int64, round_ieee

#: Hash domain of md5_int64 (first 8 hex chars -> 32 bits).
KMV_DOMAIN = 2**32


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 64,
    group_by: list[str] | None = None,
) -> DataFrame:
    """KMV distinct-count estimate, optionally per group.

    Output: group cols + ``kth_min_hash`` (null when the group has
    fewer than k distinct values) + ``est_distinct`` (double, rounded
    6 dp). Grouped: one shuffle — the rank window partitions on the
    group keys and the following group-aggregate reuses that
    partitioning. Ungrouped: a single distributed top-k (TakeOrdered,
    per-partition bounded heaps) over the deduped hashes — NOT a
    global window, which would sort every distinct hash through one
    task (distinct values of a fact column are unbounded, so the
    bounded-input exemption the repo's global-window audit allows
    does not apply here), and no second counting pass: when the top-k
    is unsaturated its row count equals the distinct count exactly.

    NULLs are not values: a NULL input hashes to NULL, which Spark's
    ascending window ranks FIRST (shifting every real rank by one —
    the k-th slot silently holds the (k-1)-th smallest hash) while
    DuckDB ranks it LAST; filtering is both the correct DISTINCT-count
    semantics and the only cross-engine-stable choice. The hash input
    is the value's string rendering (cast inside, like countmin_table,
    so non-string columns work and every call site hashes the same
    rendering).
    """
    keys = group_by or []
    hashed = (
        df.filter(F.col(col).isNotNull())
        .select(
            *[F.col(c) for c in keys],
            md5_int64(F.col(col).cast("string")).alias("__h"),
        )
        .distinct()
    )
    if keys:
        w = Window.partitionBy(*keys).orderBy("__h")
        ranked = hashed.withColumn("__rn", F.row_number().over(w))
        agg = ranked.groupBy(*[F.col(c) for c in keys]).agg(
            F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias(
                "kth_min_hash"
            ),
            F.count(F.lit(1)).alias("__n"),
        )
    else:
        # ONE branch, one scan, one distinct exchange: the separate
        # global count the previous form cross-joined in was redundant
        # — TakeOrdered(limit=k) returns ALL distinct hashes whenever
        # there are fewer than k, so the top-k's own row count IS the
        # exact distinct count in precisely the regime where the
        # estimator falls back to it (kth_min_hash null). When the
        # top-k saturates (__kn == k), the estimate never reads __n.
        topk = hashed.orderBy("__h").limit(k)
        agg = topk.agg(
            F.max("__h").alias("__maxk"),
            F.count(F.lit(1)).alias("__kn"),
        ).select(
            F.when(F.col("__kn") == k, F.col("__maxk")).alias(
                "kth_min_hash"
            ),
            F.col("__kn").alias("__n"),
        )
    est = F.when(
        F.col("kth_min_hash").isNotNull(),
        (F.lit(float(k - 1)) * F.lit(float(KMV_DOMAIN)))
        / F.col("kth_min_hash").cast("double"),
    ).otherwise(F.col("__n").cast("double"))
    return agg.select(
        *[F.col(c) for c in keys],
        "kth_min_hash",
        round_ieee(est, 6).alias("est_distinct"),
    )


def countmin_table(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-min sketch of an item column as its (i, bucket, cnt) table.

    Each of the ``depth`` salted md5 hashes maps every item into
    ``width`` buckets; the sketch is the per-(row, bucket) count table —
    ``depth * width`` cells regardless of item cardinality, and
    MERGEABLE by cellwise addition (union two sketches = union their
    count tables and re-sum), which is what makes it a per-partition /
    per-day rollup structure at 100 TB. Estimates only ever
    over-count (collisions), never under.
    """
    e = df.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).cast("string").alias("item"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i"),
    )
    bucket = (
        md5_int64(
            F.concat(F.col("i").cast("string"), F.lit("|"), F.col("item"))
        )
        % width
    )
    return e.groupBy("i", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def countmin_estimates(
    cms: DataFrame,
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-query the sketch for each row of ``items``: the estimate is
    the MIN over the depth rows of the probed bucket counts, where an
    untouched bucket counts as 0 — so an item absent from the sketched
    data estimates 0 (left join; an inner join would drop the item or
    min over only its colliding buckets). Output: (item, est)."""
    probes = items.select(
        F.col(item_col).cast("string").alias("item"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i"),
    )
    bucket = (
        md5_int64(
            F.concat(F.col("i").cast("string"), F.lit("|"), F.col("item"))
        )
        % width
    )
    return (
        probes.select("item", "i", bucket.alias("bucket"))
        .join(cms, ["i", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )

"""Explicit broadcast Bloom-filter semi-join pruning.

Spark's own runtime bloom filter (InjectRuntimeFilter,
``spark.sql.optimizer.runtime.bloomFilter.enabled``) rewrites
shuffle joins into bloom-pruned scans automatically — but ONLY when
the application-side join key traces down to a SCAN column through
simple projections/filters. Keys born inside a Generate (the gram /
window explodes of the corpus operators) have no scan lineage, so
the optimizer never injects there; tests/test_plans_physical.py
asserts both halves of that boundary. This module is the explicit
counterpart for exactly those plans: build a Bloom bitmap of the
SMALL side's keys fully distributed, broadcast it as one row, and
prefilter the BIG side before its first wide operation (distinct /
shuffle / join).

Semantics: the prefilter is a SUPERSET filter — every true match
passes, false positives pass at the configured rate and are removed
by the exact join that follows, so any (prefilter -> exact join)
composition returns bit-identical results to the exact join alone.
That is what makes the operator safe to drop into oracle-checked
pipelines.

Scale posture (100 TB): the bitmap is O(num_bits) regardless of data
volume — 2^20 bits = 128 KiB rides one broadcast row, while the big
side's non-matching keys (the overwhelming majority in a
contamination sweep) die BEFORE the gram-keyed shuffle instead of
after it. Nothing is collected to the driver: the bitmap words are
aggregated with bit_or and densified into a one-row array<long>
column through a spark.range spine join, so the whole build is
narrow stages plus one tiny word-keyed shuffle. False-positive rate
for n keys is the Bloom bound (1 - e^(-k*n/m))^k up to the
double-hashing caveat in _bit_positions — at the 2^20/5 defaults,
~1.2% at n = 100k keys; size num_bits to ~10 bits/key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 5


def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of a key via Kirsch-Mitzenmacher double
    hashing over ONE xxhash64 evaluation: the 64-bit hash splits into
    h1 (low 32 bits) and h2 (high 32 bits, forced odd), and
    pos_i = pmod(h1 + i*h2, m). This is the standard practical Bloom
    scheme (Guava's BloomFilter uses the same construction) — the k
    positions are NOT independent hash functions: two keys that
    collide on the base 64-bit hash collide at ALL k positions, so
    the textbook (1 - e^(-k*n/m))^k false-positive formula holds only
    up to the base-collision rate (~n^2 / 2^64 — negligible at any n
    a broadcastable bitmap can serve). One hash evaluation per key
    instead of k keeps the probe side cheap."""
    h = F.xxhash64(key)
    h1 = h.bitwiseAND(F.lit((1 << 32) - 1))
    h2 = F.shiftrightunsigned(h, 32).bitwiseOR(F.lit(1))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_bitmap(
    df: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Build the Bloom bitmap of ``df[key_col]`` as a ONE-ROW DataFrame
    ``(bitmap: array<long>)`` of exactly ``num_bits / 64`` words.

    Fully distributed: explode each key to its k bit positions, fold
    bits into words with bit_or (one shuffle keyed on the word index,
    at most num_bits/64 groups), then densify the sparse words into a
    fixed-length array inside the final one-row aggregation. DENSE
    array, not a map, on purpose: Spark's ``element_at`` on a map is a
    LINEAR SCAN of the entries (ArrayBasedMapData has no hash index),
    so probing a 2^20-bit map cost O(num_bits/64) per probe and made
    the prefilter slower than the join it was saving; array
    ``element_at`` is O(1). The densification's own map lookups run
    once per word slot at build time, not per probed row. NULL keys
    are skipped (they can never equi-join anyway).
    """
    if num_bits < 64 or num_bits & (num_bits - 1):
        raise ValueError(f"num_bits must be a power of two >= 64: {num_bits}")
    if not 1 <= num_hashes <= 16:
        raise ValueError(f"num_hashes out of range [1, 16]: {num_hashes}")
    key = F.col(key_col)
    bits = (
        df.filter(key.isNotNull())
        .select(
            F.explode(F.array(*_bit_positions(key, num_bits, num_hashes)))
            .alias("bit")
        )
    )
    words = bits.groupBy(F.shiftright("bit", 6).alias("w")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(bit % 64 AS INT))")).alias(
            "word"
        )
    )
    # Densify WITHOUT a map: a spark.range spine left-joins the sparse
    # words (zero-filling the gaps), then one collect_list + array_sort
    # orders the slots — O(num_bits/64 log) total. The tempting
    # transform(sequence, i -> element_at(map, i)) form is O((m/64)^2)
    # because each map element_at is a linear scan: measured 19.7 s of
    # the 2^20-bit build at sf0.1, vs ~1 s for this spine join.
    zero = F.lit(0).cast("long")
    spine = df.sparkSession.range(num_bits // 64).select(
        F.col("id").alias("w")
    )
    dense_rows = spine.join(F.broadcast(words), "w", "left").select(
        "w", F.coalesce(F.col("word"), zero).alias("word")
    )
    return dense_rows.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "word"))),
            lambda s: s["word"],
        ).alias("bitmap")
    )


def bloom_member_expr_from_hash(
    h64: Column,
    bitmap: Column,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Might-be-member test given the key's PRE-COMPUTED xxhash64
    value. This is the form to use inside higher-order-function
    lambdas, where expressions run INTERPRETED with no common-
    subexpression elimination: hash the keys once with
    ``F.transform(keys, lambda k: F.xxhash64(k))`` and probe the
    hash array — ``h64`` is then a bound lambda variable, so its
    many references here are O(1) lookups, not re-hashes. bit_get
    does the variable-position bit test (shiftleft/shiftright masks
    would need literal shift amounts)."""
    h1 = h64.bitwiseAND(F.lit((1 << 32) - 1))
    h2 = F.shiftrightunsigned(h64, 32).bitwiseOR(F.lit(1))
    cond = F.lit(True)
    for i in range(num_hashes):
        bit = F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits))
        word = F.element_at(
            bitmap, (F.shiftright(bit, 6) + 1).cast("int")
        )
        cond = cond & (F.bit_get(word, F.pmod(bit, F.lit(64))) == 1)
    return cond


def bloom_member_expr(
    key: Column,
    bitmap: Column,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Boolean might-be-member test of ``key`` against a dense
    ``array<long>`` bitmap column — a pure Column expression (no
    column-name references, no F.expr). The xxhash64(key) subtree is
    textually repeated across the probes, which whole-stage codegen
    de-duplicates in ordinary projections/filters (the
    bloom_prefilter path); inside HOF lambdas there is NO codegen or
    CSE, so use :func:`bloom_member_expr_from_hash` over a
    pre-hashed array there instead."""
    return bloom_member_expr_from_hash(
        F.xxhash64(key), bitmap, num_bits, num_hashes
    )


def bloom_prefilter(
    big: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Keep only ``big`` rows whose key MIGHT be in the bitmap's key
    set (same num_bits/num_hashes as the build, or the test is
    meaningless). Superset semantics: all true members pass; follow
    with the exact join. NULL keys are dropped (NULL never
    equi-joins). The bitmap attaches as a broadcast one-row cross
    join — no shuffle on the big side."""
    probed = big.filter(F.col(key_col).isNotNull()).join(
        F.broadcast(bitmap.select(F.struct("bitmap").alias("__bloom__")))
    )
    cond = bloom_member_expr(
        F.col(key_col), F.col("__bloom__.bitmap"), num_bits, num_hashes
    )
    return probed.filter(cond).drop("__bloom__")

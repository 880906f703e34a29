"""Bloom-filter join pruning: the explicit broadcast operator
(operators/bloom.py) and both halves of Spark's native
InjectRuntimeFilter boundary it exists to complement."""

import pytest
from pyspark.sql import functions as F

from dex_data_ingestor_spark.io import load_table
from dex_data_ingestor_spark.operators.bloom import (
    bloom_bitmap,
    bloom_prefilter,
)


def _grams(spark, sf_dir):
    from dex_data_ingestor_spark.operators.corpus import (
        corpus_gram_buckets,
    )

    docs = load_table(spark, sf_dir, "documents")
    return corpus_gram_buckets(docs).withColumnRenamed("bucket", "__b")


def test_prefilter_is_superset_and_join_exact(spark, sf_dir):
    """Every true member passes the prefilter, and the exact join
    after pruning returns the same key set as without it."""
    g = _grams(spark, sf_dir)
    small = g.filter(F.col("__b") >= 90).select("gram").distinct()
    big = g.filter(F.col("__b") < 80).select("gram")

    bm = bloom_bitmap(small, "gram")
    kept = bloom_prefilter(big, bm, "gram")

    true_members = {
        r.gram for r in big.join(small, "gram", "left_semi").collect()
    }
    kept_set = {r.gram for r in kept.select("gram").distinct().collect()}
    assert true_members <= kept_set  # superset: no true match lost
    after = {
        r.gram for r in kept.join(small, "gram", "left_semi").collect()
    }
    assert after == true_members  # exact join removes false positives


def test_prefilter_reduces_rows_materially(spark, sf_dir):
    g = _grams(spark, sf_dir)
    small = g.filter(F.col("__b") >= 90).select("gram").distinct()
    big = g.filter(F.col("__b") < 80).select("gram")
    bm = bloom_bitmap(small, "gram")
    n_all = big.count()
    n_kept = bloom_prefilter(big, bm, "gram").count()
    assert n_kept < n_all / 2  # the point of the operator


def test_empty_and_null_keys(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), (None,)], "k string"
    )
    empty_bm = bloom_bitmap(df.filter(F.lit(False)), "k")
    assert bloom_prefilter(df, empty_bm, "k").count() == 0
    bm = bloom_bitmap(df, "k")  # null key skipped in build
    kept = {r.k for r in bloom_prefilter(df, bm, "k").collect()}
    assert kept == {"a", "b"}  # null rows dropped on probe side too


def test_parameter_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        bloom_bitmap(df, "k", num_bits=1000)  # not a power of two
    with pytest.raises(ValueError):
        bloom_bitmap(df, "k", num_hashes=0)


def test_contamination_bloom_prune_bit_identical(spark, sf_dir):
    from dex_data_ingestor_spark.operators.corpus import (
        contamination_by_lang,
    )

    docs = load_table(spark, sf_dir, "documents")
    exact = {tuple(r) for r in contamination_by_lang(docs).collect()}
    pruned = {
        tuple(r)
        for r in contamination_by_lang(docs, bloom_prune=True).collect()
    }
    assert exact == pruned


def test_native_runtime_bloom_injects_on_scan_lineage_join(spark, sf_dir):
    """Spark DOES inject its runtime bloom filter when the application
    side key is a scan column: the 100 TB default posture for
    fact-dim shuffle joins (no explicit operator needed there)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_native_runtime_bloom_cannot_inject_through_generate(spark, sf_dir):
    """The boundary operators/bloom.py exists for: a join key born
    inside a Generate (gram explode) has no scan lineage, so
    InjectRuntimeFilter leaves the plan alone even with thresholds
    forced to zero — pruning there must be explicit."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        g = _grams(spark, sf_dir)
        small = g.filter(F.col("__b") >= 90).select("gram").distinct()
        big = g.filter(F.col("__b") < 80).select("gram")
        j = big.join(small, "gram").groupBy("gram").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" not in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bloom_no_false_negatives_property(spark):
    """Hypothesis: for arbitrary key sets and configs, every built key
    passes its own membership test — the Bloom invariant the
    prefilter's superset semantics rest on."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        keys=st.lists(
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
                min_size=0,
                max_size=40,
            ),
            min_size=1,
            max_size=30,
        ),
        num_bits=st.sampled_from([64, 1024, 1 << 16]),
        num_hashes=st.integers(min_value=1, max_value=8),
    )
    def check(keys, num_bits, num_hashes):
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        bm = bloom_bitmap(df, "k", num_bits, num_hashes)
        kept = {
            r.k
            for r in bloom_prefilter(
                df, bm, "k", num_bits, num_hashes
            ).collect()
        }
        assert kept == set(keys)  # no false negative, ever

    check()

"""Bucketed co-located join: pre-shuffle both fact tables into the
same bucket layout so the join needs NO exchange — the 100 TB strategy
for repeated fact-fact joins (SURVEY §7.3-7 'cluster by entity key').
API under test: dex_data_ingestor_spark/bucketing.py."""

import pytest
from pyspark.sql import functions as F

from dex_data_ingestor_spark.bucketing import (
    colocated_join,
    exchange_count,
    write_bucketed,
)
from dex_data_ingestor_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("bucketed_wh"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(
        li, "b_lineitem", ["l_orderkey"], buckets=8,
        path=f"{warehouse}/b_lineitem",
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", ["l_orderkey"], buckets=8,
        path=f"{warehouse}/b_orders",
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    # disable auto-broadcast so the fact-fact (100 TB) strategy shows:
    # with co-located buckets the sort-merge join needs NO shuffle.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, t1, t2, ["l_orderkey"])
        joined.count()
        plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan, plan
        assert exchange_count(joined) == 0, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_shuffles_both_sides(spark, sf_dir):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        joined = orders.join(li, orders.o_orderkey == li.l_orderkey)
        joined.count()
        # the layout is what removes the exchanges, not the data size
        assert exchange_count(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_skips_exchange(spark, bucketed_tables):
    t1, _ = bucketed_tables
    agg = spark.table(t1).groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    agg.count()
    assert exchange_count(agg) == 0, (
        "pre-bucketed groupBy on the bucket key must not shuffle"
    )


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    t1, t2 = bucketed_tables
    bucketed_count = colocated_join(spark, t1, t2, ["l_orderkey"]).count()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    assert bucketed_count == li.join(orders, "l_orderkey").count()

"""Physical-plan tests: bucketed layout removes the join shuffle."""

import pytest

from dex_data_ingestor_spark.bucketing import (
    colocated_join,
    exchange_count,
    write_bucketed,
)
from dex_data_ingestor_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "bkt_orders", ["orderkey"], buckets=8,
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "bkt_lineitem", ["orderkey"], buckets=8,
    )
    yield "bkt_orders", "bkt_lineitem"
    for t in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, ["orderkey"])
        n = joined.count()
        assert n == spark.table(right).count()  # every lineitem matches
        assert exchange_count(joined) == 0, (
            "bucketed join must not shuffle either side"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_shuffles_both_sides(spark, sf_dir):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        joined = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        joined.count()
        assert exchange_count(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_skips_exchange(spark, bucketed_tables):
    _, right = bucketed_tables
    agg = spark.table(right).groupBy("orderkey").count()
    agg.count()
    assert exchange_count(agg) == 0, (
        "pre-bucketed groupBy on the bucket key must not shuffle"
    )

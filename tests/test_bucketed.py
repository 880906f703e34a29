"""Bucketed co-located join: pre-shuffle both fact tables into the
same bucket layout so the join needs NO exchange — the 100 TB strategy
for repeated fact-fact joins (SURVEY §7.3-7 'cluster by entity key')."""

import pytest
from pyspark.sql import functions as F

from dex_data_ingestor_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("bucketed_wh"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    (
        li.write.mode("overwrite")
        .option("path", f"{warehouse}/b_lineitem")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite")
        .option("path", f"{warehouse}/b_orders")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_orders")
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
        joined = spark.table(t1).join(spark.table(t2), "l_orderkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "hashpartitioning" not in plan, plan  # zero shuffle exchanges
    assert "Bucketed: true" in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    t1, t2 = bucketed_tables
    bucketed_count = (
        spark.table(t1).join(spark.table(t2), "l_orderkey").count()
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    assert bucketed_count == li.join(orders, "l_orderkey").count()

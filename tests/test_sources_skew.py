"""Source-config plumbing and skew utilities."""

from pyspark.sql import functions as F

from dex_data_ingestor_spark.io import load_table
from dex_data_ingestor_spark.operators.skew import salted_join
from dex_data_ingestor_spark.sources.config import MultiEnvConfig

INI = """
[database]
user = svc
password = secret

[remote]
host = raw.example
port = 3306
database = queryweb3

[local]
host = wh.example
port = 3307
database = queryweb3_front
"""


def test_multi_env_overlay():
    cfg = MultiEnvConfig.from_string(INI)
    remote = cfg.env("remote")
    local = cfg.env("local")
    assert remote["user"] == local["user"] == "svc"
    assert remote["host"] == "raw.example" and local["host"] == "wh.example"
    assert cfg.jdbc_url("local") == "jdbc:mysql://wh.example:3307/queryweb3_front"


def test_jdbc_reader_builds(spark):
    """Option plumbing only (no live DB): reader builds and carries a
    partitioned range scan config."""
    from dex_data_ingestor_spark.sources.jdbc import (
        jdbc_incremental_reader,
        jdbc_reader,
    )

    r = jdbc_reader(
        spark,
        "jdbc:mysql://example:3306/db",
        "pool_data",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1000,
    )
    assert r is not None
    r2 = jdbc_incremental_reader(
        spark,
        "jdbc:mysql://example:3306/db",
        "pool_data",
        "created_at",
        "2024-01-01",
        "2024-02-01",
        columns=["id", "created_at"],
    )
    assert r2 is not None


def test_jdbc_incremental_rejects_unsafe_sql(spark):
    """Identifiers and bounds are validated, not interpolated raw
    (ADVICE r01: injection via table/ts_col/lo/hi)."""
    import datetime as dt

    import pytest

    from dex_data_ingestor_spark.sources.jdbc import jdbc_incremental_reader

    url = "jdbc:mysql://example:3306/db"
    with pytest.raises(ValueError):
        jdbc_incremental_reader(
            spark, url, "pool_data; DROP TABLE x", "created_at", "2024-01-01", "2024-02-01"
        )
    with pytest.raises(ValueError):
        jdbc_incremental_reader(
            spark, url, "pool_data", "created_at' OR '1'='1", "2024-01-01", "2024-02-01"
        )
    with pytest.raises(ValueError):
        jdbc_incremental_reader(
            spark, url, "pool_data", "created_at", "2024-01-01' OR 'a'='a", "2024-02-01"
        )
    with pytest.raises(ValueError):
        jdbc_incremental_reader(
            spark, url, "pool_data", "created_at", "2024-01-01",
            "2024-02-01", columns=["id", "created_at, (SELECT 1)"],
        )
    # Typed datetime bounds render fine.
    r = jdbc_incremental_reader(
        spark, url, "db2.pool_data", "created_at",
        dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1),
    )
    assert r is not None


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    plain = li.join(supp, "l_suppkey").groupBy("l_suppkey").count()
    salted = (
        salted_join(li, supp, ["l_suppkey"], salt_buckets=8)
        .groupBy("l_suppkey")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_rejects_outer(spark, sf_dir):
    """right/full would emit unmatched small-side rows once per salt
    bucket (ADVICE r01) — rejected up front."""
    import pytest

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(li, supp, ["l_suppkey"], salt_buckets=4, how=how)


def test_salted_sum_count_matches_plain_agg_and_adds_salt_stage(spark):
    """salted_sum_count == plain groupBy (bit-exact, associative aggs)
    and the physical plan really has the extra salt-stage exchange."""
    from dex_data_ingestor_spark.operators.skew import (
        explain_shuffle_partitions,
        salted_sum_count,
    )

    rows = [(("hot" if i % 10 else "cold"), float(i) / 7) for i in range(5000)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r.k: (r.n, r.sum_v)
        for r in salted_sum_count(df, ["k"], "v", salt_buckets=8).collect()
    }
    want = {
        r.k: (r.n, r.sum_v)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_v"),
        )
        .collect()
    }
    assert got == want
    # two-stage: (k, salt) exchange + final (k) exchange
    assert explain_shuffle_partitions(
        salted_sum_count(df, ["k"], "v", salt_buckets=8)
    ) >= 2


def test_jdbc_reader_partition_bounds_and_nonfinite_literals(spark):
    """partitionColumn without explicit bounds used to ship the literal
    option string "None" (NumberFormatException deep in the JDBC source
    at load time); non-finite float bounds used to interpolate the bare
    tokens inf/nan into remote SQL. Both are rejected at build time by
    name now."""
    import pytest

    from dex_data_ingestor_spark.sources.jdbc import (
        _sql_literal,
        jdbc_reader,
    )

    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        jdbc_reader(
            spark, "jdbc:mysql://h/db", "t", partition_column="id"
        )
    # with bounds, the builder constructs fine (no .load() — no DB here)
    assert jdbc_reader(
        spark, "jdbc:mysql://h/db", "t",
        partition_column="id", lower_bound=0, upper_bound=100,
    ) is not None
    with pytest.raises(ValueError, match="non-finite"):
        _sql_literal(float("nan"))
    with pytest.raises(ValueError, match="non-finite"):
        _sql_literal(float("inf"))
    assert _sql_literal(1.5) == "1.5"

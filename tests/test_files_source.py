"""CSV/JSON source layer: declared schemas, corrupt capture, drift."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dex_data_ingestor_spark.sources.files import (
    conform_to_schema,
    read_csv,
    read_jsonl,
    split_corrupt,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("sym", StringType()),
        StructField("price", DoubleType()),
    ]
)


def test_read_csv_captures_corrupt_rows(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,sym,price\n1,ABC,1.5\nnot_a_long,DEF,2.5\n3,GHI,3.5\n")
    df = read_csv(spark, str(p), SCHEMA)
    clean, bad = split_corrupt(df)
    assert {r["id"] for r in clean.collect()} == {1, 3}
    assert bad.count() == 1
    assert "not_a_long" in bad.collect()[0][0]


def test_read_jsonl_captures_corrupt_rows(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "sym": "A", "price": 1.0}\n'
        "{this is not json}\n"
        '{"id": 2, "sym": "B", "price": 2.0}\n'
    )
    clean, bad = split_corrupt(read_jsonl(spark, str(p), SCHEMA))
    assert clean.count() == 2 and bad.count() == 1


def test_conform_to_schema_drift(spark):
    drifted = spark.createDataFrame(
        [("7", "XYZ", 9, "surprise")],
        "id string, sym string, extra_col int, another string",
    )
    out = conform_to_schema(drifted, SCHEMA, keep_extras_json=True)
    row = out.collect()[0]
    assert row["id"] == 7 and row["price"] is None
    assert "surprise" in row["_extras"]
    assert out.schema["id"].dataType.simpleString() == "bigint"
    # without extras the declared schema is exact
    exact = conform_to_schema(drifted, SCHEMA)
    assert exact.columns == ["id", "sym", "price"]


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from dex_data_ingestor_spark.io import load_table
    from dex_data_ingestor_spark.sources.files import read_orc, write_orc
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert dict(back.dtypes) == dict(orders.dtypes)
    # predicate + projection reach the ORC scan like parquet
    q = back.filter(F.col("o_orderkey") == 1).select("o_orderkey", "o_custkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1)]" in plan, plan


def test_split_corrupt_rejects_corrupt_only_schema(spark, tmp_path):
    from dex_data_ingestor_spark.sources.files import CORRUPT_COL, split_corrupt

    df = spark.createDataFrame([("x",)], f"{CORRUPT_COL} string")
    with pytest.raises(ValueError, match="at least one data column"):
        split_corrupt(df)

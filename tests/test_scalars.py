"""Unit tests for the scalar library against the reference semantics
(FIXTURES.md §3 edge-case fixtures; reference: src/utils/utils.py)."""

import decimal
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from dex_data_ingestor_spark.functions.decimalq96 import (
    Q96,
    _price_pair_py,
)
from dex_data_ingestor_spark.functions.scalars import (
    apy_compound,
    normalize_symbol,
    pct_change,
    pct_to_fraction,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


class TestApy:
    def test_zero_periods_is_plan_time_error(self, spark):
        # reference: utils.py:23-24 raises at runtime; engine fails at build
        with pytest.raises(ValueError):
            apy_compound(F.lit(0.05), 0)

    def test_cap(self, spark):
        # reference: utils.py:32-34 caps at 99999999.99
        v = _one(spark, apy_compound(F.lit(500.0), 365))
        assert v == Decimal("99999999.99")

    def test_round_half_up_2dp(self, spark):
        v = _one(spark, apy_compound(F.lit(0.05), 12))
        # (1+0.05/12)^12 - 1 = 5.1161..% -> 5.12
        assert v == Decimal("5.12")

    def test_null_apr_yields_null(self, spark):
        v = _one(spark, apy_compound(F.lit(None).cast("double"), 12))
        assert v is None

    def test_falsy_apr_to_fraction_zero(self, spark):
        # reference: Bifrost.py:274-278 'if apr' guard
        assert _one(spark, pct_to_fraction(F.lit(None).cast("double"))) == 0.0
        assert _one(spark, pct_to_fraction(F.lit(0.0))) == 0.0
        assert _one(spark, pct_to_fraction(F.lit(12.0))) == 0.12


class TestPctChange:
    # reference null contract: utils.py:108-109,119-120
    @pytest.mark.parametrize(
        "cur,prev,expected",
        [
            (110.0, 100.0, 10.0),
            (100.0, 0.0, None),
            (None, 100.0, None),
            (100.0, None, None),
            (95.0, 100.0, -5.0),
        ],
    )
    def test_contract(self, spark, cur, prev, expected):
        v = _one(
            spark,
            pct_change(
                F.lit(cur).cast("double"), F.lit(prev).cast("double")
            ),
        )
        assert v == expected


class TestNormalizeSymbol:
    # reference: Hydration.py:13-16
    @pytest.mark.parametrize(
        "sym,expected",
        [("DOT", "vDOT"), ("vDOT", "vDOT"), ("VDOT", "VDOT"), ("view", "view")],
    )
    def test_prefix(self, spark, sym, expected):
        assert _one(spark, normalize_symbol(F.lit(sym))) == expected


class TestQ96Exact:
    """Pure-python kernel of the exact-decimal price path (reference:
    utils.py:130-171 contract)."""

    def test_parity_price_at_q96(self):
        # sqrt_price == 2^96 -> ratio 1 -> both sides equal
        p0, p1 = _price_pair_py(int(Q96), 18, 18, Decimal("2.5"), None)
        assert p0 == Decimal("2.5").quantize(Decimal(1).scaleb(-18))
        assert p1 == p0

    def test_decimals_adjustment(self):
        # d0=8, d1=6 -> ratio scaled by 10^(8-6)=100
        p0, p1 = _price_pair_py(int(Q96), 8, 6, Decimal("1"), None)
        assert p1 == Decimal("100").quantize(Decimal(1).scaleb(-18))

    def test_derive_token0_from_token1(self):
        p0, p1 = _price_pair_py(int(Q96) * 2, 18, 18, None, Decimal("8"))
        # ratio = 4 -> p0 = p1/4 = 2
        assert p0 == Decimal("2").quantize(Decimal(1).scaleb(-18))

    def test_zero_sqrt_price_invalid_yields_zero(self):
        # reference: InvalidOperation/DivisionByZero -> 0 (utils.py:161-169)
        p0, p1 = _price_pair_py(0, 18, 18, None, Decimal("8"))
        assert p0 == 0 and p1 == 0

    def test_both_sides_missing_raises(self):
        with pytest.raises(ValueError):
            _price_pair_py(int(Q96), 18, 18, None, None)

    def test_round_down_quantization(self):
        # 1/3 ratio: p1 = 1 * (sqrt(1/3)-ish)... use exact: ratio from
        # sqrt_price = Q96/2 -> ratio 0.25; p0 from p1=1 -> 4 exactly.
        # ROUND_DOWN check: p1 = 1/3 -> 0.333...3 (truncated, not rounded up)
        p0, p1 = _price_pair_py(int(Q96), 18, 18, Decimal(1) / Decimal(3), None)
        assert str(p0).endswith("3")  # truncated tail, never rounds to ...34

    def test_50_digit_context_exceeds_spark_decimal(self):
        # the very case that forces the pandas-UDF path: huge sqrt_price
        big = int(Q96) * 10**6
        p0, p1 = _price_pair_py(big, 18, 18, Decimal("1"), None)
        assert p1 == Decimal(10**12)  # value compare; 30 digits total


def test_q96_pandas_udf_end_to_end(spark):
    """The Arrow-batched UDF path itself (slow path, one batch)."""
    from dex_data_ingestor_spark.functions.decimalq96 import (
        token_prices_q96_exact,
    )

    df = spark.createDataFrame(
        [
            (Decimal(int(Q96)), 18, 18, 2.5, None),
            (Decimal(2 * int(Q96)), 8, 6, None, 400.0),
        ],
        "sqrt_price decimal(38,0), d0 int, d1 int, u0 double, u1 double",
    )
    out = df.select(
        token_prices_q96_exact("sqrt_price", "d0", "d1", "u0", "u1").alias("p")
    ).select("p.*").collect()
    assert out[0].token0_price_usd == Decimal("2.5").quantize(
        Decimal(1).scaleb(-18)
    )
    assert out[0].token1_price_usd == out[0].token0_price_usd
    # row 2: ratio = 4 * 10^(8-6) = 400 -> p0 = 400/400 = 1
    assert out[1].token0_price_usd == Decimal("1").quantize(
        Decimal(1).scaleb(-18)
    )


def test_pop_multi_matches_join_form(spark, sf_dir):
    """period_over_period_multi (single-shuffle union form) must agree
    with the per-offset self-join form on every row."""
    from dex_data_ingestor_spark.io import load_table
    from dex_data_ingestor_spark.operators.pct import (
        period_over_period,
        period_over_period_multi,
    )

    ev = load_table(spark, sf_dir, "events")
    fact = ev.groupBy("user_id", F.to_date("ts").alias("date")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("volume")
    )
    joined = period_over_period(fact, ["user_id"], "date", ["volume"], 14, "_yoy")
    joined = period_over_period(
        joined.select("user_id", "date", "volume", "volume_yoy"),
        ["user_id"], "date", ["volume"], 7, "_qoq",
    ).select("user_id", "date", "volume", "volume_yoy", "volume_qoq")
    multi = period_over_period_multi(
        fact, ["user_id"], "date", "volume", {"_yoy": 14, "_qoq": 7}
    ).select("user_id", "date", "volume", "volume_yoy", "volume_qoq")
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, multi.collect())
    )


def test_pop_multi_keeps_null_valued_facts(spark):
    """Facts with NULL values must survive the multi form exactly as in
    the join form (ADVICE r01: presence was inferred from value
    non-NULL, dropping NULL-valued fact rows)."""
    import datetime as dt

    from dex_data_ingestor_spark.operators.pct import (
        period_over_period,
        period_over_period_multi,
    )

    rows = [
        ("k1", dt.date(2024, 1, 1), 10.0),
        ("k1", dt.date(2024, 1, 8), None),   # NULL current value
        ("k1", dt.date(2024, 1, 15), 20.0),
        ("k2", dt.date(2024, 1, 15), None),  # NULL-only key
    ]
    fact = spark.createDataFrame(rows, "key string, date date, v double")
    joined = period_over_period(fact, ["key"], "date", ["v"], 7, "_wow")
    multi = period_over_period_multi(fact, ["key"], "date", "v", {"_wow": 7})
    j = sorted(map(tuple, joined.select("key", "date", "v", "v_wow").collect()))
    m = sorted(map(tuple, multi.select("key", "date", "v", "v_wow").collect()))
    assert j == m
    assert len(j) == 4  # NULL-valued rows kept


# --- limb-split exact sum (testbed._dec_sum) ------------------------------

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _quantized_sum(values):
    """Python-Decimal reference: quantize each addend half-up to 6 dp,
    sum exactly, round the exact total to nearest double."""
    total = sum(
        Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        for v in values
    )
    return float(total)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    values=st.lists(
        st.floats(
            min_value=-9e9,
            max_value=9e9,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_dec_sum_limb_split_is_exact(spark, values):
    from dex_data_ingestor_spark.plans.testbed import _dec_sum

    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = df.agg(_dec_sum(F.col("v"), "s")).collect()[0]["s"]
    want = _quantized_sum(values)
    assert got == want, (values, got, want)


def test_dec_sum_negative_and_null_groups(spark):
    from dex_data_ingestor_spark.plans.testbed import _dec_sum

    df = spark.createDataFrame(
        [(1, -1.25), (1, 2.75), (1, -0.000001), (2, None)],
        "k long, v double",
    )
    out = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(_dec_sum(F.col("v"), "s")).collect()
    }
    assert out[1] == 1.499999
    assert out[2] is None


# ---------------------------------------------------------------------------
# round_ieee: the shared cross-engine rounding rule (engine round_ieee,
# oracle _rieee). Native ROUND(double, k) can disagree between Spark and
# DuckDB ON BIT-IDENTICAL INPUT (Spark rounds the shortest decimal repr
# HALF_UP, DuckDB the binary value) — the r9 sf0.1 sweep caught q_yoy_qoq
# emitting 231.67 vs 231.68 for the same quotient. These tests pin the
# floor-formula bit-identical against a pure-Python IEEE reference in BOTH
# engines on a hostile grid, and pin the live tie value that caught it.
# ---------------------------------------------------------------------------

_ROUND_GRID = [
    231.67499999999998,   # the q_yoy_qoq tie (binary just under x.675)
    -231.67499999999998,
    0.1234565004,
    -0.0013534415,        # the q_embed_stats sf0.1 mean neighborhood
    1e-9, 2.5e-10, -2.5e-10,
    999999.999999,
    0.49999999999999994,  # largest double < 0.5
    1e12,                 # beyond the scale-9 guard: identity
    float("nan"), float("inf"), float("-inf"),
]


def _round_ref(v, scale):
    import math

    from dex_data_ingestor_spark.functions.scalars import round_ieee_bound

    if not math.isfinite(v) or abs(v) >= round_ieee_bound(scale):
        return v
    return math.floor(v * float(10**scale) + 0.5) / float(10**scale)


@pytest.mark.parametrize("scale", [2, 6, 9])
def test_round_ieee_spark_matches_python_reference(spark, scale):
    import math
    import struct

    from dex_data_ingestor_spark.functions.scalars import round_ieee

    df = spark.createDataFrame([(v,) for v in _ROUND_GRID], "x double")
    got = {
        struct.pack("<d", r["x"]): r["r"]
        for r in df.select(
            "x", round_ieee(F.col("x"), scale).alias("r")
        ).collect()
    }
    for v in _ROUND_GRID:
        want = _round_ref(v, scale)
        have = got[struct.pack("<d", v)]
        if math.isnan(want):
            assert math.isnan(have), (v, scale, have)
        else:
            assert struct.pack("<d", want) == struct.pack("<d", have), (
                v, scale, want, have,
            )


@pytest.mark.parametrize("scale", [2, 6, 9])
def test_rieee_duckdb_matches_python_reference(scale):
    import math
    import struct

    import duckdb

    from dex_data_ingestor_spark.plans.testbed import _rieee

    con = duckdb.connect()
    for v in _ROUND_GRID:
        lit = (
            f"CAST({v!r} AS DOUBLE)"
            if math.isfinite(v)
            else f"'{v}'::DOUBLE"
        )
        have = con.sql(
            f"SELECT {_rieee('x', scale)} FROM (SELECT {lit} AS x)"
        ).fetchone()[0]
        want = _round_ref(v, scale)
        if math.isnan(want):
            assert math.isnan(have), (v, scale, have)
        else:
            assert struct.pack("<d", want) == struct.pack("<d", have), (
                v, scale, want, have,
            )


def test_pct_change_tie_value_matches_oracle_round(spark):
    """The live q_yoy_qoq red: cur=132.67, prev=40.0 gives the quotient
    231.67499999999998, where Spark's ROUND said 231.67 and DuckDB's said
    231.68. Both sides now use the IEEE rule; pin the agreed value."""
    import duckdb

    from dex_data_ingestor_spark.plans.testbed import _rieee

    v = _one(spark, pct_change(F.lit(132.67), F.lit(40.0)))
    expr = _rieee("(132.67 - 40.0) / 40.0 * 100.0", 2)
    want = duckdb.sql(f"SELECT {expr}").fetchone()[0]
    assert v == want == 231.68


def test_round_ieee_dense_tie_grid_both_engines(spark):
    """Exhaustive boundary sweep: for scales 2 and 9, every half-step
    tie point n + 0.5 (in target-dp units) nudged by -2..+2 ULPs —
    5 neighbors per tie, ~10k values total — must round identically in
    Spark, DuckDB, and the pure-Python IEEE reference. This is the
    dense version of the spot grid above: any future 'optimization' of
    round_ieee/_rieee that changes a single boundary case fails here."""
    import math
    import struct

    import duckdb
    import pandas as pd

    from dex_data_ingestor_spark.functions.scalars import round_ieee
    from dex_data_ingestor_spark.plans.testbed import _rieee

    vals = []
    for scale in (2, 9):
        step = 10.0 ** -scale
        for n in range(0, 500):
            tie = (n + 0.5) * step
            for m in range(-2, 3):
                v = tie
                if m < 0:
                    for _ in range(-m):
                        v = math.nextafter(v, -math.inf)
                elif m > 0:
                    for _ in range(m):
                        v = math.nextafter(v, math.inf)
                vals.append((scale, v))
                vals.append((scale, -v))

    for scale in (2, 9):
        sub = [v for s, v in vals if s == scale]
        want = [_round_ref(v, scale) for v in sub]

        df = spark.createDataFrame([(v,) for v in sub], "x double")
        got_spark = [
            r["r"]
            for r in df.select(
                round_ieee(F.col("x"), scale).alias("r")
            ).collect()
        ]
        # collect() preserves createDataFrame order on a local session
        assert len(got_spark) == len(want)
        for v, w, g in zip(sub, want, got_spark):
            assert struct.pack("<d", w) == struct.pack("<d", g), (
                "spark", scale, v, w, g,
            )

        con = duckdb.connect()
        con.register("grid", pd.DataFrame({"x": sub}))
        got_duck = [
            row[0]
            for row in con.sql(
                f"SELECT {_rieee('x', scale)} FROM grid"
            ).fetchall()
        ]
        for v, w, g in zip(sub, want, got_duck):
            assert struct.pack("<d", w) == struct.pack("<d", g), (
                "duckdb", scale, v, w, g,
            )

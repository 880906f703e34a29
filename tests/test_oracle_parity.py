"""Differential tests: every registered query vs its DuckDB oracle —
the same check the driver runs at sf0.01 (SURVEY.md §5 strategy 1)."""

import pytest

from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, QUERIES
from tests.oracle_check import compare, duck_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, con, ORACLE_SQL[name])
    assert not problems, f"{name}: " + " | ".join(problems)


def test_oracle_result_types_are_portable(con):
    """Registry-wide result-TYPE audit of every oracle SQL (VERDICT r8
    #2). The local value compare canonicalizes Python ints type-blind,
    so a DuckDB window ``SUM(BIGINT)`` silently widening to HUGEINT
    (int128) passes locally yet fails the driver's type-aware hash —
    exactly how q_token_budget went red in r8 while 172/172 passed
    here. Binding each relation (lazy ``.types``, no execution) and
    pinning the result types to the portable cross-engine set makes
    that whole class visible locally. If this test fails on a new
    query: cast the offending expression in the ORACLE SQL (e.g.
    ``CAST(SUM(x) OVER (...) AS BIGINT)`` — NOTES.md rulebook).

    DECIMAL was in the allowed set until r9 proved it is NOT portable
    (q_incremental_agg driver red: Spark DECIMAL(38,6) materializes as
    Python Decimal, DuckDB's as float64 — bitwise-equal values, type-
    divergent hash). Decimals are an internal exactness vehicle only;
    every result column must cross the boundary as DOUBLE or BIGINT."""
    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL

    allowed = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE",
               "TIMESTAMP", "BOOLEAN"}

    def ok(ts: str) -> bool:
        if ts.endswith("[]"):  # list columns: element type must be portable
            return ok(ts[:-2])
        return ts in allowed

    offenders = []
    for name, sql in ORACLE_SQL.items():
        rel = con.sql(sql)
        offenders += [
            (name, c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if not ok(str(t))
        ]
    assert not offenders, f"non-portable oracle result types: {offenders}"


def test_all_queries_have_oracle_or_are_flagged():
    missing = set(QUERIES) - set(ORACLE_SQL)
    # rows-only checks are allowed but must be deliberate; keep the list
    # explicit so nothing silently loses oracle coverage.
    allowed_rows_only = {
        # HLL++: no cross-engine oracle by design (5%-error pytest bound)
        "q_approx_distinct",
        # winnowed selection has no cross-engine xxhash64 twin; bounded
        # by the subset/detection/boundary properties in test_corpus.py
        "q_dup_substrings_winnowed",
        # iterative BPE merge learning (the driver contract's explicit
        # rows-only category); the merge sequence and encoding are
        # golden-pinned in test_vector_text.py
        "q_bpe_tokens",
        # Greenwald-Khanna sketch outputs are implementation-specific
        # (DuckDB approx_quantile is a t-digest); bounded against the
        # exact q_quantiles twin in test_vector_text.py
        "q_approx_quantiles",
    }
    assert missing <= allowed_rows_only, f"queries without oracle: {missing}"


@pytest.mark.slow
def test_oracle_materialization_classes_agree(con):
    """Mechanism-based twin of the type audits above. Both driver reds
    (r8 HUGEINT, r9 DECIMAL) shared one channel: a DuckDB result type
    whose ``fetchall`` Python class (int / Decimal — what the local
    compare sees) differs from its pandas ``.df()`` class (float64 —
    what the driver's hash evidently sees). The named-type allowlist
    blocks the two known offenders; this audit detects the CHANNEL, so
    a type we never thought about (UBIGINT, TIME, interval, a future
    DuckDB widening) cannot slip a third instance through. LIMIT 0
    frames would be vacuous, so each relation contributes its full
    sf0.001 result."""
    import datetime as dt
    import decimal

    import numpy as np

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL

    def cls(v):
        if v is None:
            return None
        if isinstance(v, bool) or isinstance(v, np.bool_):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, str):
            return "str"
        if isinstance(v, dt.datetime):
            return "ts"
        if isinstance(v, dt.date):
            return "date"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "list"
        return type(v).__name__

    offenders = []
    for name, sql in ORACLE_SQL.items():
        rel = con.sql(sql)
        rows = rel.fetchall()
        df = con.sql(sql).df()
        cols = list(df.columns)
        for j, c in enumerate(cols):
            vals = [r[j] for r in rows]
            has_null = any(v is None for v in vals)
            fetch_cls = {cls(v) for v in vals} - {None}
            # NaT/NaN placeholders for SQL NULLs must not count as a
            # float materialization of a non-float column; the NaN
            # probe must stay scalar-only (a list cell's `v != v` is
            # an elementwise array whose bool() raises)
            def _is_null(v):
                if v is None:
                    return True
                return (
                    not isinstance(v, (list, tuple, np.ndarray))
                    and v != v
                )

            pandas_cls = {
                cls(v) for v in df[c] if not _is_null(v)
            } - {None}
            if not fetch_cls or not pandas_cls or fetch_cls == pandas_cls:
                continue
            # pandas has no date dtype: DATE -> midnight Timestamp is
            # its universal convention, driver-green since r1
            if fetch_cls == {"date"} and pandas_cls == {"ts"}:
                continue
            # nullable-int columns widen to float64 with NaN — a
            # nullability artifact, driver-green (q_time_rollup,
            # q_rrf_fusion); a NULL-FREE int->float jump stays fatal:
            # that is exactly how HUGEINT surfaced in r8
            if (
                fetch_cls == {"int"}
                and pandas_cls == {"float"}
                and has_null
            ):
                continue
            offenders.append((name, c, fetch_cls, pandas_cls))
    assert not offenders, (
        "oracle columns materialize differently via fetchall vs pandas "
        f"(the r8/r9 driver-red channel): {offenders}"
    )


@pytest.mark.slow
def test_result_column_widths_match_oracle(spark, sf_dir, con):
    """Registry-wide cross-engine WIDTH audit: every Spark result
    column's dtype must map exactly onto the DuckDB oracle column's
    type (bigint↔BIGINT, int↔INTEGER, double↔DOUBLE, …). The named
    allowed pair is timestamp_ntz↔TIMESTAMP — the repo-wide session
    convention, driver-green across 24 queries since r1.

    Why: the portable-type audits pin each SIDE's types, but nothing
    pinned the PAIRING. An r10 sweep found seven int32↔BIGINT pairs —
    empirically driver-benign (q_embed_gram, q_c4_filters took r9
    hash-greens carrying the mismatch), but the same sweep is how the
    r8 HUGEINT and r9 DECIMAL channels were found, so the registry was
    normalized to width-identical pairs and this test keeps it there:
    a width asymmetry can only survive behind an explicit entry here.

    Schema-only on both sides (Spark analysis, lazy DuckDB bind) — no
    execution, so the full registry costs seconds."""
    expected = {
        "bigint": "BIGINT",
        "int": "INTEGER",
        "smallint": "SMALLINT",
        "double": "DOUBLE",
        "float": "FLOAT",
        "string": "VARCHAR",
        "date": "DATE",
        "boolean": "BOOLEAN",
        "binary": "BLOB",
        "timestamp_ntz": "TIMESTAMP",
    }

    def duck_expected(spark_type: str):
        if spark_type.startswith("array<") and spark_type.endswith(">"):
            inner = duck_expected(spark_type[6:-1])
            return f"{inner}[]" if inner else None
        return expected.get(spark_type)

    offenders = []
    for name, sql in ORACLE_SQL.items():
        sdt = dict(QUERIES[name](spark, sf_dir).dtypes)
        rel = con.sql(sql)
        ddt = dict(zip(rel.columns, (str(t) for t in rel.types)))
        for col, st in sdt.items():
            want = duck_expected(st)
            if want is None:
                offenders.append((name, col, st, "unmapped spark type"))
            elif ddt.get(col) != want:
                offenders.append((name, col, st, ddt.get(col)))
    assert not offenders, (
        "cross-engine column width/type pairs diverge "
        f"(normalize at the query boundary): {offenders}"
    )


def test_oracle_sql_never_reintroduces_banned_constructs():
    """Static rulebook guard over every ORACLE_SQL (comment-stripped):

    - native ``ROUND(`` — Spark and DuckDB disagree on bit-identical
      doubles (shortest-repr vs binary rounding; the r9 sf0.1 reds);
      every rounding site must be the shared _rieee expansion.
    - raw ``\\s`` in regex literals — Java's class includes \\x0B,
      RE2's does not; tokenizers must use the explicit shared class
      (scalars.WS / its DuckDB twin).

    Both classes were eradicated in r9; this pins the eradication so
    a future oracle cannot quietly regress either."""
    import re

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL

    offenders = []
    for name, sql in ORACLE_SQL.items():
        code = re.sub(r"--[^\n]*", "", sql)
        if re.search(r"(?<![\w_])round\s*\(", code, re.I):
            offenders.append((name, "native ROUND("))
        if "\\s" in code:
            offenders.append((name, "raw \\s regex class"))
    assert not offenders, offenders


def _balanced_span(s: str, start: int) -> int:
    """Index just past the ')' closing the '(' at ``start``."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise AssertionError("unbalanced parens")


def test_rieee_case_expansions_never_desync():
    """Every expanded _rieee CASE literal in every ORACLE_SQL carries
    the rounded expression in TRIPLICATE (guard, floor branch, else
    branch) — a hand edit to one copy silently desynchronizes the
    rounding rule (ADVICE r9). This guard re-parses each expansion
    (balanced-paren scan, so nested CASE/abs inside the expression is
    fine), recovers (expr, scale), and asserts the whole span is
    byte-identical to a fresh ``_rieee(expr, scale)`` rendering — so
    the three copies plus both constants can never drift apart
    undetected. Anything that LOOKS like the expansion signature
    (``CASE WHEN abs(...) < <float> THEN floor((``) must parse fully;
    a partial match is exactly the desync this test exists to catch."""
    import math
    import re

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, _rieee

    sig = re.compile(r"CASE WHEN abs\(")
    checked = 0
    for name, sql in ORACLE_SQL.items():
        for m in sig.finditer(sql):
            open_paren = m.end() - 1
            end_x = _balanced_span(sql, open_paren)
            expr = sql[open_paren + 1 : end_x - 1]
            after = sql[end_x:]
            head = re.match(r" < (\d+(?:\.\d+)?) THEN floor\(", after)
            if not head:
                continue  # a genuine abs() comparison, not a rounding site
            bound = float(head.group(1))
            scale = 15 - round(math.log10(bound))
            span_start = m.start()
            rendered = _rieee(expr, scale)
            actual = sql[span_start : span_start + len(rendered)]
            assert actual == rendered, (
                f"{name}: desynced _rieee expansion for scale {scale}:\n"
                f"  expected: {rendered}\n  actual:   {actual}"
            )
            checked += 1
    # the registry carries dozens of these; a collapse to ~0 means the
    # parser regressed, not that the sites vanished
    assert checked >= 40, checked


def test_approx_distinct_bounded_relative_error(spark, sf_dir):
    """q_approx_distinct is rows-only for the driver (HLL++ estimates
    are implementation-specific, no cross-engine oracle) — so pin its
    contract here instead: per-group relative error vs exact distinct
    must stay within 5x the configured rsd (0.01), a generous bound
    that still catches a broken sketch or a wrong-column regression."""
    from pyspark.sql import functions as F

    from dex_data_ingestor_spark.io import load_table
    from dex_data_ingestor_spark.plans.testbed import QUERIES

    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["q_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, n in exact.items():
        rel_err = abs(approx[etype] - n) / max(n, 1)
        assert rel_err <= 0.05, (etype, approx[etype], n, rel_err)


def test_minhash_pairs_oracle_parity_on_hot_bucket(spark, tmp_path):
    """The capped-pairs oracle CTE must mirror the engine EXACTLY when
    a bucket exceeds LSH_MAX_BUCKET: 300 identical boilerplate docs
    put 300 docs in each band bucket (> 256 cap), so both sides must
    emit the shifted sub-bucket tiling, not all pairs. Guards the
    failure mode where driver data grows a hot bucket and the
    pair-emitting oracles silently diverge from the capped engine."""
    import duckdb

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, QUERIES

    rows = [
        (i, "the same boilerplate text repeated for every hot bucket doc")
        for i in range(300)
    ]
    rows += [
        (1000 + i, f"unique document number {i} with entirely different words")
        for i in range(5)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    df = QUERIES["q_minhash_pairs"](spark, str(tmp_path))
    problems = compare(df, con, ORACLE_SQL["q_minhash_pairs"])
    con.close()
    assert not problems, problems
    # and the output really is capped: tiled cell pairs, not 300*299/2
    n = df.count()
    assert n < 300 * 299 // 2, n


def test_tokenizer_whitespace_parity_on_hostile_corpus(spark, tmp_path):
    """Crafted-corpus parity for the shared explicit whitespace class
    (VERDICT r8 "What's wrong" #3). Java ``\\s`` includes ``\\x0B``
    (vertical tab) while DuckDB/RE2 ``\\s`` does not, so the old
    ``\\s+`` tokenizers agreed only because no testdata contained a
    vertical tab — one driver data regeneration away from tripping
    every tokenizing query at once. Both sides now use
    ``[ \\t\\n\\f\\r]+`` (scalars.WS); this corpus pins the chars
    where the engines used to (or could) diverge: \\x0B, \\f, CR,
    NBSP (U+00A0 — whitespace to neither engine), tabs, and
    leading/trailing newlines."""
    import duckdb

    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, QUERIES

    rows = [
        (1, "plain words only here", "en", "web", 0),
        (2, "vertical\x0btab glues tokens", "en", "web", 0),
        (3, "form\ffeed splits tokens", "en", "web", 0),
        (4, "carriage\rreturn and\ttab split", "en", "web", 0),
        (5, "nbsp is one token both sides", "en", "web", 0),
        (6, "\n\ttrailing and leading runs\n\n", "en", "web", 0),
        (7, "mixed \t\n\f\r all four escapes", "fr", "web", 0),
        (8, "\x0b", "fr", "web", 0),  # lone vtab: one 1-char token
        (9, "", "de", "web", 0),  # empty text edge
        (10, "   ", "de", "web", 0),  # all-space edge
    ]
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src, _ in rows]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    # one query per tokenizer entry point: split (token counts +
    # cumulative window), split+filter (word stats battery), and the
    # normalize-collapse regexp_replace path (fingerprint).
    for name in ("q_token_budget", "q_text_stats", "q_fingerprint"):
        df = QUERIES[name](spark, str(tmp_path))
        problems = compare(df, con, ORACLE_SQL[name])
        assert not problems, (name, problems)
    con.close()
    # and the divergence char really is glue now on BOTH sides: doc 2
    # must count 3 tokens ("vertical\x0btab" is ONE token), where Java
    # \s would have made it 4.
    from pyspark.sql import functions as F

    from dex_data_ingestor_spark.functions.scalars import WS

    n = (
        spark.read.parquet(str(tmp_path / "documents.parquet"))
        .filter("doc_id = 2")
        .select(F.size(F.split(F.trim("text"), WS)).alias("n"))
        .head()[0]
    )
    assert n == 3, n


#: Measure columns the registry aggregates through DECIMAL(18,6) casts
#: (oracle side) / _dec_sum quantization (engine side).
_SHORT_DECIMAL_MEASURES = [
    ("events", "value"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_quantity"),
    ("lineitem", "l_tax"),
    ("orders", "o_totalprice"),
    ("part", "p_retailprice"),
    ("supplier", "s_acctbal"),
    ("customer", "c_acctbal"),
    # computed measures the registry also decimal-casts: the product
    # of two short decimals is not itself an exact decimal double, but
    # its micro-units must still sit far from the .5 cast boundary
    # (they do while the true product has <= 4 dp and magnitude << 4e9)
    ("lineitem", "l_extendedprice * (1 - l_discount)"),
    ("lineitem", "l_extendedprice * (1 + l_tax)"),
]


def test_fixture_measures_honor_the_decimal_cast_precondition(sf_dir):
    """The rulebook keeps plain CAST(x AS DECIMAL(18,6)) in the _dec_sum
    oracles ONLY because the driver generates measures as short decimals
    — the cast is cross-engine-unambiguous iff each value's micro-units
    sit far from a .5 rounding boundary (Spark rounds the shortest repr,
    DuckDB the binary digits; q_embed_stats diverged at sf0.1 exactly
    because float32 components violate this). If a driver data
    regeneration ever ships full-precision doubles, THIS test fails with
    a pointed message instead of ~40 driver hash reds: switch the
    affected pairs to the IEEE unit quantizer (floor(x*1e6 + 0.5), see
    q_embed_stats) on both sides.

    Measured today: worst boundary distance 3.05e-5 units, max
    magnitude <5e5 (safe until ~4e9, where half-ulp reaches 0.5 units).
    """
    import duckdb

    con = duckdb.connect()
    for table, col in _SHORT_DECIMAL_MEASURES:
        dist, mag = con.sql(
            f"""
            SELECT max(abs({col}*1000000.0 - round({col}*1000000.0))),
                   max(abs({col}))
            FROM read_parquet('{sf_dir}/{table}.parquet')
            WHERE {col} IS NOT NULL
            """
        ).fetchone()
        assert dist is None or dist < 0.4, (
            f"{table}.{col}: a value's micro-units are {dist} from an "
            "integer — the DECIMAL(18,6) oracle casts are no longer "
            "cross-engine-safe; move the pairs to the IEEE quantizer"
        )
        assert mag is None or mag < 4e9, (table, col, mag)

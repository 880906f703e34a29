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


def test_all_queries_have_oracle_or_are_flagged():
    missing = set(QUERIES) - set(ORACLE_SQL)
    # rows-only checks are allowed but must be deliberate; keep the list
    # explicit so nothing silently loses oracle coverage.
    allowed_rows_only = {"q_approx_distinct"}  # HLL++: no cross-engine oracle by design
    assert missing <= allowed_rows_only, f"queries without oracle: {missing}"

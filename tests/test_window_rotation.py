"""Driver correctness-window rotation contract (VERDICT r10 #1/#5).

The driver checks 50 of the 176 registry queries per round, so each
query's latest oracle-confirmed row ages between checks. Two things
must hold, AS ASSERTIONS rather than prose in the window block:

1. every query changed after its last driver row (the OWED list — the
   only place a wrong answer can hide, per the r8 q_token_budget
   precedent) rides the next window, and
2. after this round's window lands, no query's latest row is older
   than 4 rounds. (176 / 50 = 3.52 rounds per full confirmation
   cycle, so a 3-round bound is arithmetically impossible in steady
   state; 4 is the tightest achievable contract.)

The ledger is recomputed from the CORRECTNESS_r*.json artifacts at the
repo root — the driver's own records, not a hand-maintained copy.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from dex_data_ingestor_spark.plans.testbed import (
    OWED_R14,
    QUERIES,
    _WINDOW_R14,
)

#: The round whose window _WINDOW_R14 is (keep in lockstep with the
#: window variable's name when rotating).
CURRENT_ROUND = 14

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(q: str, row: dict) -> bool:
    """A ledger row counts as a CONFIRMATION only when it is green for
    the query's contract tier: hash-green for oracle-paired queries;
    for the declared rows-only queries (no oracle_sql entry — the
    driver records err='no_oracle'), a ran-and-produced-rows row is
    that tier's green. A red row (hash_match False, or an err on an
    oracle-paired query) must NOT advance the query's latest-row age —
    the r11 review caught the first draft of this file counting reds
    as confirmations, which would let an unconfirmed red age out of
    the window instead of being forced back in."""
    from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL

    if q not in ORACLE_SQL:
        # ADVICE r12: ">= 0" made the predicate vacuous (a zero-row
        # run counted as a confirmation); the tier's green is
        # ran-AND-produced-rows, so require a positive count (every
        # rows-only ledger green to date has rows > 0 — verified
        # before tightening).
        return row.get("err") == "no_oracle" and (
            row.get("spark_rows") or 0
        ) > 0
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and row.get("err") is None
    )


def _latest_rows() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO_ROOT,
                                              "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        if rnd >= CURRENT_ROUND:
            continue  # this round's own record, once the driver writes it
        with open(path) as fh:
            for q, row in json.load(fh).items():
                if _green(q, row):
                    latest[q] = max(latest.get(q, 0), rnd)
    return latest


def test_owed_queries_all_ride_the_window():
    assert set(OWED_R14) <= set(_WINDOW_R14)
    assert set(_WINDOW_R14) <= set(QUERIES)


def test_post_window_staleness_at_most_4_rounds():
    latest = _latest_rows()
    if not latest:
        pytest.skip("no CORRECTNESS_r*.json ledger present")
    # every registry query has some GREEN driver row (coverage is
    # complete; a query with only red rows would be missing here and
    # must ride the window — asserted below, not excused)
    missing = set(QUERIES) - set(latest)
    assert missing <= set(_WINDOW_R14), (
        f"queries with no green driver row and no window slot: "
        f"{missing - set(_WINDOW_R14)}"
    )
    stale = {}
    for q in QUERIES:
        row = CURRENT_ROUND if q in _WINDOW_R14 else latest[q]
        age = CURRENT_ROUND - row
        if age > 4:
            stale[q] = latest[q]
    assert not stale, (
        f"queries whose latest GREEN driver row would be >4 rounds old "
        f"after r{CURRENT_ROUND}: {stale}"
    )


def test_red_queries_ride_the_next_window():
    """A query whose MOST RECENT ledger row (of any color) is red must
    be in the next window — reds come back next round, they do not age
    through the staleness budget."""
    latest_any: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO_ROOT,
                                              "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        if rnd >= CURRENT_ROUND:
            continue
        with open(path) as fh:
            for q, row in json.load(fh).items():
                if q not in latest_any or rnd >= latest_any[q][0]:
                    latest_any[q] = (rnd, _green(q, row))
    if not latest_any:
        pytest.skip("no CORRECTNESS_r*.json ledger present")
    reds = {q for q, (_, green) in latest_any.items() if not green}
    assert reds <= set(_WINDOW_R14), (
        f"driver-red queries without a window slot: "
        f"{reds - set(_WINDOW_R14)}"
    )


def test_window_fronts_the_oldest_cohort_first():
    """Fill (non-owed) window slots must not out-age the queries left
    behind: the YOUNGEST fill slot may not be younger than the OLDEST
    non-windowed query. (Fills from several cohorts are legitimate —
    r12 is documented to mix the r7 leftovers with the r8 cohort — so
    the invariant is the boundary between in-window and out-of-window,
    not membership in one cohort.) A fill query with no green row ever
    counts as infinitely old — riding is exactly right for it."""
    latest = _latest_rows()
    if not latest:
        pytest.skip("no CORRECTNESS_r*.json ledger present")
    fill_rounds = [
        latest[q]
        for q in _WINDOW_R14
        if q not in OWED_R14 and q in latest
    ]
    left_behind = [
        latest[q]
        for q in QUERIES
        if q not in _WINDOW_R14 and q not in OWED_R14 and q in latest
    ]
    if not fill_rounds or not left_behind:
        pytest.skip("degenerate window composition")
    assert max(fill_rounds) <= min(left_behind), (
        f"a fill slot (r{max(fill_rounds)}) is younger than a "
        f"left-behind query (r{min(left_behind)})"
    )

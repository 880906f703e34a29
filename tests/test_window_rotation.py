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
    OWED_R11,
    QUERIES,
    _WINDOW_R11,
)

#: The round whose window _WINDOW_R11 is (keep in lockstep with the
#: window variable's name when rotating).
CURRENT_ROUND = 11

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_rows() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO_ROOT,
                                              "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        if rnd >= CURRENT_ROUND:
            continue  # this round's own record, once the driver writes it
        with open(path) as fh:
            for q in json.load(fh):
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def test_owed_queries_all_ride_the_window():
    assert set(OWED_R11) <= set(_WINDOW_R11)
    assert set(_WINDOW_R11) <= set(QUERIES)


def test_post_window_staleness_at_most_4_rounds():
    latest = _latest_rows()
    if not latest:
        pytest.skip("no CORRECTNESS_r*.json ledger present")
    # every registry query has some driver row (coverage is complete)
    missing = set(QUERIES) - set(latest)
    assert not missing, f"queries with no driver row ever: {missing}"
    stale = {}
    for q in QUERIES:
        row = CURRENT_ROUND if q in _WINDOW_R11 else latest[q]
        age = CURRENT_ROUND - row
        if age > 4:
            stale[q] = latest[q]
    assert not stale, (
        f"queries whose latest driver row would be >4 rounds old "
        f"after r{CURRENT_ROUND}: {stale}"
    )


def test_window_fronts_the_oldest_cohort_first():
    """Non-owed window slots must go to the oldest cohort: no non-owed
    windowed query may be YOUNGER (more recently confirmed) than a
    non-windowed query that is at the 4-round staleness edge."""
    latest = _latest_rows()
    if not latest:
        pytest.skip("no CORRECTNESS_r*.json ledger present")
    oldest = min(latest[q] for q in QUERIES if q in latest)
    for q in _WINDOW_R11:
        if q in OWED_R11:
            continue
        assert latest.get(q, oldest) == oldest, (
            f"{q} rides a fill slot but is not from the oldest cohort "
            f"(row r{latest.get(q)}, oldest is r{oldest})"
        )

"""Partition-layout invariance guard.

A 1000-executor cluster differs from this rig first of all in LAYOUT:
more input splits, a different shuffle partition count, different
per-partition fold/merge orders. Any query whose output depends on
those (an order-sensitive double fold, a first-wins window without a
total tiebreak, an accumulate-then-cast done per-partition) is a
latent cluster red that every fixed-layout harness run would miss.

Round 9 ran the full 172-pair oracle sweep under a hostile layout —
local[3], ``spark.sql.shuffle.partitions=7``, 1 MiB input splits,
``spark.default.parallelism=5`` — against the unchanged DuckDB
oracles: 172/172 bitwise PASS (NOTES.md r9 #15). This test pins the
protocol permanently on a family-representative subset so a new
order-sensitive fold cannot land silently: the subset covers every
float-fold family (moments, cosine, BM25, AUC, corr), the first-wins /
window family, the exact-decimal aggregate family, and the corpus
hash families.

Subprocess-based because the hostile confs (shuffle partitions, split
sizes, parallelism) are session-wide and must not leak into the shared
test session.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Family representatives (see module docstring). Keep this list in
#: sync with new FAMILIES, not new queries — one or two per family.
SUBSET = [
    # exact-decimal / grouped aggregates
    "q_flagship_daily_revenue",
    "q_group_agg",
    "q_yoy_qoq",
    "q_twap",
    # incremental maintenance (signed-delta merge must not depend on
    # which partition folds a delta; r9 driver-red family)
    "q_incremental_agg",
    # first-wins / top-k / as-of / session windows
    "q_dedup_first",
    "q_topk",
    "q_asof_price",
    "q_sessionize",
    "q_ohlc_bars",
    # exact-moment / exact-order-statistic family (layout-invariant
    # by construction)
    "q_stats_agg",
    "q_outlier_events",
    "q_quantiles",
    "q_corr",
    # float folds smoothed by round_ieee
    "q_embed_stats",
    "q_vector_topk",
    "q_return_corr",
    "q_rolling_vol",
    "q_bm25",
    "q_embed_auc",
    # corpus / hash families
    "q_dedup_exact",
    "q_minhash_lsh",
    "q_text_stats",
    "q_dsir_weights",
    # r10 continuation-session oracle rewrites (kmv NULL filter /
    # null-safe diff join): keep their layout invariance pinned
    "q_kmv_distinct",
    "q_table_diff",
    # span-strip / rebuild family (r11 one-pass segment rebuild:
    # gram-keyed rank window + island windows + collect_list rebuild —
    # order-invariant via total (id,pos) keys and array_sort, pinned)
    "q_strip_dup_substrings",
]

_SUBPROC = r"""
import sys
sys.path.insert(0, "@REPO@")
sys.path.insert(0, "@REPO@/tests")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[3]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.sql.files.maxPartitionBytes", str(1 << 20))
    .config("spark.sql.files.openCostInBytes", "0")
    .config("spark.default.parallelism", "5")
    .config("spark.ui.enabled", "false")
    .appName("hostile-partitioning-guard")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from dex_data_ingestor_spark.plans.testbed import ORACLE_SQL, QUERIES
from oracle_check import compare, duck_connection

SF = "@SF@"
con = duck_connection(SF)

names = @SUBSET@
bad = []
for name in names:
    problems = compare(QUERIES[name](spark, SF), con, ORACLE_SQL[name])
    if problems:
        bad.append((name, problems))
        print("FAIL", name, problems, flush=True)
if bad:
    print("HOSTILE-LAYOUT FAILURES:", len(bad))
    sys.exit(1)
print("HOSTILE-LAYOUT PASS", len(names))
"""


@pytest.mark.slow
def test_registry_results_are_partition_layout_invariant(sf_dir, tmp_path):
    script = (
        _SUBPROC.replace("@REPO@", REPO)
        .replace("@SF@", sf_dir)
        .replace("@SUBSET@", repr(SUBSET))
    )
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_TEST_SF_DIR")
    }
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]
    assert "HOSTILE-LAYOUT PASS" in proc.stdout

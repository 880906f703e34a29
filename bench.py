#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Materialization is a noop-sink write (distributed, no driver collect),
so timings measure the full plan, not result transfer. A small warm-up
runs first so JIT/codegen cost lands outside the measured loop.

Each query is timed over $SPARK_GRAFT_BENCH_RUNS runs (default 3) and
the MEDIAN is reported, with per-query spread (max-min) alongside:
round-over-round single-run deltas on a shared box were dominated by
environmental noise (r3->r4 "improved" 24% with zero code change), so
a delta smaller than the recorded spread is noise, not signal.

The legacy-17 GATE stat is the per-query MIN over 5 runs (r11): on a
warm deterministic workload co-tenant pressure only ever ADDS time, so
the minimum is the engine-true reading and cannot overstate speed —
medians were twice (r9, r10) inflated 1.5-2x by box noise, each time
costing an interleaved A/B session to attribute. A `box_noise` flag
marks runs whose total spread exceeds 20% of the total.

Both stats are always EMITTED side by side (`legacy17_sum_sec` =
min-form gate stat, `legacy17_sum_median_sec` = the stat the r1
13.05 s baseline was recorded under; `value` / `value_min` for the
full tail): the r1 baseline cannot be re-derived under the min stat
(its box conditions are gone), so the like-for-like reading of the 2x
gate is median-vs-median, with the min beside it as the noise-proof
engine reading — a gate pass must hold on the MEDIAN comparison too
before claiming headroom (ADVICE r12: min-vs-median-baseline flatters
the ratio by up to the historical noise margin).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dex_data_ingestor_spark.plans.testbed import QUERIES  # noqa: E402
from dex_data_ingestor_spark.session import get_session  # noqa: E402

#: Queries representative of every engine layer; doc-pair similarity
#: queries (quadratic candidate sets) are benchmarked separately in
#: tests, not here, to keep the headline run scan/join/agg bound.
HEADLINE = [
    "q_flagship_daily_revenue",
    "q_group_agg",
    "q_dim_broadcast_join",
    "q_incremental_range",
    "q_dedup_first",
    "q_asof_price",
    "q_yoy_qoq",
    "q_merge_upsert",
    "q_stream_tumbling",
    "q_topk",
    "q_text_stats",
    "q_minhash_lsh",
    "q_minhash_pairs",
    "q_vector_topk",
    "q_stream_session",
    "q_dedup_exact",
    "q_simhash",
    # added r7 (headline set grew 17 -> 22: round-over-round TOTALS are
    # not comparable across this boundary; compare per-query medians)
    "q_sessionize",
    "q_local_supplier_volume",
    "q_promo_revenue",
    "q_outlier_events",
    "q_bm25",
    # VERDICT r6 #3: the heaviest corpus operators (explode-per-
    # character span dedup, char-5-gram MinHash LSH) were unbenched —
    # a regression there was invisible. With these two plus the
    # winnowed span entry below, the headline set is 25.
    "q_dup_substrings",
    "q_charngram_lsh",
    # the winnowed scale configuration of the span family, benched
    # next to the exact path so the 2/(w+1) explode saving is a
    # recorded number, not a claim (rows-only registry entry).
    "q_dup_substrings_winnowed",
    # added late r7 (set 25 -> 28): the strip->curate composition is
    # the heaviest end-to-end pipeline in the registry, and the
    # bloom-pruned contamination sweep is benched NEXT TO the exact
    # one so the prefilter's win/cost is a recorded number.
    "q_contamination",
    "q_bloom_contamination",
    "q_curate_stripped",
    # added r8 (set 28 -> 29): the materialize-then-curate DEFAULT
    # path benched next to the single-statement diamond above, so the
    # pay-the-strip-once saving is a recorded number (VERDICT r7 #3).
    "q_curate_materialized",
    # added late r8 (set 29 -> 35): every new operator family gets a
    # recorded number from day one — semantic dedup, the DSIR
    # fit/sample pair, the hashed-unigram LM, containment, and the
    # cluster-safe split (the heaviest: gram join + iterative CC).
    "q_semdedup",
    "q_dsir_weights",
    "q_dsir_sample",
    "q_unigram_logloss",
    "q_ngram_containment",
    "q_cluster_split",
    # added late r8 (set 35 -> 37): the OHLC bar build — the
    # market-metrics family's scan-heaviest member (full tape, one
    # partial-aggregated exchange carrying six aggregate states) —
    # and the bigram LM (explode + two broadcast model joins: the
    # heaviest hashed-model scoring path).
    "q_ohlc_bars",
    "q_bigram_logloss",
    # the Q21 shape: dual semi/anti self-join on the fact table — the
    # join-planning stress entry.
    "q_waiting_suppliers",
    # tick-rule order flow: two window passes + hourly agg on ONE
    # exchange — the window-reuse stress entry.
    "q_tick_rule_flow",
    # realized variance: lag window + HUGEINT-exact squared-return
    # aggregation, same one-exchange shape.
    "q_realized_var",
    # signed 5-minute markout: consolidation groupBy + THREE window
    # passes (lag, forward range frame, carried sign) + hourly agg,
    # all on one exchange — the heaviest window composition.
    "q_markout",
    # exact gram matrix: the join-free nested-transform explode with
    # partial aggregation folding each task to d(d+1)/2 cells — the
    # widest per-row fan-out in the registry (2080x).
    "q_embed_gram",
    # added late r8 (set 42 -> 47): the last three expressible TPC-H
    # shapes (Q7's disjunctive nation pair, Q2's one-exchange
    # argmin-join-back, Q20's threshold semi-join — all fact-scan
    # joins worth a recorded number) and the composed IVF+PQ index
    # (coarse prune + ADC over integer codes, the heaviest vector
    # path).
    "q_volume_shipping",
    "q_min_cost_supplier",
    "q_part_promotion",
    "q_ann_ivfpq",
    # held-out Stupid-Backoff scoring: three exact-key model joins +
    # the scored-stream left joins — the heaviest LM path.
    "q_backoff_logloss",
    # the gram matrix through the BLAS kernel, benched NEXT TO the
    # expression form above so the measured ~18x is a recorded
    # number, not a claim (set 47 -> 48).
    "q_embed_gram_fast",
    # added late r8, continuation session (set 48 -> 52): the risk
    # legs of the market-metrics family (running-peak drawdown; the
    # cross-asset return-correlation matrix — tape-scan dominated,
    # everything downstream bar-sized), the Naive Bayes classifier
    # (broadcast dense model + class-fanout scoring join), and the
    # hashed-gram containment benched NEXT TO the exact-string form
    # so the 8-byte-key exchange saving is a recorded number.
    "q_drawdown",
    "q_return_corr",
    "q_nb_classify",
    "q_ngram_containment_fast",
    # semantic dedup through the BLAS pair kernel, benched NEXT TO
    # the expression form (set 52 -> 53): same oracle, same survivor
    # set; the within-cell cosine stage is one matmul per cell.
    "q_semdedup_fast",
    # the published heuristic filter battery (Gopher rules; C4 is the
    # same narrow-map family and stays out of the headline run) —
    # zero-shuffle per-row gates, benched for the scan-bound number
    # (set 53 -> 54).
    "q_gopher_rules",
    # round-8 continuation, batch 2 (set 54 -> 57): the edit-distance
    # verify rung (LSH candidates + JVM levenshtein — the per-pair
    # DP is the cost driver, recorded next to the Jaccard verify of
    # q_minhash_pairs), the rolling-vol window leg (one event_type
    # exchange end-to-end), and the JL projection (narrow, zero
    # shuffles — the scan-bound floor for the vector family).
    # q_inverted_index stays out: its shape is q_tfidf's term
    # exchange, already represented.
    "q_edit_distance",
    "q_rolling_vol",
    "q_random_project",
    # PMI phrase mining (set 57 -> 58): pair-keyed + token-keyed
    # exchanges with the min_count prune ahead of the count joins.
    "q_pmi_collocations",
    # round-8 continuation, batch 3 (set 58 -> 60): fixed-iteration
    # integer PageRank (5 chained dst-keyed shuffles over the
    # symmetrized trade graph — the iterative-join stress entry next
    # to q_cluster_split's CC loop) and RRF hybrid retrieval (BM25 +
    # cosine top-50 cuts fused on integer units — two TakeOrdered
    # paths and a 100-row join). q_ab_test stays out: one user-keyed
    # exchange, already represented by q_group_agg's shape.
    "q_pagerank",
    "q_rrf_fusion",
    # batch 4 (set 60 -> 62): exact rank-sum AUC (brute-force scoring
    # + the grouped-score prefix-sum window — the eval rung) and MMR
    # re-ranking (top-depth cut + the O(depth^2) pairwise-sim join +
    # bounded driver-side greedy).
    "q_embed_auc",
    "q_mmr_rerank",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # Subset selector for the interleaved drift-A/B protocol (NOTES:
    # measure a fixed subset in fresh alternating subprocesses before
    # blaming engine code for a slow reading). "legacy17" or a comma
    # list of headline names; unset = full run (the driver's mode).
    # Subset runs SKIP the sidecar/summary contract: they print one
    # ad-hoc JSON line and never overwrite bench_detail.json, so an
    # A/B can't masquerade as an official record.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    subset = None
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        subset = HEADLINE[:17] if only == "legacy17" else names
        # a typo'd selector must error, not print a plausible 0-second
        # "measurement" over zero queries
        assert subset, f"SPARK_GRAFT_BENCH_ONLY selected nothing: {only!r}"
        unknown = [n for n in subset if n not in QUERIES]
        assert not unknown, f"unknown bench names: {unknown}"
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_session(app_name="dex-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: parquet footers/file listings for every table + one JIT
    # pass; query-shape compile costs remain inside the measured loop.
    from dex_data_ingestor_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    materialize(QUERIES["q_count"](spark, sf_dir))

    # The legacy-17 sum is the round-gate number; the r9 driver run
    # proved the box can inflate individual runs 4-5x under co-tenant
    # pressure (spread ~= the measurement). Median-of-5 for those
    # entries tolerates two bad runs instead of one, for ~20 s of
    # extra wall on queries that are each sub-2 s.
    legacy_runs = max(runs, 5)
    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in (subset if subset is not None else HEADLINE):
        # one untimed execution per query excludes codegen/JIT compile
        # from the measurement (steady-state throughput is the metric);
        # every timed run still re-executes the full plan from the scans.
        materialize(QUERIES[name](spark, sf_dir))
        # legacy-17 entries get the deeper sampling in the official
        # run AND in subset A/B probes — a drift-A/B reading must stay
        # statistically comparable to the gate number it cross-checks
        n_runs = legacy_runs if name in HEADLINE[:17] else runs
        samples = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            materialize(QUERIES[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        mins[name] = round(min(samples), 3)
        spread[name] = round(max(samples) - min(samples), 3)

    total = round(sum(timings.values()), 3)
    # Cross-round tail comparisons happen on the MIN total (VERDICT
    # r11 #4): per-query tail medians on a co-tenant box have recorded
    # 10x+ swings with zero code change, so the round-over-round
    # number worth reading is the sum of per-query minima.
    total_min = round(sum(mins.values()), 3)
    if subset is not None:
        print(json.dumps({
            "metric": "bench_subset_wall",
            "value": total,
            "value_min": total_min,
            "unit": "sec",
            "queries": timings,
            "queries_min": mins,
            "spread_sec": spread,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "runs_per_query": runs,
            "legacy17_runs": legacy_runs,
            "stat": "median",
        }))
        spark.stop()
        return
    # The legacy-17 prefix is the only round-over-round comparable
    # subset (the headline set grew 17 -> 62 across rounds); its sum is
    # the number the 2x-of-r1-baseline gate reads. GATE STAT = MIN of
    # the 5 samples (VERDICT r10 #2): the workload is warm and
    # deterministic, so the minimum is the engine-true reading — the
    # standard noise-resistant estimator under co-tenant inflation
    # (which can only ADD time, never subtract it). The r9 driver box
    # inflated single runs 4-5x and median-of-5 still let two bad runs
    # shift the reading; two rounds burned A/B sessions interpreting
    # it. Median stays recorded beside it for drift forensics.
    legacy = HEADLINE[:17]
    legacy_sum = round(sum(mins[n] for n in legacy), 3)
    legacy_sum_median = round(sum(timings[n] for n in legacy), 3)
    total_spread = round(sum(spread.values()), 3)
    # co-tenant pressure flag: when the run-to-run spread is a large
    # fraction of the measurement itself, the box was noisy and any
    # round-over-round delta in the MEDIAN stats is suspect (the min
    # gate stat is designed to stay valid anyway)
    box_noise = bool(total_spread > 0.2 * total)
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "value_min": total_min,
        "unit": "sec",
        "queries": timings,
        "queries_min": mins,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs_per_query": runs,
        "legacy17_runs": legacy_runs,
        "stat": "median",
        "spread_sec": spread,
        "total_spread_sec": total_spread,
        "box_noise": box_noise,
        "legacy17_sum_sec": legacy_sum,
        "legacy17_stat": "min",
        "legacy17_sum_median_sec": legacy_sum_median,
    }
    # Full per-query detail: sidecar file + an EARLY stdout line. The
    # driver captures/parses only the last ~2000 chars of stdout, and
    # at 62 headline entries the full dict is ~3.4 KB — r8's BENCH
    # artifact came back `parsed: null` because of exactly this. The
    # LAST line printed is therefore a compact summary (legacy-17
    # per-query dict + totals, ~0.8 KB) that stays parseable at any
    # future headline-set size.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_detail.json"), "w") as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps(detail))
    summary = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "value_min": total_min,
        "unit": "sec",
        # per-query MIN for the gate subset, so the displayed entries
        # sum to the gate number
        "queries": {n: mins[n] for n in legacy},
        "sf": detail["sf"],
        "runs_per_query": runs,
        "legacy17_runs": legacy_runs,
        "stat": "median(total)/min(legacy17)",
        "n_entries": len(HEADLINE),
        "legacy17_sum_sec": legacy_sum,
        "legacy17_stat": "min",
        "legacy17_sum_median_sec": legacy_sum_median,
        "box_noise": box_noise,
        "detail": "bench_detail.json",
    }
    line = json.dumps(summary)
    assert len(line) < 1900, len(line)  # driver tail-capture budget
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()

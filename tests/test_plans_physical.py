"""Physical-plan assertions: the optimizations the 100 TB design relies
on must actually appear in the plans (SURVEY.md §4, BASELINE scale
posture) — pushdown, pruning, broadcast, no Python UDFs in hot paths.
"""

import re

import pytest
from pyspark.sql import functions as F

from dex_data_ingestor_spark.io import load_table
from dex_data_ingestor_spark.plans.testbed import QUERIES
from tests.conftest import plan_formatted as _plan


def plan_of(spark, sf_dir, name) -> str:
    return _plan(QUERIES[name](spark, sf_dir))


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_point_filter")
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[.*EqualTo\(c_custkey,42\).*\]", plan), plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_scan_project")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_shipdate",
    }


def test_incremental_window_pushes_range_predicate(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_incremental_range")
    # The range must reach the scan as pushed filters on ts regardless
    # of the file's physical encoding (row-group pruning at 100 TB):
    # µs/NTZ events push the half-open bounds directly (GreaterThan);
    # ns-long events push translated long bounds (GreaterThanOrEqual).
    assert re.search(
        r"PushedFilters: \[.*GreaterThan(OrEqual)?\(ts,.*\]", plan
    ), plan
    assert re.search(r"LessThanOrEqual\(ts,", plan), plan


def test_dim_joins_are_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_dim_broadcast_join")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan


def test_flagship_broadcasts_dims_no_python(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_flagship_daily_revenue")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.slow
def test_no_python_udfs_in_any_registered_query(spark, sf_dir):
    offenders = []
    for name in QUERIES:
        plan = plan_of(spark, sf_dir, name)
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"Python UDFs in hot paths: {offenders}"


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_topk")
    assert "TakeOrderedAndProject" in plan, plan


def test_group_agg_has_partial_aggregation(spark, sf_dir):
    """Map-side combine (partial hash agg) before the shuffle."""
    plan = plan_of(spark, sf_dir, "q_group_agg")
    assert plan.count("HashAggregate") >= 2, plan


def test_whole_stage_codegen_covers_narrow_compute(spark, sf_dir):
    # AQE-wrapped plans omit codegen markers before execution; a narrow
    # no-exchange query shows them directly ('*' = inside codegen).
    plan = plan_of(spark, sf_dir, "q_tvl")
    assert "* Project" in plan or "WholeStageCodegen" in plan, plan


def test_partitioned_merge_read_uses_dynamic_pruning(spark, sf_dir, tmp_path):
    """The partition-pruned merge path's existing-side scan must carry a
    dynamic partition pruning filter (only touched date partitions are
    read at 100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("date"), F.col("user_id")
    ).count()
    path = str(tmp_path / "dpp_fact")
    daily.write.mode("overwrite").partitionBy("date").parquet(path)
    existing = spark.read.parquet(path)
    touched = daily.filter(F.col("date") > F.lit("2024-01-20")).select(
        "date"
    ).distinct()
    pruned = existing.join(F.broadcast(touched), "date", "left_semi")
    plan = _plan(pruned)
    assert "dynamicpruning" in plan.lower(), plan


def test_minhash_pairs_reuses_signature_exchange(spark, sf_dir):
    """The LSH candidate self-join + hot-bucket sizing must NOT
    recompute the signature pipeline per branch: after execution the
    final adaptive plan shows the duplicated branches collapsing into
    ReusedExchange (one md5-over-grams computation feeding the sizing
    window, the hot-cell rank window, and both join sides)."""
    df = QUERIES["q_minhash_pairs"](spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "isFinalPlan=true" in final, final[:500]
    assert "ReusedExchange" in final, final


def test_chunk_documents_is_fully_narrow(spark, sf_dir):
    """RAG chunking must be a pure transform+explode — ANY exchange
    here is a regression (the operator's whole value at 100 TB is
    that chunks never leave their document's task)."""
    plan = plan_of(spark, sf_dir, "q_chunk_documents")
    assert "Exchange" not in plan, plan


def test_scd2_single_key_exchange(spark, sf_dir):
    """The SCD2 build is ONE window pass: exactly one hash exchange
    (on the dimension key) and no join in the plan."""
    plan = plan_of(spark, sf_dir, "q_scd2")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "Join" not in plan, plan


def test_token_budget_single_exchange(spark, sf_dir):
    """Token-budget selection is one cumulative window partitioned by
    language: a single hash exchange end-to-end."""
    plan = plan_of(spark, sf_dir, "q_token_budget")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_span_family_shuffles_hash_key_not_gram(spark, sf_dir):
    """The span family's corpus-wide exchange must carry the 64-bit
    xxhash64 key, NOT the raw min_len-char gram string (VERDICT r6 #2:
    the raw form is ~21x the bytes through the heaviest shuffle)."""
    plan = plan_of(spark, sf_dir, "q_dup_substrings")
    assert "xxhash64" in plan, plan
    # the window/exchange key is the hash: no plan node partitions by
    # a string-typed gram column
    assert "hashpartitioning(key#" in plan.replace(" ", "").lower() or (
        "partitionBy" not in plan
    ), plan


def test_order_priority_uses_semi_join_with_residual(spark, sf_dir):
    """Q4 shape: EXISTS must plan as one LEFT SEMI join (per-key
    short-circuit, no dedup-then-join) with the lateness predicate
    riding the join, and the quarter filter pushed to the orders
    scan."""
    plan = plan_of(spark, sf_dir, "q_order_priority")
    assert "LeftSemi" in plan, plan
    assert re.search(r"PushedFilters: \[.*o_orderdate.*\]", plan) or (
        "GreaterThanOrEqual(o_orderdate" in plan
    ), plan


def test_product_profit_broadcasts_both_dims(spark, sf_dir):
    """Q9 shape: the filtered part keys and the supplier+nation fold
    must BOTH broadcast — the only sort-merge-worthy exchange is
    lineitem-orders on orderkey."""
    plan = plan_of(spark, sf_dir, "q_product_profit")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_customer_distribution_left_join_keeps_zero_bucket(spark, sf_dir):
    """Q13 shape: the priority predicate must reach the ORDERS-side
    scan (Catalyst pushes a right-side join-condition predicate below
    a left join, which preserves the zero-order customers), never a
    post-join Filter that would drop the null-extended rows."""
    plan = plan_of(spark, sf_dir, "q_customer_distribution")
    assert "LeftOuter" in plan, plan
    assert re.search(
        r"PushedFilters: \[.*Not\(EqualTo\(o_orderpriority,5-LOW\)\).*\]",
        plan,
    ), plan
    # partial map-side count before the custkey exchange
    assert "partial_count" in plan, plan


def test_small_qty_revenue_copartitions_threshold_join(spark, sf_dir):
    """Q17 shape: the per-part average joins back to lineitem on the
    SAME key both sides shuffle on — no nested-loop / cartesian from
    the decorrelated scalar subquery."""
    plan = plan_of(spark, sf_dir, "q_small_qty_revenue")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bloom_prefilter_is_broadcast_and_jvm_only(spark, sf_dir):
    """The explicit Bloom path must attach the bitmap as a broadcast
    (the key-less one-row attach can ONLY plan as a
    BroadcastNestedLoopJoin — a regressed shuffled attach would plan
    SortMergeJoin/ShuffledHashJoin, both absent here since every join
    in this query is broadcast-sized) and stay fully JVM-side."""
    plan = plan_of(spark, sf_dir, "q_bloom_contamination")
    assert "BroadcastNestedLoopJoin" in plan, plan  # the bitmap attach
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "bitmap" in plan, plan  # probe filter references the array
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "xxhash64" in plan, plan


def test_hashed_model_weight_tables_broadcast_jvm_only(spark, sf_dir):
    """q_dsir_weights / q_unigram_logloss: the O(buckets) weight table
    and the one-row totals must come back as BroadcastExchanges (never
    a shuffled join against the instance stream), and the whole plan
    stays JVM-side — the scoring join is the hot path over the
    exploded corpus."""
    for name in ("q_dsir_weights", "q_unigram_logloss", "q_bigram_logloss"):
        plan = plan_of(spark, sf_dir, name)
        assert plan.count("BroadcastExchange") >= 2, (name, plan)
        assert "Python" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan or (
            plan.count("BroadcastHashJoin") >= 1
        ), name


def test_semdedup_blocks_on_cell_and_anti_joins_losers(spark, sf_dir):
    """q_semdedup: the pair stage joins on the cell key (blocked,
    sub-quadratic — the plan must contain NO cartesian product even
    though pairs-within-cell is conceptually quadratic), the loser
    set is removed with a LeftAnti join, and centroid scoring is pure
    JVM expression (no Python). Join STRATEGY (broadcast vs
    sort-merge) is size-dependent and deliberately not pinned."""
    plan = plan_of(spark, sf_dir, "q_semdedup")
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan
    assert "LeftAnti" in plan, plan


def test_containment_pairs_share_gram_join_no_cartesian(spark, sf_dir):
    """q_ngram_containment prunes the pair space through the shared-
    gram equi-join exactly like the Jaccard twin: no cartesian
    product anywhere, JVM-only. Strategy not pinned (tiny SF
    broadcasts; scale sort-merges under AQE)."""
    plan = plan_of(spark, sf_dir, "q_ngram_containment")
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan
    assert "Join" in plan, plan


def test_ohlc_bars_single_partial_aggregated_exchange(spark, sf_dir):
    """The OHLC bar build is one scan + one keyed exchange: partial
    (map-side) aggregation must carry all six bar states so the
    shuffle moves one row per (group, task) — no window function, no
    join, no Python, no second exchange."""
    plan = plan_of(spark, sf_dir, "q_ohlc_bars")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "partial_min" in plan or "HashAggregate" in plan, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan


def test_waiting_suppliers_semi_anti_no_cartesian(spark, sf_dir):
    """The Q21 shape compiles to equi-joins with residual inequality
    conditions — LEFT SEMI for the multi-supplier EXISTS, LEFT ANTI
    for the sole-late NOT EXISTS — never a cartesian/nested-loop over
    the fact table, with a TakeOrdered top-10 (no global sort) and no
    Python anywhere."""
    plan = plan_of(spark, sf_dir, "q_waiting_suppliers")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Python" not in plan


def test_tick_rule_flow_single_exchange_serves_windows_and_agg(spark, sf_dir):
    """Both window passes (lag, carried last_value) and the hourly
    aggregate share the event_type hash partitioning —
    HashPartitioning(event_type) satisfies the (event_type,
    bar_start) clustering, so the whole query is ONE exchange, no
    join, no Python."""
    plan = plan_of(spark, sf_dir, "q_tick_rule_flow")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan


def test_realized_var_single_exchange(spark, sf_dir):
    """Like the tick rule: the lag window pass and the hourly RV
    aggregate share the event_type hash partitioning — one exchange,
    no join, no Python; the value>0 hygiene filter pushes to the
    scan."""
    plan = plan_of(spark, sf_dir, "q_realized_var")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan
    assert re.search(r"PushedFilters: \[.*GreaterThan\(value,0\.0\).*\]", plan), plan


def test_markout_single_exchange(spark, sf_dir):
    """The consolidation groupBy, all three window passes (lag,
    forward range-frame, carried sign) and the hourly aggregate ride
    one event_type-subset partitioning — a single exchange, no join,
    no Python."""
    plan = plan_of(spark, sf_dir, "q_markout")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan


def test_embed_gram_no_join_single_exchange(spark, sf_dir):
    """The gram matrix must be the narrow nested-transform explode —
    NOT a vec_id self-join of exploded components: no Join node, one
    (i,j)-keyed exchange fed by partial aggregation (each task folds
    to <= d(d+1)/2 cells before shuffling), no Python."""
    plan = plan_of(spark, sf_dir, "q_embed_gram")
    assert "Join" not in plan, plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert "Python" not in plan


def test_min_cost_supplier_one_fact_exchange(spark, sf_dir):
    """The Q2 shape's whole scale story: the explicit partkey
    repartition must serve BOTH the (partkey, suppkey) aggregate and
    the per-part argmin window — exactly ONE non-broadcast exchange
    in the plan (HashPartitioning(partkey) satisfies the two-key
    clustering), every dim join a broadcast, no Python."""
    plan = plan_of(spark, sf_dir, "q_min_cost_supplier")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan


def test_part_promotion_one_fact_exchange(spark, sf_dir):
    """Q20 shape: the partkey repartition serves the aggregate AND
    the per-part total window (one fact-sized exchange); the only
    other exchanges carry supplier-cardinality rows (the suppkey
    distinct and the final sort). The part filter must reach the
    fact side as a broadcast semi join, not a shuffle."""
    plan = plan_of(spark, sf_dir, "q_part_promotion")
    fact_exch = re.findall(
        r"hashpartitioning\(l_partkey", plan
    )
    assert len(fact_exch) == 1, plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 3, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan


def test_volume_shipping_nation_prefilter_prunes_before_shuffle(
    spark, sf_dir
):
    """Q7's disjunctive pair predicate hides a derivable prefilter:
    both dims must be nation-filtered and BROADCAST so lineitem is
    pruned before the orderkey shuffle — supplier and customer joins
    are BroadcastHashJoins and the pair disjunction stays a residual
    filter, never a cartesian."""
    plan = plan_of(spark, sf_dir, "q_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan


def test_drawdown_single_exchange(spark, sf_dir):
    """The running-max window and the final per-instrument aggregate
    share the event_type partitioning — one exchange, no join, no
    Python; the value>0 hygiene filter pushes to the scan."""
    plan = plan_of(spark, sf_dir, "q_drawdown")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan
    assert re.search(
        r"PushedFilters: \[.*GreaterThan\(value,0\.0\).*\]", plan
    ), plan


def test_return_corr_one_tape_exchange_then_bar_sized(spark, sf_dir):
    """The raw tape is shuffled ONCE (the hourly-close partial
    aggregation); every further exchange operates on the bar table
    or the tiny moment table. Assert: the (event_type, bar_start)
    agg exchange exists, partial aggregation precedes it, and no
    Python/cartesian appears."""
    plan = plan_of(spark, sf_dir, "q_return_corr")
    assert "partial_max_by" in plan or re.search(
        r"HashAggregate.*max_by", plan
    ), plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan
    assert re.search(
        r"PushedFilters: \[.*GreaterThan\(value,0\.0\).*\]", plan
    ), plan


def test_nb_classify_model_broadcast_jvm_only(spark, sf_dir):
    """The dense NB model and the prior table ride broadcast joins
    (bounded model state — never a corpus-sized shuffle side), and
    the batch scorer is Python-free end-to-end."""
    plan = plan_of(spark, sf_dir, "q_nb_classify")
    assert "BroadcastExchange" in plan, plan
    assert "Python" not in plan
    # the scoring join itself is broadcast, not sort-merge: the only
    # SortMergeJoin-worthy keys would be doc-sized, and there are none
    assert "SortMergeJoin" not in plan, plan


def test_gopher_and_c4_are_fully_narrow(spark, sf_dir):
    """The heuristic gate batteries are pure per-row maps: ANY
    exchange would mean the 100 TB posture claim is false."""
    for name in ("q_gopher_rules", "q_c4_filters"):
        plan = plan_of(spark, sf_dir, name)
        assert "Exchange" not in plan, (name, plan)
        assert "Python" not in plan, name


def test_rolling_vol_single_exchange(spark, sf_dir):
    """The lag window, the hourly bar aggregate AND the trailing-24
    rolling window all ride one event_type hash partitioning — ONE
    exchange end-to-end, no join, no Python."""
    plan = plan_of(spark, sf_dir, "q_rolling_vol")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan


def test_random_project_fully_narrow(spark, sf_dir):
    """The JL projection is a pure per-row map (quantize, 16 integer
    dot products, posexplode): ANY exchange or Python stage would
    falsify the zero-shuffle scale claim."""
    plan = plan_of(spark, sf_dir, "q_random_project")
    assert "Exchange" not in plan, plan
    assert "Python" not in plan


def test_inverted_index_term_partitioning_reused(spark, sf_dir):
    """The rank window and the df/cf/postings aggregate both ride the
    term-keyed partitioning after the (doc, term) count: EXACTLY two
    exchanges — (doc, term) then term — with no third exchange
    between the window and the final aggregate, and no Python. (No
    WindowGroupLimit: df/cf must see every row, so the cap lives in
    the CASE inside collect_list — the collected array stays bounded
    while the counts stay true.)"""
    plan = plan_of(spark, sf_dir, "q_inverted_index")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 2, plan
    assert "collect_list" in plan, plan
    assert "Python" not in plan


def test_pmi_top_k_is_take_ordered(spark, sf_dir):
    """The collocation cut executes as TakeOrdered (never a global
    sort), the min_count prune sits under partial aggregation, and
    the two count joins stay JVM-side."""
    plan = plan_of(spark, sf_dir, "q_pmi_collocations")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Python" not in plan
    assert "CartesianProduct" not in plan, plan


def test_edit_distance_verify_no_python_no_cartesian(spark, sf_dir):
    """The Levenshtein verify runs as JVM expressions over the pruned
    candidate joins — no Python, no cartesian; the LSH candidate
    generator's bucket self-join provides the sub-quadratic space."""
    plan = plan_of(spark, sf_dir, "q_edit_distance")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan, plan
    assert "levenshtein" in plan, plan


def test_rrf_fusion_take_ordered_cuts_no_python(spark, sf_dir):
    """Both candidate lists must be TakeOrdered top-50 cuts (never a
    full global sort — the only Sorts allowed are the SortMergeJoin's
    own, which run on the two <=depth-row cut outputs) and the whole
    fusion stays JVM-side; the final top-20 is TakeOrdered too. The
    single-row query-vector cross join is a broadcast nested loop,
    not a cartesian."""
    plan = plan_of(spark, sf_dir, "q_rrf_fusion")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("TakeOrderedAndProject") >= 3, plan


def test_ab_test_single_user_exchange_partial_agg(spark, sf_dir):
    """Exactly one user-keyed hash shuffle with map-side partial
    aggregation; the final 4-value reduce is a single-partition agg
    (its exchange moves one row per task, not data)."""
    plan = plan_of(spark, sf_dir, "q_ab_test")
    assert "Python" not in plan
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert "partial_max" in plan, plan
    assert "partial_sum" in plan, plan


def test_pagerank_per_iteration_shuffles_bounded(spark, sf_dir):
    """The checkpointed PageRank loop must not let lineage compound:
    the FINAL iteration's plan (what executes after the last
    localCheckpoint truncation) reads checkpointed RDDs and performs
    only that round's own joins — no Python, no cartesian."""
    plan = plan_of(spark, sf_dir, "q_pagerank")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan


def test_embed_auc_partial_agg_no_python_broadcast_query(spark, sf_dir):
    """The scoring pass must broadcast the single-row query vector
    (never a cartesian), the tie-group rollup must partial-aggregate
    map-side before its one exchange, and the whole rank-sum algebra
    stays JVM-side. The rank prefix-sum must be the TWO-LEVEL form:
    the running-total window over the grouped score table is
    PARTITIONED by range bucket (hashpartitioning(__bucket) in the
    plan), and the bucket offsets attach by broadcast — no
    data-sized single-partition window anywhere."""
    plan = plan_of(spark, sf_dir, "q_embed_auc")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "hashpartitioning(__bucket" in plan, plan


def test_mmr_shortlist_is_take_ordered_cut_no_python(spark, sf_dir):
    """MMR's distributed stage must cut to the depth-50 shortlist via
    TakeOrderedAndProject (not a global sort), broadcast the one-row
    query vector, and stay JVM-side — the driver-side greedy only
    ever sees the O(depth)+O(depth^2) integer tables."""
    from dex_data_ingestor_spark.plans.testbed import _mmr_shortlist
    from tests.conftest import plan_formatted

    plan = plan_formatted(_mmr_shortlist(spark, sf_dir))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_important_stock_reuses_partkey_exchange(spark, sf_dir):
    """Q11's global total must aggregate FROM the per-part exchange,
    not rescan the facts: the executed adaptive plan collapses the
    grouped branch and the total branch into a ReusedExchange — one
    fact scan, one partkey shuffle, then a one-row broadcast back."""
    df = QUERIES["q_important_stock"](spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "isFinalPlan=true" in final, final[:500]
    assert "ReusedExchange" in final, final


def test_priority_lateness_pushes_year_filter_no_python(spark, sf_dir):
    """Q12's ship-year window must reach the lineitem scan as pushed
    filters (row-group pruning at 100 TB); the lateness predicate
    needs both sides so it rides the orderkey join as a residual.
    Conditional counts stay JVM-side with map-side partial agg."""
    plan = plan_of(spark, sf_dir, "q_priority_lateness")
    assert "Python" not in plan
    assert re.search(r"PushedFilters: \[.*l_shipdate.*\]", plan), plan
    assert "partial_sum" in plan, plan


def test_debounce_single_key_exchange(spark, sf_dir):
    """The lag window, the running burst sum, and the leader rank must
    all ride ONE (user_id, event_type) hash exchange — debounce
    inherits sessionize's single-shuffle shape."""
    plan = plan_of(spark, sf_dir, "q_debounce")
    assert "Python" not in plan
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_quantiles_single_exchange_no_python(spark, sf_dir):
    """q_quantiles' exact order-statistic form: the rank window and the
    group aggregate share the event_type partitioning — exactly one
    hash exchange, no join, and the whole pipeline stays JVM-side."""
    plan = plan_of(spark, sf_dir, "q_quantiles")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_stats_agg_single_exchange_exact_moments(spark, sf_dir):
    """q_stats_agg: one partial+final hash aggregate pair over ONE
    exchange; the moment sums are decimal (exact), never the native
    stddev/corr streaming buffers (their partial-merge order would
    make results layout-dependent)."""
    plan = plan_of(spark, sf_dir, "q_stats_agg")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    for native in ("stddev_samp(", "var_samp(", "corr(", "covar_samp("):
        assert native not in plan, (native, plan)


def test_incremental_agg_maintenance_joins_on_group_key(spark, sf_dir):
    """q_incremental_agg's maintenance step: the |delta| rows aggregate
    through their own partial+final pair and merge into the base via
    ONE full-outer join keyed on the group columns — the fact table is
    scanned only to seed/derive the deltas, never rescanned by the
    merge, and nothing crosses into Python. At 100 TB the base side is
    the snapshot-stored aggregate (group-cardinality-sized), so the
    join cost is O(touched groups), which is what this plan shape
    certifies."""
    plan = plan_of(spark, sf_dir, "q_incremental_agg")
    assert "FullOuter" in plan, plan
    # group-key join: null-safe equality on both grouping columns
    assert "l_returnflag" in plan and "l_linestatus" in plan, plan
    assert "Python" not in plan, plan
    # one join total — base agg vs delta agg; no second join sneaks a
    # fact rescan into the merge
    assert len(re.findall(r"^\(\d+\) SortMergeJoin|^\(\d+\) ShuffledHashJoin|^\(\d+\) BroadcastHashJoin", plan, re.M)) == 1, plan


def test_iterative_loop_bodies_pinned(spark):
    """VERDICT r11 #3: the iterative operators' per-round plans were
    invisible to the exchange-count regression net — eager
    localCheckpoint truncates lineage, so q_pagerank pinned
    'exchanges: 0' and a lost co-partition in the LOOP BODY would not
    fail any named test. Pin one unrolled round of each loop:

    - pagerank round: 4 exchanges (edges side, rank side, the inflow
      aggregate, the update join's node side — localCheckpoint scans
      come back UnknownPartitioning, so both joins re-shuffle their
      LogicalRDD inputs; the inventory's q_pagerank entry now also
      pins this, since the last round is left lazy).
    - connected-components round: the symmetrized edge table is
      repartitioned on the join key and CACHED (a cached plan keeps
      its output partitioning), so the 2|E| edge rows never
      re-shuffle — pinned by walking the join's edge-side branch down
      to the InMemoryTableScan and requiring no Exchange on the way
      (the round then moves only the O(N) label rows: join side +
      re-aggregation).

    Both bodies stay JVM-side with no cartesian products. Broadcast
    joins are disabled for the pin: a checkpointed LogicalRDD carries
    its origin stats, so on a toy graph the optimizer broadcasts the
    small rank/label tables (fine — strictly fewer shuffles), which
    would make the exchange count depend on size estimates instead of
    the co-partitioning this test protects."""
    from dex_data_ingestor_spark.operators.graph import (
        _cc_round,
        _pagerank_round,
    )

    def metrics(plan: str) -> tuple[int, int, bool]:
        return (
            len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M)),
            len(re.findall(r"CartesianProduct", plan)),
            "Python" in plan,
        )

    edges = spark.range(0, 2_000).select(
        F.col("id").alias("src"), (F.col("id") % 97).alias("dst")
    )
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sym = None
    try:
        # --- pagerank round (mirrors pagerank_units' loop setup; p is
        # a mid-loop checkpoint, the steady-state round input) ---
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        ed = edges.join(deg, "src").localCheckpoint(eager=True)
        nodes = (
            ed.select(F.col("src").alias("node"))
            .union(ed.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        p0 = nodes.withColumn("units", F.lit(1_000_000).cast("long"))
        p = _pagerank_round(ed, nodes, p0, 85).localCheckpoint(eager=True)
        body = _plan(_pagerank_round(ed, nodes, p, 85))
        assert metrics(body) == (4, 0, False), body

        # the full operator's returned plan shows EXACTLY one lazy
        # round for any n_iter (review r12: a start-anchored cadence
        # left a 2-round tail whenever cadence divided n_iter — n_iter
        # =4 with the default cadence 2 is exactly that case)
        from dex_data_ingestor_spark.operators.graph import (
            pagerank_units,
        )

        for n_iter in (4, 5):
            full = _plan(pagerank_units(edges, n_iter=n_iter))
            assert metrics(full) == (4, 0, False), (n_iter, full)

        # --- connected-components round (the loop's cached sym) ---
        sym = (
            edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            .union(
                edges.select(
                    F.col("dst").alias("a"), F.col("src").alias("b")
                )
            )
            .distinct()
            .repartition("a")
            .persist()
        )
        labels = (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .localCheckpoint(eager=True)
        )
        body = _plan(_cc_round(sym, labels))
        # the sym side must read the CACHE with no re-shuffle: walk
        # the join's left (':'-prefixed) branch down to the cache scan
        # and require no Exchange on the way (a plain exchange count
        # would also pick up the exchanges INSIDE the cached plan,
        # which the formatted explain embeds under InMemoryRelation)
        lines = body.splitlines()
        smj = next(
            i for i, ln in enumerate(lines) if "SortMergeJoin" in ln
        )
        branch, found = [], False
        for ln in lines[smj + 1:]:
            if not ln.lstrip().startswith(":"):
                break
            if "InMemoryTableScan" in ln:
                found = True
                break
            branch.append(ln)
        assert found, body
        assert not any("Exchange" in ln for ln in branch), body
        assert "CartesianProduct" not in body, body
        assert "Python" not in body, body
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        if sym is not None:
            sym.unpersist()


@pytest.mark.slow
def test_plan_shape_inventory_pinned(spark):
    """Registry-wide shuffle-regression net: the initial-plan shape of
    EVERY query — shuffle-exchange count, broadcast count, cartesian
    count, Python presence — is pinned to tests/plan_inventory.json
    (generated at sf0.001 under the standard session confs). A change
    that silently adds an exchange to any of the 176 queries, demotes
    a broadcast to a shuffle, sneaks in a cartesian product, or drops
    Python into a JVM-only plan fails HERE naming the query, instead
    of surfacing as a bench regression two rounds later.

    Counts are INITIAL (pre-AQE) plans, so the deliberate diamonds
    overstate runtime exchanges (ReusedExchange appears only in
    executed adaptive plans) — that is fine for a regression pin;
    stability is what matters. If a pinned value changes for a GOOD
    reason (an optimization, a Spark upgrade), review the diff and
    regenerate: the test docstring IS the recipe — build each query at
    sf0.001, explain('formatted'), recount, rewrite the JSON."""
    import contextlib
    import io
    import json
    import os

    from dex_data_ingestor_spark.plans.testbed import QUERIES

    sf = "/root/testdata/sf0.001"
    pin_path = os.path.join(os.path.dirname(__file__), "plan_inventory.json")
    with open(pin_path) as fh:
        pinned = json.load(fh)
    assert set(pinned) == set(QUERIES), (
        "registry and plan inventory diverged: "
        f"{set(pinned) ^ set(QUERIES)}"
    )

    def metrics(plan: str) -> dict:
        return {
            "exchanges": len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M)),
            "broadcasts": len(
                re.findall(r"^\(\d+\) BroadcastExchange\b", plan, re.M)
            ),
            "cartesian": len(re.findall(r"CartesianProduct", plan)),
            "python": bool(
                re.search(
                    r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
                    r"|BatchEvalPython|PythonMapInArrow",
                    plan,
                )
            ),
        }

    drift = []
    for name, fn in QUERIES.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf).explain("formatted")
        got = metrics(buf.getvalue())
        if got != pinned[name]:
            drift.append((name, {"pinned": pinned[name], "got": got}))
    assert not drift, f"plan shapes drifted: {drift}"


@pytest.mark.slow
def test_global_windows_only_on_bounded_inputs(spark):
    """A Window with no PARTITION BY moves its entire input to one
    task — the quietest scale-killer Spark offers (WindowExec warns,
    nobody reads warnings). Registry-wide sweep of every physical
    plan: global window specs may appear ONLY in the four queries
    whose input at that node is bounded by construction —

      q_surrogate_join  dense_rank over DISTINCT dim tuples (dim
                        cardinality; surrogate keys need global order)
      q_revenue_share   rank over nation-level aggregates (~25 rows)
      q_rrf_fusion      ranks over top-k cuts (k=50 per leg)
      q_embed_auc       level-2 prefix sum over bucket summaries
                        (5,000 rows; the level-1 pass is partitioned)

    Any other query growing a global window fails here naming it.
    Discrimination note: the formatted node prints [funcs],[part],
    [order] for partitioned+ordered but only two groups when either
    is absent, so the reliable signal is the windowspecdefinition
    argument list — unpartitioned iff every non-frame arg carries a
    sort direction (partition columns print bare)."""
    import contextlib
    import io

    from dex_data_ingestor_spark.plans.testbed import QUERIES

    sf = "/root/testdata/sf0.001"
    allowed = {
        "q_surrogate_join", "q_revenue_share", "q_rrf_fusion",
        "q_embed_auc",
    }

    def specs(text):
        out = []
        for m in re.finditer(r"windowspecdefinition\(", text):
            depth, start = 1, m.end()
            for i in range(start, len(text)):
                if text[i] == "(":
                    depth += 1
                elif text[i] == ")":
                    depth -= 1
                    if depth == 0:
                        out.append(text[start:i])
                        break
        return out

    def is_global(spec):
        args, depth, cur = [], 0, ""
        for ch in spec:
            if ch == "," and depth == 0:
                args.append(cur.strip())
                cur = ""
            else:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                cur += ch
        args.append(cur.strip())
        args = [a for a in args if not a.startswith("specifiedwindowframe")]
        if not args:
            return True
        return all(" ASC" in a or " DESC" in a for a in args)

    offenders = {}
    for name, fn in QUERIES.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf).explain("formatted")
        plan = buf.getvalue()
        for block in re.findall(
            r"^\(\d+\) Window\n(?:^(?!\(\d).*\n)*", plan, re.M
        ):
            m = re.search(r"Arguments: (.*)", block)
            if m and any(is_global(s) for s in specs(m.group(1))):
                offenders.setdefault(name, 0)
                offenders[name] += 1
                break
    assert set(offenders) <= allowed, (
        "global (unpartitioned) windows outside the bounded-input "
        f"allowlist: {sorted(set(offenders) - allowed)}"
    )

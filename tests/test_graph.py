"""Unit tests for iterative connected components (operators/graph.py)."""

from pyspark.sql import functions as F

from dex_data_ingestor_spark.operators.graph import (
    component_survivors,
    connected_components,
)


def test_chain_and_isolated_pair(spark):
    # 1-2, 2-3, 3-4 is one chain (diameter 3); 10-11 a separate pair
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cycle_converges(spark):
    edges = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 5)], ["src", "dst"]
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {5: 5, 6: 5, 7: 5}


def test_component_survivors(spark):
    edges = spark.createDataFrame(
        [(2, 9), (9, 4), (20, 21)], ["src", "dst"]
    )
    labels = connected_components(edges)
    surv = {
        r["component"]: (r["survivor"], r["n_members"])
        for r in component_survivors(labels).collect()
    }
    assert surv == {2: (2, 3), 20: (20, 2)}


def test_edit_distance_pairs_blocks_and_filters(spark):
    from dex_data_ingestor_spark.operators.entity import edit_distance_pairs

    rows = [
        (1, "token-abcd"),
        (2, "token-abcx"),   # 1 substitution from 1
        (3, "token-zzzz"),   # far from everything
        (4, "token-abcd"),   # exact dup of 1 (dist 0)
        (5, "tok-abcd"),     # different length: blocked out by design
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.a_id, r.b_id): r.dist
        for r in edit_distance_pairs(df, "id", "name", max_dist=1).collect()
    }
    assert got == {(1, 2): 1, (1, 4): 0, (2, 4): 1}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)


def test_operators_tolerate_empty_inputs(spark):
    """Empty sources must yield empty results, not HOF/loop errors —
    an hourly window with no new rows is the common case, not the
    edge case."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from dex_data_ingestor_spark.operators.entity import edit_distance_pairs
    from dex_data_ingestor_spark.operators.neardup import (
        lsh_band_buckets_wide,
        lsh_match_against_index,
        minhash_signatures_wide,
    )

    doc_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    empty_docs = spark.createDataFrame([], doc_schema)
    wide = minhash_signatures_wide(empty_docs, "doc_id", "text")
    buckets = lsh_band_buckets_wide(wide, "doc_id")
    assert buckets.count() == 0

    some_docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], doc_schema
    )
    idx = lsh_band_buckets_wide(
        minhash_signatures_wide(some_docs, "doc_id", "text"), "doc_id"
    )
    assert lsh_match_against_index(buckets, idx, "doc_id").count() == 0

    edge_schema = StructType([
        StructField("src", LongType()), StructField("dst", LongType()),
    ])
    empty_edges = spark.createDataFrame([], edge_schema)
    assert connected_components(empty_edges).count() == 0

    name_schema = StructType([
        StructField("id", LongType()), StructField("name", StringType()),
    ])
    empty_names = spark.createDataFrame([], name_schema)
    assert edit_distance_pairs(empty_names, "id", "name").count() == 0


def test_countmin_absent_item_estimates_zero(spark):
    from dex_data_ingestor_spark.operators.sketch import (
        countmin_estimates,
        countmin_table,
    )

    data = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2, ["item"]
    )
    cms = countmin_table(data, "item", depth=4, width=64)
    items = spark.createDataFrame(
        [("a",), ("b",), ("never-seen",)], ["item"]
    )
    est = {
        r.item: r.est
        for r in countmin_estimates(cms, items, "item").collect()
    }
    assert est["a"] >= 5 and est["b"] >= 2  # CMS never undercounts
    assert est["never-seen"] == 0           # absent -> 0, not missing


def test_pagerank_units_hand_walked_path_graph(spark):
    """2 iterations on the symmetric path A-B-C, hand-derived:
    p1 = (575000, 1850000, 575000); p2 = (936250, 1127500, 936250).
    Pins the exact integer update (contribution = units div outdeg,
    next = 150000 + 85% * inflow div 100) the oracle unrolls."""
    from dex_data_ingestor_spark.operators.graph import pagerank_units

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], ["src", "dst"]
    )
    p1 = {
        r["node"]: r["units"]
        for r in pagerank_units(edges, n_iter=1).collect()
    }
    assert p1 == {1: 575000, 2: 1850000, 3: 575000}
    p2 = {
        r["node"]: r["units"]
        for r in pagerank_units(edges, n_iter=2).collect()
    }
    assert p2 == {1: 936250, 2: 1127500, 3: 936250}


def test_pagerank_cadence_invariance(spark):
    """Checkpoint placement is an execution detail: every cadence must
    produce bit-identical units (r12 re-planned the loop — node list
    from the checkpointed edge table, end-anchored truncation with a
    lazy last round — and this pins that none of it touches values).
    Random-ish 40-node graph, 5 iterations, cadences 1/2/3/huge."""
    from dex_data_ingestor_spark.operators.graph import pagerank_units

    edges = spark.createDataFrame(
        [(i % 40, (i * 7 + 3) % 40) for i in range(160)], ["src", "dst"]
    )
    results = []
    for ck in (1, 2, 3, 99):
        results.append(sorted(
            (r["node"], r["units"])
            for r in pagerank_units(
                edges, n_iter=5, checkpoint_every=ck
            ).collect()
        ))
    assert results[0] == results[1] == results[2] == results[3]


def test_pagerank_dangling_node_keeps_base_mass(spark):
    """Directed edge into a sink: the sink receives mass but emits
    none (documented dangling simplification); the source, with no
    inflow, lands exactly on the 150000-unit base."""
    from dex_data_ingestor_spark.operators.graph import pagerank_units

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    p1 = {
        r["node"]: r["units"]
        for r in pagerank_units(edges, n_iter=1).collect()
    }
    # node 1: no inflow -> 150000; node 2: inflow 1000000 div 1
    assert p1 == {1: 150000, 2: 1000000}
    p2 = {
        r["node"]: r["units"]
        for r in pagerank_units(edges, n_iter=2).collect()
    }
    # node 2's mass is trapped (no out-edge); node 1 emits 150000
    assert p2 == {1: 150000, 2: 277500}


def test_kmv_distinct_ignores_nulls_and_matches_grouped_form(spark):
    """NULLs are not values: md5_int64(NULL) is NULL, which Spark's
    ascending rank window orders FIRST — before the fix every real
    rank shifted by one, so the k-th slot held the (k-1)-th smallest
    hash (systematic overestimate) and the exact branch counted NULL
    as a distinct value. Also pins the ungrouped path — a distributed
    top-k, not a global window — against the grouped path's value on
    identical data."""
    from dex_data_ingestor_spark.operators.sketch import kmv_distinct

    rows = [(str(i),) for i in range(100)] + [(None,), (None,)]
    df = spark.createDataFrame(rows, "v string")

    # grouped form on a constant key == ungrouped form, values equal
    g = kmv_distinct(
        df.withColumn("k", F.lit(1)), "v", k=64, group_by=["k"]
    ).collect()[0]
    u = kmv_distinct(df, "v", k=64).collect()[0]
    assert g.kth_min_hash == u.kth_min_hash
    assert g.est_distinct == u.est_distinct

    # the NULL rows are invisible: same result as the NULL-free input
    clean = kmv_distinct(
        spark.createDataFrame(rows[:100], "v string"), "v", k=64
    ).collect()[0]
    assert (u.kth_min_hash, u.est_distinct) == (
        clean.kth_min_hash,
        clean.est_distinct,
    )

    # under k distinct non-null values: exact branch, NULL not counted
    small = spark.createDataFrame(
        [(str(i),) for i in range(10)] + [(None,)], "v string"
    )
    assert kmv_distinct(small, "v", k=64).collect()[0].est_distinct == 10.0

    # non-string columns hash their string rendering (cast inside)
    ints = spark.createDataFrame([(i,) for i in range(10)], "v long")
    got = kmv_distinct(ints, "v", k=64).collect()[0]
    assert got.est_distinct == 10.0


def test_kmv_distinct_ungrouped_plan_has_no_global_window(spark):
    """The ungrouped estimate must be a distributed top-k (TakeOrdered
    / limit), never a single-partition Window sort of every distinct
    hash — the scale posture the registry's global-window audit
    enforces for table-sized inputs."""
    from tests.conftest import plan_formatted

    from dex_data_ingestor_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([(str(i),) for i in range(50)], "v string")
    plan = plan_formatted(kmv_distinct(df, "v", k=8))
    assert "Window" not in plan, plan
    # ADVICE r10: the former two-branch form (top-k cross-joined with a
    # separate global count) evaluated the deduped hash set twice. The
    # single-branch form reads the source ONCE and has no join at all —
    # when the top-k is unsaturated its own row count is the exact
    # distinct count, so the second pass was redundant by construction.
    assert "Join" not in plan, plan
    # formatted plans print each node twice (tree line + detail
    # section), so ONE scan node == exactly 2 occurrences
    assert plan.count("Scan ExistingRDD") <= 2, plan


def test_masked_blocking_equals_segment_blocking_on_shared_prefix(spark):
    """r13 optimization pin: at max_dist=1 the masked-position block
    must emit exactly the pairs the tau+1-segment PassJoin block did —
    on a SHARED-PREFIX corpus, the shape that collapsed the segment
    block into one quadratic bucket (every TPC-H name opens with
    'Customer#'; 15k names -> 112M candidates -> 376 s at sf0.1). The
    reference result is computed with the original segment-block
    plan spelled out inline."""
    from pyspark.sql import functions as F

    from dex_data_ingestor_spark.operators.entity import (
        _segment_exprs,
        edit_distance_pairs,
    )

    rows = [(i, f"Customer#{i % 97:04d}") for i in range(300)] + [
        (1000, "Customer#"),      # equals the shared prefix exactly
        (1001, "Xustomer#0001"),  # 1 sub from id 1 group's member
        (1002, ""),               # empty
        (1003, ""),               # empty dup — dist 0 pair
    ]
    df = spark.createDataFrame(rows, ["id", "name"])

    # reference: the pre-r13 segment-block candidate generation
    segs = _segment_exprs("name", 2)
    seg_structs = F.array(
        *[
            F.struct(F.lit(i).alias("seg_i"), F.expr(s).alias("seg"))
            for i, s in enumerate(segs)
        ]
    )
    blocked = df.select(
        F.col("id"),
        F.col("name").alias("s"),
        F.length("name").alias("len"),
        F.explode(seg_structs).alias("g"),
    ).select("id", "s", "len", "g.seg_i", "g.seg")
    a = blocked.select(
        F.col("id").alias("a_id"), F.col("s").alias("a_s"),
        "len", "seg_i", "seg",
    )
    b = blocked.select(
        F.col("id").alias("b_id"), F.col("s").alias("b_s"),
        "len", "seg_i", "seg",
    )
    ref = {
        (r.a_id, r.b_id): r.dist
        for r in (
            a.join(b, ["len", "seg_i", "seg"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", "a_s", "b_s")
            .distinct()
            .withColumn("dist", F.levenshtein(F.col("a_s"), F.col("b_s")))
            .filter(F.col("dist") <= 1)
            .select("a_id", "b_id", "dist")
        ).collect()
    }
    got = {
        (r.a_id, r.b_id): r.dist
        for r in edit_distance_pairs(df, "id", "name", max_dist=1).collect()
    }
    assert got == ref
    assert (1002, 1003) in got and got[(1002, 1003)] == 0

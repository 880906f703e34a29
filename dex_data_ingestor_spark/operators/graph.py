"""Iterative graph operators for dedup-cluster collapse.

Near-dup detection (operators/neardup.py) emits PAIRS; turning pairs
into survivor sets needs the transitive closure — docs A~B and B~C must
land in one cluster even though A and C were never compared. That is
connected components, an inherently iterative algorithm (the reference
has no analog; its dedup is per-batch Python sets,
src/ingestion/tasks/bifrost/stellar/Stellar.py:39).

Spark-first design: min-label propagation expressed as joins +
groupBy-min per round. The symmetrized edge table is repartitioned on
its join key ONCE and cached (a cached plan keeps its output
partitioning), so each round's offers join is co-partitioned on the
edge side and moves only the O(N) label rows. Rounds needed = graph
diameter (near-dup clusters are dense, so typically 2-4). Per-round
label lineage is truncated with ``localCheckpoint`` so the plan does
not grow exponentially — on a real cluster set a checkpoint dir and
use ``checkpoint`` for fault tolerance instead; the edge cache is
dropped before returning.

At 100 TB the same loop holds: the edge table is partitioned by node id
and cached (MEMORY_AND_DISK — spills, never recomputes the upstream),
every round is one co-partitioned join plus one label shuffle, and no
state ever sits on the driver (the only driver value is the 1-row
convergence count).

The per-round LOOP BODIES are exposed as :func:`_cc_round` /
:func:`_pagerank_round` so the plan-shape regression net can pin one
unrolled round's exchange count — eager checkpoints otherwise hide the
iterative operators' plans behind a LogicalRDD scan (``exchanges: 0``),
the r11 verdict's plan-inventory blind spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cc_round(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label-propagation round, built LAZILY: each node offers
    its label to every neighbor, then keeps the min of its own label
    and all offers. ``sym`` arrives CACHED with hashpartitioning(a)
    (the loop repartitions once and persists — a cached plan keeps its
    output partitioning, where a ``localCheckpoint`` scan comes back
    UnknownPartitioning), so the 2|E| edge rows never re-shuffle: the
    round moves only the O(N) label rows (the join's labels side plus
    the label re-aggregation)."""
    offers = sym.join(
        labels.withColumnRenamed("node", "a"), "a"
    ).select(F.col("b").alias("node"), "component")
    return (
        labels.union(offers)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph with the minimum node id
    reachable from it (its component id).

    Returns (node, component) with one row per distinct node appearing
    in ``edges``. Converges when no label changes; raises if
    ``max_iter`` rounds are not enough (pathological path graphs —
    raise ``max_iter`` or pre-contract).
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    # distinct leaves sym partitioned on (a, b); one up-front
    # repartition on the join key + CACHE makes every round's offers
    # join co-partitioned on the edge side (a cached plan keeps its
    # output partitioning; a localCheckpoint scan would come back
    # UnknownPartitioning and re-shuffle 2|E| rows per round). The
    # cache is dropped before returning — per-round label tables are
    # still lineage-truncated with localCheckpoint, so plans stay
    # shallow while the edge table stays hot.
    sym = sym.distinct().repartition("a").persist()
    try:
        labels = (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .localCheckpoint(eager=True)  # also materializes the cache
        )

        for _ in range(max_iter):
            new_labels = _cc_round(sym, labels).localCheckpoint(
                eager=True
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        sym.unpersist()


def component_survivors(
    labels: DataFrame,
    node: str = "node",
    component: str = "component",
) -> DataFrame:
    """Collapse components to their minimum-id survivor: one row per
    component with the survivor id and member count (the cluster-level
    form of the first-wins dedup rule)."""
    return labels.groupBy(component).agg(
        F.min(node).alias("survivor"),
        F.count(F.lit(1)).alias("n_members"),
    )


def _pagerank_round(
    ed: DataFrame,
    nodes: DataFrame,
    p: DataFrame,
    damping_pct: int,
) -> DataFrame:
    """One PageRank update, built LAZILY: per-edge contribution
    ``units div outdeg`` summed by destination, then the damped update
    against the full node list. ``ed`` is partitioned on ``src`` (from
    its degree join) and ``p`` on ``node`` (from the previous round's
    update join), so the contribution join is co-partitioned; the
    inflow aggregate is the round's one exchange, and its dst-keyed
    output co-partitions with the node-keyed ``nodes`` for the update
    join. Exact BIGINT arithmetic throughout (see
    :func:`pagerank_units`)."""
    base = (100 - damping_pct) * 10_000
    inflow = (
        ed.join(p, ed["src"] == p["node"])
        .select("dst", F.expr("units div outdeg").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    return nodes.join(
        inflow, nodes["node"] == inflow["dst"], "left"
    ).select(
        "node",
        (
            F.lit(base).cast("long")
            + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
        ).alias("units"),
    )


def pagerank_units(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer micro-units.

    Cross-engine determinism is the whole design: every step is BIGINT
    arithmetic — each node starts at 1_000_000 units, a node's
    per-edge contribution is ``units div outdeg`` (integral division),
    and the update is ``(100 - d)% * 10_000 + (d% * sum) div 100`` —
    so a DuckDB oracle unrolling the same ``n_iter`` chained CTEs is
    bit-identical, with zero float caveat anywhere (the q_twap /
    PQ-pipeline integer discipline applied to an iterative graph
    algorithm). Floor losses from the two integral divisions leak a
    few units of mass per node per round; both engines leak
    identically, and ranking is unaffected at any realistic scale.

    ``edges`` must already contain every direction that should carry
    mass (pass a symmetrized table for undirected semantics). Nodes
    with no out-edges (possible only in directed inputs) hold mass but
    never emit it — the standard dangling simplification; callers who
    need mass conservation can symmetrize. Returns (node, units) for
    every node appearing as a source or destination.

    At 100 TB: each iteration is ONE shuffle keyed on ``dst`` with
    map-side partial sums (the contribution join is co-partitioned —
    see :func:`_pagerank_round`); the edges-with-degree table is
    computed once and its lineage truncated, and the NODE list derives
    from that checkpointed table instead of re-running the upstream
    edge build a second time. Driver state is zero; convergence is not
    polled (fixed iteration count).

    ``checkpoint_every`` bounds lineage growth: the rank table's
    lineage is truncated every that-many rounds (``localCheckpoint`` —
    swap for ``checkpoint`` with a checkpoint dir on a real cluster).
    The cadence is anchored at the END so that EXACTLY the last round
    is left lazy for any (n_iter, cadence) combination — the returned
    plan always shows one round's shape to plan audits (the r11
    verdict's ``exchanges: 0`` blind spot; a start-anchored ``i %
    cadence`` would leave a 2-round tail whenever cadence divides
    n_iter, silently doubling the pinned exchange count). Cadence
    chosen by measurement
    (r12 NOTES, sf0.1, 5 iterations, interleaved min-of-5): every-2
    == every-1 at ~4.0 s and FULLY lazy is ~1 s slower (AQE plans
    each small checkpointed job from materialized stats and the
    hoped-for cross-round ReusedExchange does not pay for the lost
    per-stage adaptivity), so the default halves the barrier count at
    zero measured cost. NOTE a PySpark ``localCheckpoint`` scan comes
    back with UnknownPartitioning, so each truncation point costs the
    next round one edge re-shuffle — at very large scale with a real
    ``checkpoint`` dir, weigh that against lineage depth.
    """
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    # every src also appears in ed (the degree join drops nothing), so
    # the node list is a cheap pass over the CHECKPOINTED edges — the
    # old form re-ran the caller's whole upstream edge build (at
    # q_pagerank's shape, a second orders|><|lineitem + distinct)
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    p = nodes.withColumn("units", F.lit(1_000_000).cast("long"))
    for i in range(1, n_iter + 1):
        p = _pagerank_round(ed, nodes, p, damping_pct)
        # end-anchored: truncate at rounds n_iter-1, n_iter-1-c, ... so
        # the lazy tail is always exactly ONE round (for n_iter=5, c=2
        # this is rounds 2 and 4 — identical barriers to the measured
        # configuration)
        if i < n_iter and (n_iter - 1 - i) % checkpoint_every == 0:
            p = p.localCheckpoint(eager=True)
    return p

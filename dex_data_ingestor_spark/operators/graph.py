"""Iterative graph operators for dedup-cluster collapse.

Near-dup detection (operators/neardup.py) emits PAIRS; turning pairs
into survivor sets needs the transitive closure — docs A~B and B~C must
land in one cluster even though A and C were never compared. That is
connected components, an inherently iterative algorithm (the reference
has no analog; its dedup is per-batch Python sets,
src/ingestion/tasks/bifrost/stellar/Stellar.py:39).

Spark-first design: min-label propagation expressed as joins +
groupBy-min per round. Each round is one shuffle on the edge key and
one on the node key; rounds needed = graph diameter (near-dup clusters
are dense, so typically 2-4). Lineage is truncated every round with
``localCheckpoint`` so the plan does not grow exponentially — on a real
cluster set a checkpoint dir and use ``checkpoint`` for fault
tolerance instead.

At 100 TB the same loop holds: labels and edges are both partitioned by
node id, every round is a pair of co-partitioned shuffles, and no state
ever sits on the driver (the only driver value is the 1-row convergence
count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # each node offers its label to every neighbor, then keeps the
        # min of its own label and all offers
        offers = sym.join(
            labels.withColumnRenamed("node", "a"), "a"
        ).select(F.col("b").alias("node"), "component")
        new_labels = (
            labels.union(offers)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
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


def pagerank_units(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
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
    map-side partial sums; the edges-with-degree table is computed
    once and its lineage truncated, each round's rank table likewise
    (``localCheckpoint`` — swap for ``checkpoint`` with a checkpoint
    dir on a real cluster). Driver state is zero; convergence is not
    polled (fixed iteration count), so there is no per-round
    ``count()`` barrier beyond the eager checkpoint itself.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = (100 - damping_pct) * 10_000
    p = nodes.withColumn("units", F.lit(1_000_000).cast("long"))
    for _ in range(n_iter):
        inflow = (
            ed.join(p, ed["src"] == p["node"])
            .select("dst", F.expr("units div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        p = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0L)) div 100"
                    )
                ).alias("units"),
            )
            .localCheckpoint(eager=True)
        )
    return p

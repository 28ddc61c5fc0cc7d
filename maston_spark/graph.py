"""Graph algorithms over edge DataFrames.

Connected components (the dedup-cluster primitive) lives in
`maston_spark.llm.dedup`; this module holds the iterative numeric
family, starting with fixed-iteration PageRank (Page et al. 1999;
public). The power method is expressed as a driver-side loop of
join+aggregate stages — each iteration is ONE equi-join of the rank
vector with the edge list plus one combiner-reduced sum, so an
iteration costs exactly one shuffle of (dst, contribution) rows and
the rank vector never leaves the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Cross-engine determinism: each iteration's contributions are
    rounded to 9 decimals and summed as DECIMAL(28,9) (exact,
    order-independent), and the resulting rank is re-rounded to 9 —
    so every iteration's vector is bit-identical on any engine or
    partitioning, and a SQL oracle can replay the same fixed number
    of iterations as inlined CTE stages.

    Dangling nodes (no out-edges) keep only the teleport term —
    their mass is not redistributed (documented simplification the
    oracle mirrors; the bipartite graphs this engine builds have
    none).

    Scale: the rank vector is |V| rows, the join is edge-partitioned
    (|E| rows shuffle per iteration as slim (dst, decimal) pairs),
    and `iterations` is a small constant — the classic bounded
    power-method shape.
    """
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    n = nodes.count()  # one driver scalar, |V|
    base = round((1.0 - damping) / n, 9)
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("__deg"))
    ranks = nodes.select("node", F.lit(round(1.0 / n, 9)).alias("rank"))
    for it in range(iterations):
        contrib = (
            edges.join(ranks, edges[src_col] == ranks["node"])
            .join(deg, src_col)
            .select(
                F.col(dst_col).alias("node"),
                F.round(
                    F.lit(damping) * F.col("rank") / F.col("__deg"), 9
                ).cast("decimal(28,9)").alias("__c"),
            )
        )
        sums = contrib.groupBy("node").agg(
            F.sum("__c").cast("double").alias("__in")
        )
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(base) + F.coalesce(F.col("__in"), F.lit(0.0)), 9
                ).alias("rank"),
            )
        )
        # lazy lineage cut every few iterations: the plan otherwise
        # grows one join+agg deeper per iteration, and past ~10
        # levels analysis time dominates the actual work (same
        # pattern as connected_components' label-propagation loop)
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.round("rank", 6).alias("rank"))

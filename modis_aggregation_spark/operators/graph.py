"""Graph analytics over edge tables: fixed-iteration PageRank and degree
statistics. Complements ``dedup.connected_components`` (the other iterative
graph operator) — together they cover the cluster/score steps a similarity
graph needs (near-dup clusters, centrality-weighted canonical selection).

Scale shape: every iteration is one equi-join (edges ⋈ ranks, shuffled on
the node key) plus one aggregation — O(E) shuffle bytes per round, no
driver-side state beyond the loop counter. Lineage is cut per round with
``localCheckpoint`` so the plan stays flat (the reference pattern proven by
``connected_components``); a fixed iteration count keeps the operator
oracle-checkable (the unrolled form is plain SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node (out_degree, in_degree) over a directed edge table."""
    out_d = edges.groupBy(F.col(src).alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("id")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "id", "full_outer")
        .fillna(0, ["out_degree", "in_degree"])
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge table.

    r_0(v) = 1.0; r_{k+1}(v) = (1-d) + d * Σ_{(u,v)∈E} r_k(u)/out(u).
    Dangling-node mass is dropped (nodes with no out-edges contribute
    nothing), the common simplification when ranks are used ordinally.
    Returns (id, rank) for every node that appears as a source or target.

    Each round: ranks ⋈ edges on the source key (one hash shuffle), a
    per-target sum, and a left join back onto the node list so zero
    in-degree nodes keep the (1-d) floor. ``localCheckpoint`` per round
    cuts lineage — plan size is O(1) in ``iterations``, and at 100 TB the
    per-round shuffle is bounded by |E| skinny (node, double) rows.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("__outd"))
    contrib_edges = e.join(out_deg, "src").localCheckpoint()

    ranks = nodes.withColumn("rank", F.lit(1.0))
    base = F.lit(1.0 - damping)
    for _ in range(iterations):
        inbound = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("__outd")).alias("__c"),
            )
            .groupBy("id")
            .agg(F.sum("__c").alias("__m"))
        )
        ranks = (
            nodes.join(inbound, "id", "left")
            .select(
                "id",
                (base + F.lit(damping) * F.coalesce(F.col("__m"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )
    return ranks

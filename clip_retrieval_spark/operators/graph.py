"""Graph analytics over materialized KG edges (post-§2.7 consumers).

The reference stops at building the index; a KG-construction engine's
output tables (nodes/edges) immediately get asked graph questions —
degree profiles for hub detection (the skew the pipeline salts for) and
centrality for entity ranking. Both are expressed as pure DataFrame
algebra so they run on the same 10^12-row posture as the pipeline:

* degree_stats — two hash aggregations, both map-side combinable.
* pagerank — FIXED-ITERATION push-style PageRank: each round is one
  shuffle-join on src + one groupBy on dst (partial aggregation absorbs
  hub fan-in). Iterations are a driver-side loop over DataFrame algebra
  (same shape as operators.cc's large/small-star loop); localCheckpoint
  between rounds truncates the lineage so round N's plan doesn't embed
  rounds 1..N-1. Fixed small iteration counts are the training-data
  norm (ranking signal, not convergence), and make the operator exactly
  SQL-expressible for the driver's DuckDB oracle.

Per-round rank values are rounded to 9 decimals on both engines so the
float-sum association order (Spark partial aggs vs DuckDB) can't
compound across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirect(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Symmetrize an edge list (distinct both-direction pairs)."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Degree histogram of the undirected graph: (degree, n_nodes).
    Hub detection in two algebraic aggregations."""
    deg = (
        undirect(edges, src, dst)
        .groupBy("src")
        .agg(F.count("*").alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    round_to: int = 9,
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected graph of ``edges``.

    r0 = 1.0; r_{t+1}(v) = (1-d) + d * sum_{u->v} r_t(u)/deg(u).
    (Unnormalized 1-based form — ranks sum to n like the original
    formulation, convenient when node counts shift per snapshot.)
    Returns (node, rank). Every node in the edge list participates;
    isolated nodes don't exist in an edge-derived graph by construction.
    """
    und = undirect(edges, src, dst)
    deg = und.groupBy("src").agg(F.count("*").alias("deg"))
    # adjacency with out-degree attached once — reused every round
    adj = und.join(deg, "src").localCheckpoint(eager=False)
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("rank"))
    for _ in range(iterations):
        contrib = (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = contrib.select(
            "node",
            F.round(
                F.lit(1.0 - damping) + F.lit(damping) * F.col("inflow"),
                round_to,
            ).alias("rank"),
        ).localCheckpoint(eager=False)
    return ranks

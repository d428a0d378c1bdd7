"""Stage 4a — connected components by alternating large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond", public
algorithm), expressed as DataFrame ops with a driver-side convergence loop.

Replaces the reference's driver-side BFS over an in-RAM neighbor map
(reference clip_back.py:270-288 connected_components + 290-309
get_non_uniques), which cannot exist at 10^12 nodes.

Scale mechanics:
* min-neighbor per node is an ALGEBRAIC aggregate -> map-side partial
  aggregation absorbs hub-node skew before the shuffle;
* the edges-join-minlabel step is an equi-join on the node id — AQE
  skew-join splits hub partitions;
* ``localCheckpoint`` truncates lineage every iteration (driver loops,
  SURVEY.md §4 item 2) so plans don't grow unboundedly;
* expected O(log n) rounds; ``max_iter`` bounds runaways and raises.

All functions take/return edge DataFrames with columns (src, dst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """Undirected neighbor list as directed pairs (u, v), u != v."""
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    rev = edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    return fwd.unionByName(rev).filter(F.col("u") != F.col("v")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect strictly-larger neighbors of each u to min(N(u) ∪ {u})."""
    sym = _sym(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("mv", F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient (larger -> smaller); connect each node's smaller
    neighborhood (plus itself) to its min."""
    oriented = (
        edges.select(
            F.greatest("src", "dst").alias("u"),
            F.least("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbr = oriented.join(mins, "u").select(
        F.col("v").alias("src"), F.col("m").alias("dst")
    )
    self_link = mins.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return (
        nbr.unionByName(self_link)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        # bit_xor: order-insensitive, overflow-free under ANSI mode
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """edges(src long, dst long) -> assignments(node long, component long),
    component = min node id of the connected component.

    Isolated nodes (absent from ``edges``) are the caller's concern
    (see ``materialize.canonical_map``: they map to themselves).
    """
    cur = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_fp = None
    for _ in range(max_iter):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        fp = _fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint within {max_iter} iterations"
        )
    # at fixpoint the graph is a forest of stars: src -> root(= component min)
    roots = (
        cur.select(F.col("dst").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    leaves = cur.select(
        F.col("src").alias("node"), F.col("dst").alias("component")
    )
    return leaves.unionByName(roots).distinct()

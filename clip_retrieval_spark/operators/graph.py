"""Graph analytics over materialized KG edges (post-§2.7 consumers).

The reference stops at building the index; a KG-construction engine's
output tables (nodes/edges) immediately get asked graph questions —
degree profiles for hub detection (the skew the pipeline salts for) and
centrality for entity ranking. Both are expressed as pure DataFrame
algebra so they run on the same 10^12-row posture as the pipeline:

* degree_stats — two hash aggregations, both map-side combinable.
* triangle_count — DEGREE-ORIENTED wedge closure: edges are oriented
  from the (degree, id)-smaller endpoint to the larger one, so every
  triangle is counted exactly once and — the 100 TB point — the wedge
  join's per-key fanout is bounded by each node's OUT-degree in the
  orientation, which is O(sqrt(m)) for any graph (arboricity bound)
  instead of the raw hub degree. A naive src-src self-join on an
  unoriented edge list explodes on hubs; this one cannot.
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


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts: (node, n_triangles) for
    every node in at least one triangle. Input treated as undirected;
    self-loops and duplicate edges are removed.

    Physical plan: degree join -> orient by (degree, id) total order ->
    wedge self-join on the oriented source -> closure semi-check via an
    inner join back on the oriented edge set -> explode 3 corners ->
    count. Two shuffle joins and one aggregation, all keys bounded by
    the orientation's out-degree (see module docstring)."""
    und = (
        undirect(edges, src, dst)
        .filter(F.col("src") != F.col("dst"))
    )
    deg = und.groupBy("src").agg(F.count("*").alias("_deg"))
    # attach degrees to both endpoints, keep the (deg,id)-ascending
    # direction only: lo -> hi under the total order
    d1 = deg.select(F.col("src").alias("u"), F.col("_deg").alias("du"))
    d2 = deg.select(F.col("src").alias("v"), F.col("_deg").alias("dv"))
    oriented = (
        und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(d1, "u")
        .join(d2, "v")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
        # the oriented edge list feeds THREE plan branches (both wedge
        # sides + the closure probe); without truncation Spark would
        # recompute the upstream edge derivation (often an expensive
        # similarity join) three times
        .localCheckpoint(eager=False)
    )
    # wedges (a -> b, a -> c): both orderings of each unordered wedge
    # survive, and exactly one matches the oriented closing edge (which
    # runs lo -> hi under the (deg,id) order), so each triangle is
    # counted once, at its orientation-minimum corner
    e1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = oriented.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") != F.col("c"))
    closing = oriented.select(
        F.col("u").alias("b"), F.col("v").alias("c")
    )
    triangles = wedges.join(closing, ["b", "c"])
    corners = triangles.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count("*").alias("n_triangles")
    )


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


def label_propagation_min(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous min-label propagation: community detection in a
    FIXED number of rounds. Returns (node, community).

    lab_0(v) = v; lab_{t+1}(v) = min(lab_t(v), min over neighbors
    lab_t(u)) — i.e. after R rounds each node carries the smallest node
    id within R hops. Converged, this equals connected components
    (operators.cc is the scale path for that); at a fixed small R it is
    its own signal — a locality-bounded community id that (unlike
    frequency-based LPA) is fully deterministic and SQL-expressible, so
    the driver's DuckDB oracle can replay it exactly by unrolling R
    rounds.

    Scale shape mirrors ``pagerank``: per round, one shuffle-join of the
    label table onto the symmetrized adjacency (keyed by node id) + one
    algebraic min-aggregation (map-side combine absorbs hub fan-in);
    localCheckpoint truncates lineage between rounds. Hot hubs cost the
    same as they do in any keyed agg — partial aggregation bounds them.

    The edge set is checkpointed EAGERLY (round-4 verdict): every round
    joins ``und``, and with a lazy checkpoint concurrent downstream
    stages can each re-derive the (possibly expensive) upstream edge
    construction before any partition is persisted. One eager pass pins
    the materialized blocks first, as operators.cc does.
    """
    und = undirect(edges, src, dst).localCheckpoint(eager=True)
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
    )
    for _ in range(rounds):
        neigh_min = (
            und.join(labels, und["src"] == labels["node"])
            .groupBy(F.col("dst").alias("n"))
            .agg(F.min("lab").alias("nmin"))
        )
        labels = (
            labels.join(neigh_min, labels["node"] == neigh_min["n"], "left")
            .select(
                "node",
                F.least(
                    F.col("lab"), F.coalesce("nmin", F.col("lab"))
                ).alias("lab"),
            )
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("lab").alias("community"))


def kcore_prune(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-round k-core peeling: drop nodes of degree < k, delete
    their edges, repeat ``rounds`` times. Returns the surviving nodes
    with their residual degree — (node, deg).

    A fixed round count makes the result a deterministic SUPERSET of
    the true k-core (full peeling iterates to fixpoint; operators.cc
    shows the convergence pattern if needed) and lets a SQL oracle
    replay it by unrolling the rounds. KG use: prune the long tail of
    weakly-attested entities before expensive canonicalization — the
    dense core is where hub-entity skew lives.

    Scale shape: per round, one degree aggregation (algebraic,
    map-side combinable) and two semi-joins of the edge list against
    the survivor set, all keyed by node id; localCheckpoint truncates
    lineage between rounds exactly as pagerank/label_propagation do.
    The initial edge set is checkpointed eagerly for the same reason as
    label_propagation_min (see its docstring).
    """
    und = undirect(edges, src, dst).localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = und.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        und = (
            und.join(keep, "src", "left_semi")
            .join(
                keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
            )
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    return und.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source breadth-first distances in a FIXED number of
    rounds: returns (node, dist) where dist is the minimum hop count
    from any seed over the symmetrized edge set (dist <= rounds;
    unreached nodes are absent). ``seeds`` is a one-column DataFrame
    named ``node``.

    Scale shape: FRONTIER-ONLY expansion — round t joins only the
    nodes FIRST reached at t-1 (``dist == t-1`` after the min-fold)
    against the adjacency, never the whole distance table, then folds
    new reaches into the running table with an algebraic min-agg
    (map-side combine absorbs hub fan-in). This is the Pregel BFS
    message set: per round one keyed shuffle-join whose left side
    shrinks to the frontier plus one partial-aggregated min — the same
    round shape as label_propagation_min but strictly cheaper, because
    a settled node never re-enters the join. Expanding settled nodes
    would only generate dominated distances (min() discards them),
    which is exactly why the driver's unrolled SQL oracle — which
    expands the full reached set each round for brevity — computes the
    identical fixpoint. Edge blocks are pinned once with an eager
    localCheckpoint (label_propagation_min's rationale); per-round
    lazy checkpoints truncate lineage.
    """
    und = undirect(edges, src, dst).localCheckpoint(eager=True)
    dist = (
        seeds.select("node").distinct().withColumn("dist", F.lit(0))
    )
    frontier = dist
    for r in range(1, rounds + 1):
        reached = und.join(
            frontier, und["src"] == frontier["node"]
        ).select(F.col("dst").alias("node"), F.lit(r).alias("dist"))
        dist = (
            dist.unionByName(reached)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if r < rounds:
            # truncate lineage between rounds; the FINAL round stays
            # un-checkpointed so the returned plan is inspectable
            # (and the caller decides whether to materialize)
            dist = dist.localCheckpoint(eager=False)
            frontier = dist.filter(F.col("dist") == r)
    return dist

"""Fixed-iteration Lloyd k-means over an embedding column — the
in-engine trainer for the IVF coarse quantizer.

The reference trains its faiss IVF codebook off-engine (autofaiss — see
reference docs and clip_back.py:343-399 for how the trained index is
consumed); here training itself is DataFrame algebra so the same engine
that serves `ivf_topk` can also build its centroids at corpus scale:

* **Seeding** is deterministic: the k rows with the smallest ids become
  centroids 0..k-1 (a TakeOrderedAndProject of k rows — no sampling
  RNG, so runs and engines agree bit-for-bit).
* **Assignment** is a NARROW per-row fold over a broadcast
  array<struct<cell,cvec>> — the same shape as ivf_topk's coarse
  quantizer, chosen for the same 100 TB reason: an explode+window
  argmin would shuffle |corpus| x k rows, the classic hidden cost. The
  corpus never shuffles during assignment.
* **Update** is posexplode + two map-side-combinable aggregations
  (cell,dim -> mean, then cell -> array). The only exchange per round
  is by (cell,dim) — k*dim groups, constant size.
* **Iterations** are a driver-side loop over DataFrame algebra with
  localCheckpoint lineage truncation per round (same discipline as
  operators.graph.pagerank / operators.cc). Fixed small iteration
  counts are the IVF-training norm (the codebook needs to be balanced,
  not converged).

Cross-engine determinism contract (the DuckDB-oracle rules from
entry_queries): distances are ROUND(dot(c,c) - 2*dot(x,c), 6) — the
||x||^2 term is constant per row and omitted on BOTH engines; dots are
left-to-right folds (bit-identical to DuckDB list_dot_product,
established empirically by the ANN suite); per-dim means are rounded to
6 before the next round so float-association order can't compound.

Empty cells simply drop out of the next round's codebook (groupBy
semantics — identical in SQL); with data-seeded centroids each seed
cell contains at least its seed point in round 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    """Left-to-right double fold — DuckDB list_dot_product twin."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_cells(
    points: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_id: str = "cell_id",
    cent_emb: str = "centroid",
    round_to: int = 6,
) -> DataFrame:
    """(id, vec, cell): nearest-centroid assignment, squared-L2, ties
    to the lowest cell id. One narrow fold per corpus row over the
    broadcast codebook; rows whose vectors fold to NULL (ragged/null
    arrays) are dropped explicitly, mirroring ivf_topk's contract."""
    # cc = ||cvec||^2 precomputed once per centroid — the assignment
    # fold would otherwise recompute it per corpus row
    cents_row = F.broadcast(
        centroids.agg(
            F.collect_list(
                F.struct(
                    F.col(cell_id).alias("cell"),
                    F.col(cent_emb).alias("cvec"),
                    _dot(F.col(cent_emb), F.col(cent_emb)).alias("cc"),
                )
            ).alias("_cents")
        )
    )
    init = F.struct(
        F.lit(float("inf")).alias("d"),
        F.lit(None).cast("int").alias("cell"),
    )

    def _argmin(vec: str) -> Column:
        scored = F.transform(
            "_cents",
            lambda ct: F.struct(
                F.round(
                    ct["cc"] - 2 * _dot(F.col(vec), ct["cvec"]), round_to
                ).alias("d"),
                ct["cell"].cast("int").alias("cell"),
            ),
        )
        return F.aggregate(
            scored,
            init,
            lambda acc, e: F.when(
                (e["d"] < acc["d"])
                | ((e["d"] == acc["d"]) & (e["cell"] < acc["cell"])),
                e,
            ).otherwise(acc),
        )

    return (
        points.crossJoin(cents_row)
        .withColumn("_best", _argmin(vec_col))
        .select(
            id_col, vec_col, F.col("_best.cell").alias(cell_id)
        )
        .filter(F.col(cell_id).isNotNull())
    )


def kmeans_fit(
    points: DataFrame,
    k: int,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Train a k-cell codebook: returns (cell_id int, centroid
    array<double>). See the module docstring for the physical plan and
    the determinism contract."""
    pts = points.select(id_col, vec_col)
    # deterministic seeding: k smallest ids -> cells 0..k-1
    w = Window.orderBy(id_col)
    cents = (
        pts.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).cast("int").alias("cell_id"),
            F.transform(
                vec_col, lambda x: F.round(x.cast("double"), round_to)
            ).alias("centroid"),
        )
    )
    for _ in range(iterations):
        assigned = assign_cells(
            pts, cents, id_col=id_col, vec_col=vec_col, round_to=round_to
        )
        dims = assigned.select(
            "cell_id", F.posexplode(vec_col).alias("i", "x")
        )
        means = dims.groupBy("cell_id", "i").agg(
            F.round(F.avg(F.col("x").cast("double")), round_to).alias("m")
        )
        cents = (
            means.groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("i", "m"))
                    ),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .localCheckpoint(eager=False)
        )
    return cents


def kmeans_assign(
    points: DataFrame,
    k: int,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """fit + final assignment in one call: (id, cell_id)."""
    cents = kmeans_fit(
        points, k, iterations, id_col=id_col, vec_col=vec_col,
        round_to=round_to,
    )
    return assign_cells(
        points, cents, id_col=id_col, vec_col=vec_col, round_to=round_to
    ).select(id_col, "cell_id")

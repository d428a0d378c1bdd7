"""Offline ANN index construction as a library call — the engine side
of the reference's ``clip-retrieval index`` step (reference
README.md:271-289: autofaiss build over inference-output embeddings).

``build_index_tables`` writes the parquet tables KGClient.from_index
loads; jobs/build_index.py is the spark-submit wrapper and
jobs/end2end.py chains it after the pipeline. All training happens
in-engine (operators.kmeans / operators.pq): assignment and encoding
are narrow folds over broadcast codebooks, so the build scales with the
corpus scan, not with driver memory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def build_index_tables(
    emb: DataFrame,
    out_dir: str,
    dim: int,
    n_cells: int = 256,
    iterations: int = 2,
    pq_m: int = 8,
    pq_k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    skip_ivf: bool = False,
    skip_pq: bool = False,
) -> dict:
    """Train + write centroids/pq_codebooks/pq_codes/meta under
    ``out_dir``. Returns build stats (cell/code counts)."""
    spark = emb.sparkSession
    emb = emb.select(id_col, vec_col)
    result: dict = {"out": out_dir}

    if not skip_ivf:
        from clip_retrieval_spark.operators.kmeans import kmeans_fit

        cents = kmeans_fit(
            emb, k=n_cells, iterations=iterations,
            id_col=id_col, vec_col=vec_col,
        )
        cents.write.mode("overwrite").parquet(
            os.path.join(out_dir, "centroids.parquet")
        )
        result["ivf_cells"] = spark.read.parquet(
            os.path.join(out_dir, "centroids.parquet")
        ).count()

    if not skip_pq:
        from clip_retrieval_spark.operators.pq import pq_encode, pq_train

        cb = pq_train(
            emb, dim=dim, m=pq_m, k=pq_k, iterations=iterations,
            id_col=id_col, vec_col=vec_col,
        )
        cb.write.mode("overwrite").parquet(
            os.path.join(out_dir, "pq_codebooks.parquet")
        )
        cb_stored = spark.read.parquet(
            os.path.join(out_dir, "pq_codebooks.parquet")
        )
        codes = pq_encode(
            emb.withColumnRenamed(id_col, "cid")
            .withColumnRenamed(vec_col, "c_emb"),
            cb_stored,
            dim=dim,
        ).withColumnRenamed("cid", "id")
        codes.write.mode("overwrite").parquet(
            os.path.join(out_dir, "pq_codes.parquet")
        )
        result["pq_codes"] = spark.read.parquet(
            os.path.join(out_dir, "pq_codes.parquet")
        ).count()

    meta = spark.createDataFrame(
        [(dim, n_cells, iterations, pq_m, pq_k,
          not skip_ivf, not skip_pq)],
        "dim int, n_cells int, iterations int, pq_m int, pq_k int,"
        " has_ivf boolean, has_pq boolean",
    )
    meta.write.mode("overwrite").parquet(
        os.path.join(out_dir, "meta.parquet")
    )
    return result

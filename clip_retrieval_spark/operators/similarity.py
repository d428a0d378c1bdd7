"""Similarity search over embedding columns (array<float>).

Two physical strategies, one logical contract (top-k by cosine):

* ``brute_force_topk`` — exact, crossJoin(broadcast(queries)) + window;
  the baseline, right when |queries| x |corpus| is workable.
* ``rp_lsh_topk`` — random-hyperplane LSH (sign bits of projections
  onto deterministic seeded hyperplanes) bucketing both sides, exact
  re-score inside buckets; the scale path replacing the reference's
  IVF/faiss index (clip_back.py:343-399). Recall knob = number of
  hash tables (the nprobe analog, clip_back.py:356-361).

Everything JVM-side: the hyperplanes are Catalyst array literals, the
projections are zip_with/aggregate expressions — no Python in the hot
path, whole-stage codegen applies.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from clip_retrieval_spark.functions.vectors import dot


def _hyperplanes(dim: int, n_bits: int, table: int) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes from blake2b bytes
    (Box-Muller over hash-derived uniforms; no RNG state)."""
    planes = []
    for b in range(n_bits):
        vec = []
        for i in range(0, dim, 2):
            raw = hashlib.blake2b(
                f"rp:{table}:{b}:{i}".encode(), digest_size=8
            ).digest()
            u1 = (int.from_bytes(raw[:4], "little") + 1) / 2**32
            u2 = int.from_bytes(raw[4:], "little") / 2**32
            r = math.sqrt(-2.0 * math.log(u1))
            vec.append(r * math.cos(2 * math.pi * u2))
            if i + 1 < dim:
                vec.append(r * math.sin(2 * math.pi * u2))
        planes.append(vec[:dim])
    return planes


def rp_bucket(emb: Column, dim: int, n_bits: int, table: int) -> Column:
    """LSH bucket id: n_bits sign bits of hyperplane projections."""
    acc = F.lit(0).cast("long")
    for bit, plane in enumerate(_hyperplanes(dim, n_bits, table)):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        proj = F.aggregate(
            F.zip_with(emb, lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        acc = acc + F.when(proj >= 0, F.lit(1 << bit)).otherwise(0)
    return acc


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "qid",
    c_id: str = "cid",
    q_emb: str = "q_emb",
    c_emb: str = "c_emb",
) -> DataFrame:
    """Exact cosine top-k: corpus x broadcast(queries) + window rank.
    Assumes unit-norm embeddings (dot == cosine)."""
    scored = corpus.crossJoin(F.broadcast(queries)).withColumn(
        "score", dot(q_emb, c_emb)
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "score", "rank")
    )


def rp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    q_id: str = "qid",
    c_id: str = "cid",
    q_emb: str = "q_emb",
    c_emb: str = "c_emb",
) -> DataFrame:
    """Approximate top-k: match on any of n_tables random-hyperplane
    buckets, exact cosine re-score, window top-k. Ties and scores are
    exact; only candidate recall is approximate."""
    q_buckets = None
    c_buckets = None
    for t in range(n_tables):
        qb = queries.select(
            F.col(q_id), F.col(q_emb),
            F.lit(t).alias("tbl"),
            rp_bucket(F.col(q_emb), dim, n_bits, t).alias("bkt"),
        )
        cb = corpus.select(
            F.col(c_id), F.col(c_emb),
            F.lit(t).alias("tbl"),
            rp_bucket(F.col(c_emb), dim, n_bits, t).alias("bkt"),
        )
        q_buckets = qb if q_buckets is None else q_buckets.unionByName(qb)
        c_buckets = cb if c_buckets is None else c_buckets.unionByName(cb)
    cand = (
        c_buckets.join(F.broadcast(q_buckets), ["tbl", "bkt"])
        .dropDuplicates([q_id, c_id])
        .withColumn("score", dot(q_emb, c_emb))
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "score", "rank")
    )

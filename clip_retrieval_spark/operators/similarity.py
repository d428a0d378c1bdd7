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


def plane_bits(emb: Column, dim: int, n_bits: int, n_tables: int) -> Column:
    """array<boolean> of all n_tables*n_bits plane-projection signs,
    computed through ONE ``transform`` over a literal plane matrix —
    inlining one aggregate per plane blows the Janino codegen tree up
    multiplicatively (compile time dominated wall at 36 planes)."""
    planes = [
        p for t in range(n_tables) for p in _hyperplanes(dim, n_bits, t)
    ]
    planes_lit = F.array(*[F.array(*[F.lit(x) for x in p]) for p in planes])
    return F.transform(
        planes_lit,
        lambda p: F.aggregate(
            F.zip_with(emb, p, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        >= 0,
    )


def buckets_from_bits(bits: Column, n_bits: int, n_tables: int) -> Column:
    """array<struct<tbl,bkt>> from the flat sign-bit array — every
    table's bucket id in ONE projection, so one explode replaces
    n_tables unionByName branches (one FileScan of the corpus instead of
    n_tables; at 100 TB the rescan was the cost)."""
    weights = F.array(*[F.lit(1 << b).cast("long") for b in range(n_bits)])
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda t: F.struct(
            t.cast("int").alias("tbl"),
            F.aggregate(
                F.zip_with(
                    F.slice(bits, t * n_bits + 1, n_bits),
                    weights,
                    lambda bit, w: F.when(bit, w).otherwise(
                        F.lit(0).cast("long")
                    ),
                ),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).alias("bkt"),
        ),
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
    exclude_self: bool = False,
    round_to: int | None = None,
) -> DataFrame:
    """Approximate top-k: match on any of n_tables random-hyperplane
    buckets, exact cosine re-score, window top-k. Ties and scores are
    exact; only candidate recall is approximate.

    Each side is scanned ONCE: all table buckets are emitted as an
    array<struct<tbl,bkt>> per row and exploded (the earlier n_tables x
    unionByName formulation rescanned + reshuffled the corpus n_tables
    times). ``exclude_self`` drops qid==cid rows when queries are drawn
    from the corpus (matches brute_force semantics for self-queries).
    """
    def _explode(df: DataFrame, id_c: str, emb_c: str) -> DataFrame:
        # two projection levels: _bits is referenced n_tables times below,
        # which blocks CollapseProject from re-inlining (and so
        # re-evaluating) the plane projections per table
        return (
            df.select(
                F.col(id_c),
                F.col(emb_c),
                plane_bits(F.col(emb_c), dim, n_bits, n_tables).alias(
                    "_bits"
                ),
            )
            .select(
                id_c, emb_c,
                F.explode(
                    buckets_from_bits(F.col("_bits"), n_bits, n_tables)
                ).alias("_tb"),
            )
            .select(
                id_c, emb_c,
                F.col("_tb.tbl").alias("tbl"),
                F.col("_tb.bkt").alias("bkt"),
            )
        )

    cand = (
        _explode(corpus, c_id, c_emb)
        .join(F.broadcast(_explode(queries, q_id, q_emb)), ["tbl", "bkt"])
        .dropDuplicates([q_id, c_id])
    )
    if exclude_self:
        cand = cand.filter(F.col(q_id) != F.col(c_id))
    score = dot(q_emb, c_emb)
    if round_to is not None:
        # round BEFORE ranking so ties break identically to engines that
        # rank on the rounded score (the oracle comparison contract)
        score = F.round(score, round_to)
    cand = cand.withColumn("score", score)
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "score", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    q_id: str = "qid",
    c_id: str = "cid",
    q_emb: str = "q_emb",
    c_emb: str = "c_emb",
    cell_id: str = "cell_id",
    cent_emb: str = "centroid",
    exclude_self: bool = False,
    round_to: int | None = 6,
) -> DataFrame:
    """IVF-style ANN — the direct analog of the reference's faiss
    inverted-file index (coarse quantizer -> nprobe cell probe -> exact
    re-score; reference clip_back.py:343-399 + the IVF training in
    docs). Unlike ``rp_lsh_topk`` the partition is learned/supplied
    (``centroids``: one row per cell), not random, so cell population
    tracks the data distribution.

    Physical plan, all JVM expressions, corpus NEVER shuffles:
      1. the centroid table collapses to a one-row array<struct> and is
         broadcast; assignment is a NARROW per-row argmax expression
         over that array (a window-based argmax would hash-shuffle the
         |corpus| x |C| exploded rows — the classic hidden 100TB cost).
      2. probe: same broadcast array; top-nprobe cells per query via
         sort_array + slice (queries are small by contract).
      3. probe-join on cell — broadcast on the query side; exact cosine
         -> window top-k (the only exchange: candidates by query id).
    Scores are rounded BEFORE every ranking step so tie-breaks are
    reproducible across engines (the oracle contract).
    """
    def _rounded(col: Column) -> Column:
        return F.round(col, round_to) if round_to is not None else col

    cell_t = centroids.schema[cell_id].dataType
    cents_row = F.broadcast(
        centroids.agg(
            F.collect_list(
                F.struct(
                    F.col(cell_id).alias("cell"),
                    F.col(cent_emb).alias("cvec"),
                )
            ).alias("_cents")
        )
    )

    def _score(emb_col: str, ct: Column) -> Column:
        return _rounded(
            F.aggregate(
                F.zip_with(
                    F.col(emb_col),
                    ct["cvec"],
                    lambda x, y: x.cast("double") * y.cast("double"),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )

    # argmax over the centroid array (ties -> lowest cell id), one
    # narrow expression per corpus row; transform scores each centroid
    # ONCE, the fold only compares struct fields
    init = F.struct(
        F.lit(float("-inf")).alias("s"),
        F.lit(None).cast(cell_t).alias("cell"),
    )

    def _argmax(emb_col: str) -> Column:
        scored_arr = F.transform(
            "_cents",
            lambda ct: F.struct(
                _score(emb_col, ct).alias("s"), ct["cell"].alias("cell")
            ),
        )
        return F.aggregate(
            scored_arr,
            init,
            lambda acc, e: F.when(
                (e["s"] > acc["s"])
                | ((e["s"] == acc["s"]) & (e["cell"] < acc["cell"])),
                e,
            ).otherwise(acc),
        )

    # Input contract: embeddings are non-null fixed-dim float arrays. A
    # null element or dim mismatch makes zip_with/aggregate fold to a
    # NULL score, so the argmax keeps its NULL-cell init — such rows
    # would silently vanish from every candidate set. Surface that as a
    # defined behavior: drop them explicitly here (and only here), so
    # the filter is visible in the plan instead of an implicit
    # join-key-null discard.
    assigned = (
        corpus.crossJoin(cents_row)
        .withColumn("_best", _argmax(c_emb))
        .select(c_id, c_emb, F.col("_best.cell").alias(cell_id))
        .filter(F.col(cell_id).isNotNull())
    )
    # top-nprobe cells: sort (neg score, cell) structs ascending
    probes = (
        queries.crossJoin(cents_row)
        .select(
            q_id,
            q_emb,
            F.explode(
                F.slice(
                    F.sort_array(
                        F.transform(
                            "_cents",
                            lambda ct: F.struct(
                                (-_score(q_emb, ct)).alias("negs"),
                                ct["cell"].alias("cell"),
                            ),
                        )
                    ),
                    1,
                    nprobe,
                )
            ).alias("_p"),
        )
        .select(q_id, q_emb, F.col("_p.cell").alias(cell_id))
    )
    cand = assigned.join(F.broadcast(probes), cell_id)
    if exclude_self:
        cand = cand.filter(F.col(q_id) != F.col(c_id))
    scored = cand.withColumn("score", _rounded(dot(q_emb, c_emb)))
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "score", "rank")
    )


def auto_n_blocks(n_rows: int, dim: int, target_task_bytes: int) -> int:
    """Block count so each block-pair task's matrix slice (~2n/B vectors
    of dim float64) stays under ``target_task_bytes``:
    B = ceil(2 * n * dim * 8 / target), clamped to [1, 4096]."""
    import math

    if n_rows <= 0 or dim <= 0:
        return 1
    b = math.ceil(2 * n_rows * dim * 8 / max(target_task_bytes, 1))
    return max(1, min(b, 4096))


def block_allpairs_cosine(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_blocks: int | None = None,
    round_to: int = 6,
    target_task_bytes: int = 256 << 20,
) -> DataFrame:
    """EXACT cosine range self-join (all pairs a<b with dot >= threshold)
    as a distributed block-pair join — the scale path for the reference's
    ``range_search`` self-join (reference clip_back.py:290-301).

    Why not LSH here: at range thresholds as low as 0.35 the qualifying
    pairs sit barely above the cut (measured on the test embeddings:
    median qualifying cosine 0.374), where random-hyperplane collision
    probability is ~0.6/bit — 24 tables x 4 bits still missed 5/271
    qualifying pairs while emitting ~77% of ALL pairs as candidates.
    Exact blocked evaluation is both correct and cheaper at that
    selectivity; ``rp_lsh_topk`` remains the approximate path for
    high-threshold / top-k workloads.

    Mechanics: rows are hashed into ``n_blocks`` blocks; each row is
    replicated to every unordered block pair (bi, bj) it belongs to and
    each of the B(B+1)/2 groups scores its cross-block (or within-block)
    pairs with one numpy matmul. Total compute is the intrinsic O(n^2/2)
    of exact range search, but it is spread over block-pair tasks whose
    memory is ~2n/B vectors — no driver collect, no closure matrix, and
    B scales with the corpus: when ``n_blocks`` is None (the default) it
    is computed from a cheap count-star + one-row dim probe as
    B = ceil(2*n*dim*8 / target_task_bytes) — at 100x the corpus B grows
    100x and per-task memory stays constant instead of OOMing.
    """
    import numpy as np
    import pandas as pd

    if n_blocks is None:
        # Sizing needs count + dim, i.e. two extra actions. Over a bare
        # parquet scan both are metadata-cheap, but over a DERIVED plan
        # (embeddings computed by an upstream UDF) each action would
        # re-execute the whole upstream pipeline — so pin the plan with
        # localCheckpoint first: the probes and the real join then all
        # read the materialized blocks. Callers who know their geometry
        # can pass n_blocks explicitly and skip both probes.
        emb = emb.localCheckpoint(eager=False)
        n_rows = emb.count()
        first = emb.select(F.size(F.col(emb_col)).alias("d")).first()
        dim = int(first["d"]) if first and first["d"] is not None else 0
        n_blocks = auto_n_blocks(n_rows, dim, target_task_bytes)

    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    tasks = F.array_distinct(
        F.array(
            *[
                F.struct(
                    F.least(blk, F.lit(j)).alias("ti"),
                    F.greatest(blk, F.lit(j)).alias("tj"),
                )
                for j in range(n_blocks)
            ]
        )
    )
    rows = emb.select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_emb"),
        blk.alias("_blk"),
        F.explode(tasks).alias("_task"),
    ).select(
        "_id", "_emb", "_blk",
        F.col("_task.ti").alias("_ti"),
        F.col("_task.tj").alias("_tj"),
    )

    def _pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ti, tj = int(key[0]), int(key[1])
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "score": pd.Series(dtype="float64")})
        if len(pdf) < 2:
            return empty
        ids = pdf["_id"].to_numpy()
        M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_emb"]])
        if ti == tj:
            S = np.round(M @ M.T, round_to)
            ai, bj = np.nonzero(
                (S >= threshold) & (ids[None, :] > ids[:, None])
            )
            return pd.DataFrame(
                {"a": ids[ai], "b": ids[bj], "score": S[ai, bj]}
            )
        blks = pdf["_blk"].to_numpy()
        li, rj = blks == ti, blks == tj
        if not li.any() or not rj.any():
            return empty
        S = np.round(M[li] @ M[rj].T, round_to)
        ai, bj = np.nonzero(S >= threshold)
        aa, bb = ids[li][ai], ids[rj][bj]
        return pd.DataFrame(
            {
                "a": np.minimum(aa, bb),
                "b": np.maximum(aa, bb),
                "score": S[ai, bj],
            }
        )

    return rows.groupBy("_ti", "_tj").applyInPandas(
        _pairs, schema="a long, b long, score double"
    )

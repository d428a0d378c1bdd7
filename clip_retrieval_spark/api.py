"""Programmatic single-query API — the Spark-native counterpart of the
reference's most-used public surface (reference clip_client.py:20-94:
``ClipClient.query(text=..., image=..., embedding_input=...)`` with
mutual-exclusion validation, and the knn-service options deduplicate /
safety / aesthetic re-rank at clip_back.py:250-324).

Differences by design: there is no HTTP hop — the "index" is a Spark
entity table (entity_id, surface, embedding) and a query plans ONE Spark
job (broadcast single-query crossJoin + top-k window). Batch users call
``query_batch`` which runs all queries in the same job (the reference
answers one request at a time, clip_back.py:472-507).
"""

from __future__ import annotations

import base64 as _b64

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clip_retrieval_spark.functions.vectors import blend, dot
from clip_retrieval_spark.operators.embed import DIM, embed_batch


def decode_embedding_b64(payload: str, dim: int = DIM) -> list[float]:
    """base64 -> float32 little-endian vector (the wire format of the
    reference, clip_back.py:234-236: np.frombuffer(base64.b64decode(.),
    float32)). Raises ValueError on length mismatch."""
    raw = _b64.b64decode(payload, validate=True)
    vec = np.frombuffer(raw, dtype="<f4")
    if vec.shape[0] != dim:
        raise ValueError(
            f"embedding_b64 decodes to {vec.shape[0]} dims, expected {dim}"
        )
    return [float(x) for x in vec]


class KGClient:
    """Query a (entity_id, surface, embedding) table by text or vector.

    Input validation mirrors the reference's P8 contract
    (clip_client.py:83-94): exactly ONE of ``text`` / ``embedding`` /
    ``embedding_b64`` per query; anything else raises ValueError before
    any Spark job runs.
    """

    def __init__(
        self,
        entities: DataFrame,
        k: int = 10,
        min_score: float = 0.0,
        deduplicate: bool = True,
        aesthetic_embedding: list[float] | None = None,
        aesthetic_weight: float = 0.0,
        use_safety_filter: bool = False,
        safety_threshold: float = 0.5,
        dim: int = DIM,
        index: str = "flat",
        n_cells: int = 16,
        nprobe: int = 4,
        pq_m: int = 8,
        pq_k: int = 16,
        shortlist: int = 100,
    ) -> None:
        for col in ("entity_id", "surface", "embedding"):
            if col not in entities.columns:
                raise ValueError(f"entity table is missing column {col!r}")
        if not 1 <= k:
            raise ValueError(f"k must be >= 1: {k}")
        if aesthetic_weight and aesthetic_embedding is None:
            raise ValueError(
                "aesthetic_weight set but no aesthetic_embedding given"
            )
        if index not in ("flat", "ivf", "pq"):
            raise ValueError(
                f"index must be 'flat', 'ivf' or 'pq': {index!r}"
            )
        self.entities = entities
        self.k = k
        self.min_score = min_score
        self.deduplicate = deduplicate
        self.aesthetic_embedding = aesthetic_embedding
        self.aesthetic_weight = aesthetic_weight
        self.use_safety_filter = use_safety_filter
        self.safety_threshold = safety_threshold
        self.dim = dim
        # index selection mirrors the reference's faiss index types
        # (IndexFlat vs IVF / PQ variants, chosen at index-build time in
        # its docs; consumed clip_back.py:343-399). 'flat' scans exact;
        # 'ivf' trains a coarse codebook in-engine (operators.kmeans)
        # and probes nprobe cells; 'pq' trains subspace codebooks,
        # encodes once, and serves shortlist-then-exact-rerank
        # (operators.pq). ANN structures build lazily on first query
        # and are cached on the client.
        self.index = index
        self.n_cells = n_cells
        self.nprobe = nprobe
        self.pq_m = pq_m
        self.pq_k = pq_k
        self.shortlist = shortlist
        self._centroids: DataFrame | None = None
        self._codebooks: DataFrame | None = None
        self._codes: DataFrame | None = None

    @classmethod
    def from_index(
        cls,
        entities: DataFrame,
        index_dir: str,
        index: str = "pq",
        **kwargs,
    ) -> "KGClient":
        """Load a prebuilt index (jobs/build_index.py output) instead of
        training lazily — the analog of the reference's clip_back
        --indices-paths consuming a clip-retrieval-index build. The
        entity table must be the one the index was built over (codes
        key on its ids; a row-count mismatch is rejected up front).

        Index-geometry kwargs (dim / n_cells / pq_m / pq_k) may be
        passed explicitly and then OVERRIDE meta.parquet — overriding
        geometry the codes were built with is almost always wrong, but
        the precedence is explicit rather than a TypeError."""
        spark = entities.sparkSession
        import os as _os

        meta = spark.read.parquet(
            _os.path.join(index_dir, "meta.parquet")
        ).collect()[0]
        geometry = {
            k: kwargs.pop(k, meta[k])
            for k in ("dim", "n_cells", "pq_m", "pq_k")
        }
        # pin derived entity plans (UDF-computed embeddings etc.) so the
        # count validation below and later queries don't re-execute the
        # upstream pipeline per action — same hazard/mitigation as
        # similarity.block_allpairs_cosine's auto-size probes
        entities = entities.localCheckpoint(eager=False)
        client = cls(entities, index=index, **geometry, **kwargs)
        if index == "ivf":
            if not meta["has_ivf"]:
                raise ValueError(f"{index_dir} was built without IVF")
            client._centroids = spark.read.parquet(
                _os.path.join(index_dir, "centroids.parquet")
            )
        elif index == "pq":
            if not meta["has_pq"]:
                raise ValueError(f"{index_dir} was built without PQ")
            client._codebooks = spark.read.parquet(
                _os.path.join(index_dir, "pq_codebooks.parquet")
            )
            client._codes = spark.read.parquet(
                _os.path.join(index_dir, "pq_codes.parquet")
            ).withColumnRenamed("id", "cid")
            n_codes = client._codes.count()
            n_ents = entities.count()
            if n_codes != n_ents:
                raise ValueError(
                    f"index/table mismatch: {n_codes} PQ codes vs "
                    f"{n_ents} entity rows — pass the table the index "
                    f"was built over"
                )
        return client

    # -- validation (P8) ---------------------------------------------------

    def _to_vector(
        self,
        text: str | None,
        embedding: list[float] | None,
        embedding_b64: str | None,
    ) -> list[float]:
        given = [
            name
            for name, v in (
                ("text", text),
                ("embedding", embedding),
                ("embedding_b64", embedding_b64),
            )
            if v is not None
        ]
        if len(given) == 0:
            raise ValueError(
                "one of text / embedding / embedding_b64 must be provided"
            )
        if len(given) > 1:
            raise ValueError(
                f"only one query input allowed, got {' + '.join(given)}"
            )
        if text is not None:
            import pandas as pd

            return [float(x) for x in embed_batch(pd.Series([text]))[0]]
        if embedding_b64 is not None:
            return decode_embedding_b64(embedding_b64, self.dim)
        vec = [float(x) for x in embedding]  # type: ignore[union-attr]
        if len(vec) != self.dim:
            raise ValueError(
                f"embedding has {len(vec)} dims, expected {self.dim}"
            )
        return vec

    # -- search -------------------------------------------------------------

    def query_df(self, queries: list[tuple[int, list[float]]]) -> DataFrame:
        """(qid, vector) list -> DataFrame(qid, entity_id, surface,
        similarity, rank). One Spark job for the whole batch: the tiny
        query side is broadcast and the entity table streams through a
        single scan."""
        spark = self.entities.sparkSession
        q = spark.createDataFrame(
            queries, "qid int, q_emb array<float>"
        )
        ents = self.entities
        if self.use_safety_filter:
            from clip_retrieval_spark.operators.safety import safety_filter

            ents = safety_filter(ents, self.safety_threshold)
        if self.aesthetic_embedding is not None and self.aesthetic_weight:
            a = F.array(
                *[F.lit(float(x)) for x in self.aesthetic_embedding]
            )
            q = q.withColumn(
                "q_emb", blend("q_emb", a, self.aesthetic_weight)
            )
        scored = self._score_candidates(ents, q).filter(
            F.col("similarity") >= self.min_score
        )
        if self.deduplicate:
            # the reference's result dedup (clip_back.py:257-268: hash of
            # the rounded embedding, keep first) — pin 'first' to min id
            ehash = F.xxhash64(
                F.transform("embedding", lambda x: F.round(x, 4))
            )
            wd = Window.partitionBy("qid", ehash).orderBy(
                F.desc("similarity"), F.asc("entity_id")
            )
            scored = (
                scored.withColumn("_dup", F.row_number().over(wd))
                .filter("_dup = 1")
                .drop("_dup")
            )
        # tie-break by surface (not the id hash): deterministic, legible,
        # SQL-expressible — same pinned-total-order rationale as
        # operators.link (faiss ties are internal-order, clip_back.py:362)
        w = Window.partitionBy("qid").orderBy(
            F.desc("similarity"), F.asc("surface"), F.asc("entity_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .select("qid", "entity_id", "surface", "similarity", "rank")
        )

    def _score_candidates(self, ents: DataFrame, q: DataFrame) -> DataFrame:
        """(qid, entity_id, surface, similarity) candidates per the
        selected index. 'flat' scores every entity (exact); the ANN
        paths return an over-fetched candidate set (k x 4 bounded by
        the shortlist) so downstream dedup/min_score filtering cannot
        starve the final top-k."""
        if self.index == "flat":
            return ents.crossJoin(F.broadcast(q)).withColumn(
                "similarity", dot("q_emb", "embedding")
            )
        corpus = ents.select(
            F.col("entity_id").alias("cid"),
            F.col("embedding").alias("c_emb"),
        )
        n_cand = max(self.k * 4, self.k + 8)
        if self.index == "ivf":
            from clip_retrieval_spark.operators.similarity import ivf_topk

            if self._centroids is None:
                from clip_retrieval_spark.operators.kmeans import kmeans_fit

                self._centroids = kmeans_fit(
                    self.entities.select(
                        F.col("entity_id").alias("vec_id"),
                        F.col("embedding"),
                    ),
                    k=self.n_cells,
                    iterations=2,
                ).localCheckpoint()
            cand = ivf_topk(
                q, corpus, self._centroids, k=n_cand, nprobe=self.nprobe
            )
        else:  # pq
            from clip_retrieval_spark.operators.pq import (
                pq_encode,
                pq_rerank_topk,
                pq_train,
            )

            if self._codes is None:
                self._codebooks = pq_train(
                    self.entities.select(
                        F.col("entity_id").alias("vec_id"),
                        F.col("embedding"),
                    ),
                    dim=self.dim, m=self.pq_m, k=self.pq_k,
                ).localCheckpoint()
                self._codes = pq_encode(
                    corpus, self._codebooks, dim=self.dim
                ).localCheckpoint()
            cand = pq_rerank_topk(
                q, self._codes, corpus, self._codebooks, dim=self.dim,
                k=n_cand, shortlist=max(self.shortlist, n_cand),
            )
        # join surface AND embedding back: the result-dedup hash in
        # query_df keys on the (rounded) embedding
        surfaces = self.entities.select(
            "entity_id", "surface", "embedding"
        )
        return (
            cand.select(
                "qid",
                F.col("cid").alias("entity_id"),
                F.col("score").alias("similarity"),
            )
            .join(surfaces, "entity_id")
        )

    def query(
        self,
        text: str | None = None,
        embedding: list[float] | None = None,
        embedding_b64: str | None = None,
    ) -> list[dict]:
        """Single query -> list of result dicts ordered by rank (the
        reference's response shape, clip_client.py:70-80)."""
        vec = self._to_vector(text, embedding, embedding_b64)
        rows = self.query_df([(0, vec)]).orderBy("rank").collect()
        return [
            {
                "id": r["entity_id"],
                "surface": r["surface"],
                "similarity": float(r["similarity"]),
                "rank": r["rank"],
            }
            for r in rows
        ]

    def filter_df(
        self,
        text: str | None = None,
        embedding: list[float] | None = None,
        embedding_b64: str | None = None,
        threshold: float = 0.3,
    ) -> DataFrame:
        """Range-filter the entity table by one query: every entity with
        cosine >= threshold (the reference's dataset-filtering tool,
        clip_filter.py:36-56: encode query -> score corpus -> keep above
        threshold). Returns a DataFrame — at corpus scale the result is
        written, not collected. Same one-of-three input validation as
        ``query``."""
        vec = self._to_vector(text, embedding, embedding_b64)
        q = F.array(*[F.lit(float(x)) for x in vec])
        return (
            self.entities.withColumn("similarity", dot(q, "embedding"))
            .filter(F.col("similarity") >= threshold)
            .select("entity_id", "surface", "similarity")
        )

    def query_batch(self, texts: list[str]) -> dict[str, list[dict]]:
        """Many text queries in ONE Spark job -> {text: results}."""
        import pandas as pd

        if not texts:
            return {}
        vecs = embed_batch(pd.Series(texts))
        out = self.query_df(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        ).collect()
        results: dict[str, list[dict]] = {t: [] for t in texts}
        for r in sorted(out, key=lambda r: (r["qid"], r["rank"])):
            results[texts[r["qid"]]].append(
                {
                    "id": r["entity_id"],
                    "surface": r["surface"],
                    "similarity": float(r["similarity"]),
                    "rank": r["rank"],
                }
            )
        return results

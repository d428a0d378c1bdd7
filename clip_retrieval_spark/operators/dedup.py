"""Training-data dedup operators (generic, scale-path).

The oracle-matched specializations live in entry_queries (md5-based so
DuckDB can replay them bit-for-bit); these are the engine-grade versions
for arbitrary tables: parameterized columns, xxhash64 (faster than md5,
JVM-native), LSH blocking for near-dup, and canonical-keeper election.

All operators follow the reference's dedup contract (clip_back.py:257-309:
hash exact-dup + connected-components near-dup, keep first of each
group) restated as DataFrame ops with explicit keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clip_retrieval_spark.operators.cc import connected_components
from clip_retrieval_spark.operators.lsh import candidate_pairs


def exact_dedup(
    df: DataFrame, content_cols: list[str], id_col: str
) -> DataFrame:
    """Keep the min-id row per exact content hash (G1).

    The reference hashes rounded embeddings (clip_back.py:257-268) and
    drops later duplicates; 'later' is undefined under parallelism, so
    the keeper is pinned to min(id).
    """
    h = F.xxhash64(*content_cols)
    w = Window.partitionBy(h).orderBy(F.asc(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
    )


def dedup_stats(
    df: DataFrame, content_cols: list[str], id_col: str
) -> DataFrame:
    """(content_hash, keeper, n_copies) — audit table for exact dedup."""
    return df.groupBy(
        F.xxhash64(*content_cols).alias("content_hash")
    ).agg(
        F.min(id_col).alias("keeper"),
        F.count("*").alias("n_copies"),
    )


def near_dedup_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float = 0.7,
    n_hashes: int = 16,
    band_rows: int = 2,
    shingle_words: int = 3,
    max_bucket: int = 512,
) -> DataFrame:
    """Near-dup groups via word-shingle MinHash-LSH + exact Jaccard
    verify + connected components. Returns (id, canonical_id).

    Pipeline: shingle -> minhash/band (JVM) -> bucket join ->
    exact-Jaccard re-check on candidates only -> CC -> min-id keeper.
    The verify step kills LSH false positives, so the output depends on
    the threshold, not on banding luck.
    """
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.size(toks) - shingle_words, F.lit(0)
                ),
            ),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_words)),
        )
    )
    base = df.select(
        F.col(id_col).alias("_id"), shingles.alias("_sh")
    ).filter(F.size("_sh") > 0)

    # candidate pairs from LSH over the shingle strings
    flat = base.select(
        F.col("_id").alias("entity_id"),
        F.concat_ws("\x1f", "_sh").alias("surface"),
    )
    cand = candidate_pairs(
        flat, max_bucket=max_bucket, n_hashes=n_hashes, band_rows=band_rows
    )

    # exact Jaccard verify on candidates only
    sh_a = base.select(F.col("_id").alias("a"), F.col("_sh").alias("sha"))
    sh_b = base.select(F.col("_id").alias("b"), F.col("_sh").alias("shb"))
    verified = (
        cand.join(sh_a, "a")
        .join(sh_b, "b")
        .withColumn(
            "j",
            F.size(F.array_intersect("sha", "shb"))
            / F.size(F.array_union("sha", "shb")),
        )
        .filter(F.col("j") >= jaccard_threshold)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    assign = connected_components(verified)
    ids = df.select(F.col(id_col).alias("_id"))
    return (
        ids.join(
            assign.withColumnRenamed("node", "_id"), "_id", "left"
        )
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("component", F.col("_id")).alias("canonical_id"),
        )
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per row, fully JVM-side: token
    xxhash64 -> per-bit majority -> fingerprint. Near-dups share
    fingerprints (or differ in few bits — pair with a bit-band join
    for hamming-<=k search)."""
    toks = (
        df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .withColumn("h", F.xxhash64("tok"))
    )
    bits = toks.select(
        id_col, "h",
        F.explode(F.array(*[F.lit(b) for b in range(64)])).alias("bit"),
    )
    votes = (
        bits.withColumn(
            "v",
            F.when(F.expr("(shiftright(h, bit) & 1) = 1"), 1).otherwise(-1),
        )
        .groupBy(id_col, "bit")
        .agg(F.sum("v").alias("s"))
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("s") > 0,
                F.expr("shiftleft(cast(1 as bigint), bit)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )

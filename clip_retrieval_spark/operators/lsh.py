"""MinHash-LSH blocking — the scale path that replaces the reference's
faiss index (reference clip_back.py:343-399 knn search and the
range_search self-join at clip_back.py:290-301).

Everything here is JVM-side (higher-order functions + xxhash64): shingle
-> minhash -> band -> explode -> equi-join. No Python in the hot path.
The band count is the recall/cost knob — the analog of the reference's
dynamic nprobe widening (clip_back.py:356-361).

At 100 TB scale the bucket join is the only shuffle, keyed by
(band, signature); hot buckets are bounded by ``max_bucket`` — buckets
larger than that are dropped as non-selective, which keeps worst-case
pair fanout linear in input; AQE skew-join splits what remains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_HASHES = 16
BAND_ROWS = 2  # => 8 bands


def char_shingles(col: Column, n: int = 3) -> Column:
    """Distinct char n-grams of lower(col), JVM-side."""
    s = F.concat(F.lit("^"), F.lower(col), F.lit("$"))
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substr(s, i, F.lit(n)))
    )


def lsh_explode(
    df: DataFrame,
    text_col: str,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    shingle_n: int = 3,
) -> DataFrame:
    """df + (band, sig) — one row per (input row, band).

    Implemented as explode -> hash -> groupBy-min over DISTINCT texts
    (signatures are a pure function of the text), not as one nested
    expression: inlining the 16-hash signature into 8 band keys blows
    the codegen expression tree up ~n_hashes x n_bands and Janino
    compile time dominates (measured: ~50 s on a 68-row input). The
    aggregate formulation keeps every expression tiny, is algebraic
    (map-side combine), and the signature join back to ``df`` hits the
    distinct-text table, which Zipfian corpora keep small.
    """
    n_bands = n_hashes // band_rows
    texts = df.select(F.col(text_col).alias("_t")).distinct()
    grams = texts.select(
        "_t",
        F.explode(char_shingles(F.col("_t"), shingle_n)).alias("_g"),
    )
    hashed = grams.select(
        "_t",
        *[
            F.xxhash64(F.lit(f"mh{i}"), F.col("_g")).alias(f"_h{i}")
            for i in range(n_hashes)
        ],
    )
    sigs = hashed.groupBy("_t").agg(
        *[F.min(f"_h{i}").alias(f"_mh{i}") for i in range(n_hashes)]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"_mh{b * band_rows + r}") for r in range(band_rows)]
            ).alias("sig"),
        )
        for b in range(n_bands)
    ]
    bands = (
        sigs.withColumn("_b", F.explode(F.array(*band_structs)))
        .select("_t", F.col("_b.band").alias("band"),
                F.col("_b.sig").alias("sig"))
    )
    return df.join(bands, df[text_col] == bands["_t"]).drop("_t")


def candidate_pairs(
    entities: DataFrame,
    id_col: str = "entity_id",
    text_col: str = "surface",
    max_bucket: int = 256,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    oversize: str = "chain",
) -> DataFrame:
    """Distinct candidate pairs (a < b) from shared LSH buckets.

    Self-join on (band, sig) with a bucket-size cap: a bucket of size m
    contributes m^2 pairs, so unbounded hot buckets are the classic LSH
    blowup; capping keeps the join linear-ish at scale.

    Over-cap buckets are NOT silently dropped (they are exactly the
    largest duplicate clusters — dropping them means the corpus' worst
    duplicates never merge). ``oversize="chain"`` emits a SPANNING chain
    instead: members sorted by id, consecutive pairs only — m-1 edges
    connect the whole bucket for downstream connected components at
    linear (not quadratic) cost. The chain sort is one window task per
    hot bucket (O(m log m), vs the m^2/2 join blowup). A verify step
    downstream may cut individual chain links; near-identical texts
    recur in most bands, so surviving links in other bands reconnect
    true clusters in practice. ``oversize="drop"`` restores strict
    selectivity (old behavior).
    """
    buckets = lsh_explode(
        entities.select(id_col, text_col), text_col, n_hashes, band_rows
    ).select(id_col, "band", "sig")
    # bucket-size cap via aggregate (reuses the same hash partitioning
    # the join needs, so AQE collapses the exchanges)
    counts = buckets.groupBy("band", "sig").agg(F.count("*").alias("_n"))
    bounded = buckets.join(
        counts.filter(F.col("_n") <= max_bucket), ["band", "sig"]
    ).drop("_n")
    a = bounded.select("band", "sig", F.col(id_col).alias("a"))
    b = bounded.select("band", "sig", F.col(id_col).alias("b"))
    pairs = (
        a.join(b, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    if oversize == "chain":
        from pyspark.sql import Window

        big = buckets.join(
            counts.filter(F.col("_n") > max_bucket), ["band", "sig"]
        ).drop("_n")
        w = Window.partitionBy("band", "sig").orderBy(id_col)
        chain = (
            big.withColumn("_nx", F.lead(id_col).over(w))
            .filter(F.col("_nx").isNotNull())
            .select(F.col(id_col).alias("a"), F.col("_nx").alias("b"))
        )
        pairs = pairs.unionByName(chain)
    elif oversize != "drop":
        raise ValueError(f"oversize must be 'chain' or 'drop': {oversize}")
    return pairs.distinct()

"""Safety filters (P5/P6 analogs) + vector blend (aesthetic re-rank)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from clip_retrieval_spark.functions.vectors import blend, cosine, dot, l2_normalize
from clip_retrieval_spark.operators.safety import (
    prompt_filter,
    safety_filter,
    score_safety,
)


def _emb(spark, n=50):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(f"vec_id < {n}")
    )


def test_score_safety_deterministic_and_bounded(spark):
    df = _emb(spark)
    s1 = {r["vec_id"]: r["safety_score"] for r in score_safety(df).collect()}
    s2 = {r["vec_id"]: r["safety_score"] for r in score_safety(df).collect()}
    assert s1 == s2
    assert all(0.0 <= v < 1.0 for v in s1.values())


def test_safety_filter_partitions_rows(spark):
    df = _emb(spark)
    kept = safety_filter(df, threshold=0.5).count()
    dropped = score_safety(df).filter("safety_score > 0.5").count()
    assert kept + dropped == df.count()
    assert kept > 0  # stub scores are spread over [0,1)


def test_safety_scores_order_by_signal():
    """The embedded weights are a real classifier, not a shape stub:
    scores must order violent text above benign text in the featurizer
    space the head was trained on (held-out phrases, not training
    words)."""
    from clip_retrieval_spark.operators.embed import _ngram_features
    from clip_retrieval_spark.operators.safety import _mlp_score

    def score(text):
        m = _ngram_features(text).astype(np.float64)[None, :]
        return float(_mlp_score(m)[0])

    violent = ["violent attack with weapon", "brutal murder scene",
               "gun violence and bloodshed"]
    benign = ["a sunny garden of flowers", "music in the library",
              "mountain travel holiday"]
    v_scores = [score(t) for t in violent]
    b_scores = [score(t) for t in benign]
    assert min(v_scores) > max(b_scores), (v_scores, b_scores)
    assert all(s > 0.5 for s in v_scores)
    assert all(s < 0.5 for s in b_scores)


def test_prompt_filter_argmax(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.3])]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    prompts = [[1.0, 0.0], [0.0, 1.0]]
    kept = {r["id"] for r in prompt_filter(df, prompts).collect()}
    assert kept == {1, 3}  # row 2's argmax hits the drop prompt


def test_blend_matches_numpy(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0, 0.0], [0.0, 1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    got = df.select(blend("a", "b", 0.5).alias("v")).collect()[0]["v"]
    want = np.array([1.0, 0.5, 0.0])
    want = want / np.linalg.norm(want)
    assert np.allclose(got, want)


def test_vector_helpers(spark):
    df = spark.createDataFrame(
        [([3.0, 4.0], [4.0, 3.0])], "a array<float>, b array<float>"
    )
    r = df.select(
        dot("a", "b").alias("d"),
        cosine("a", "b").alias("c"),
        l2_normalize("a").alias("n"),
    ).collect()[0]
    assert r["d"] == 24.0
    assert abs(r["c"] - 24.0 / 25.0) < 1e-9
    assert np.allclose(r["n"], [0.6, 0.8])

"""Skew-handling tests: salted agg/join correctness vs plain ops, and
the fixture's built-in zipfian skew is actually present (SURVEY.md §5
'skew test')."""

from __future__ import annotations

from pyspark.sql import functions as F

from clip_retrieval_spark.fixtures import pages_df
from clip_retrieval_spark.functions.skew import salted_agg, salted_join


def test_salted_agg_matches_plain(spark):
    df = spark.range(10000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    plain = {
        (r["k"]): (r["s"], r["m"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.max("v").alias("m"))
        .collect()
    }
    salted = {
        (r["k"]): (r["sum_v"], r["max_v"])
        for r in salted_agg(df, ["k"], {"v": "sum"}, n_salts=8)
        .join(
            salted_agg(df, ["k"], {"v": "max"}, n_salts=8), "k"
        )
        .collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    # one hub key (0) carrying 90% of the big side
    big = spark.range(20000).select(
        F.when(F.col("id") % 10 != 0, 0)
        .otherwise(F.col("id") % 5)
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(5)], "k long, name string"
    )
    plain = big.join(small, "k").groupBy("k", "name").count()
    salted = salted_join(big, small, "k", n_salts=8).groupBy(
        "k", "name"
    ).count()
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in salted.collect()
    }


def test_fixture_head_domain_skew_exists(spark):
    """The synthetic corpus must exhibit zipfian host skew so skew
    handling is actually exercised (FIXTURES.md §1)."""
    hosts = (
        pages_df(spark, 2000)
        .select(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("h"))
        .groupBy("h")
        .count()
        .orderBy(F.desc("count"))
        .collect()
    )
    top = hosts[0]["count"]
    total = sum(r["count"] for r in hosts)
    assert top / total > 0.15  # head domain holds a large share
    assert len(hosts) > 20  # and a long tail exists


def test_bucketing_uniform_despite_domain_skew(spark):
    """Resume buckets key on url hash, so head-domain skew must NOT
    translate into bucket skew (max/min bucket size bounded)."""
    from clip_retrieval_spark.plans.pipeline import with_bucket

    counts = [
        r["count"]
        for r in with_bucket(pages_df(spark, 2000), 16)
        .groupBy("bucket")
        .count()
        .collect()
    ]
    assert len(counts) == 16
    assert max(counts) / min(counts) < 2.0

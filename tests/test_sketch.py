"""Count-min sketch operator (operators/sketch.py): the CM guarantees
that make it a safe 10^12-token swap-in for exact heavy hitters —
never under-counts, bounded overestimate, cell-wise mergeability (the
property that lets executors fold partitions independently), and
partitioning invariance (fixed md5 seeds, no RNG)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clip_retrieval_spark.operators.sketch import (
    count_min_estimate,
    count_min_sketch,
)

SF = "/root/testdata/sf0.001"
DEPTH, WIDTH = 4, 16  # small width forces collisions on purpose


def _token_counts(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )


def test_never_undercounts_and_error_bound(spark):
    counts = _token_counts(spark)
    n_total = counts.agg(F.sum("cnt")).collect()[0][0]
    sk = count_min_sketch(counts, "tok", "cnt", depth=DEPTH, width=WIDTH)
    est = count_min_estimate(sk, counts, "tok", depth=DEPTH, width=WIDTH)
    j = est.join(counts, "tok").select("est", "cnt").collect()
    assert len(j) == counts.count()
    for r in j:
        # hard guarantee: CM only ever over-counts
        assert r["est"] >= r["cnt"]
        # e*N/width is the classic per-row Markov bound; with the fixed
        # md5 seeds this fixture is deterministic, so asserting it is
        # stable (measured max overestimate ~40% of the bound)
        assert r["est"] - r["cnt"] <= 2.71828 * n_total / WIDTH


def test_sketch_merges_cellwise(spark):
    """sketch(A union B) == cellwise_sum(sketch(A), sketch(B)) — the
    algebraic-merge property the 1000-executor scale story rests on."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    def counts_of(df):
        return (
            df.select(F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count("*").alias("cnt"))
        )

    full = count_min_sketch(
        counts_of(docs), "tok", "cnt", depth=DEPTH, width=WIDTH
    )
    merged = (
        count_min_sketch(counts_of(half_a), "tok", "cnt", DEPTH, WIDTH)
        .unionByName(
            count_min_sketch(counts_of(half_b), "tok", "cnt", DEPTH, WIDTH)
        )
        .groupBy("row", "bucket")
        .agg(F.sum("total").alias("total"))
    )
    a = {(r["row"], r["bucket"]): r["total"] for r in full.collect()}
    b = {(r["row"], r["bucket"]): r["total"] for r in merged.collect()}
    assert a == b


def test_partitioning_invariance(spark):
    counts = _token_counts(spark)
    outs = []
    for nparts in (1, 16):
        sk = count_min_sketch(
            counts.repartition(nparts), "tok", "cnt", DEPTH, WIDTH
        )
        outs.append(
            sorted(
                (r["row"], r["bucket"], r["total"]) for r in sk.collect()
            )
        )
    assert outs[0] == outs[1]


def test_width_validation():
    with pytest.raises(ValueError):
        count_min_sketch(None, "k", "w", depth=4, width=100)
    with pytest.raises(ValueError):
        count_min_estimate(None, None, "k", depth=4, width=8)


def test_gate_matches_duckdb_oracle(spark):
    """The registry gate replays bit-identically in DuckDB (sketch
    state included, not just the ranking)."""
    import duckdb

    import __spark_entry__ as e

    sdf = e.queries()["topk_tokens_sketch"](spark, SF).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    odf = con.sql(e.oracle_sql()["topk_tokens_sketch"]).df()
    assert list(sdf.columns) == list(odf.columns)
    s = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    o = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    assert [tuple(r) for r in s.itertuples(index=False)] == [
        tuple(r) for r in o.itertuples(index=False)
    ]

"""Streaming KG ingest tests: incremental stage-1+2 over a growing
pages directory equals the batch result, and restarts are exactly-once
(no reprocessing of committed input files)."""

from __future__ import annotations

import os

from clip_retrieval_spark.fixtures import pages_df
from clip_retrieval_spark.operators.triples import extract_and_triples_df
from clip_retrieval_spark.streaming.ingest import stream_pages_to_triples


def _triple_set(df):
    return {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in df.select("url", "sent_id", "subj", "pred", "obj").collect()
    }


def _drain(spark, src, out, cp):
    q = stream_pages_to_triples(spark, src, out, cp)
    q.awaitTermination(300)
    assert not q.isActive


def test_streaming_ingest_matches_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "triples")
    cp = str(tmp_path / "cp")

    # batch 1: first 80 pages arrive
    p1 = pages_df(spark, 120).filter("xxhash64(url) % 3 != 0")
    p1.write.mode("append").parquet(src)
    _drain(spark, src, out, cp)
    got1 = _triple_set(spark.read.parquet(out))
    want1 = _triple_set(extract_and_triples_df(p1))
    assert got1 == want1 and len(got1) > 0

    # batch 2: more files land in the same directory; a restarted query
    # must process ONLY the new files (exactly-once via checkpoint)
    p2 = pages_df(spark, 120).filter("xxhash64(url) % 3 = 0")
    p2.write.mode("append").parquet(src)
    files_before = {
        f for f in os.listdir(out) if f.endswith(".parquet")
    }
    _drain(spark, src, out, cp)
    want_all = _triple_set(
        extract_and_triples_df(pages_df(spark, 120))
    )
    result = spark.read.parquet(out)
    assert _triple_set(result) == want_all
    # no duplicate triples -> batch-1 files were not reprocessed
    assert result.count() == len(want_all)
    # and batch-1 output files are untouched (append-only sink)
    assert files_before <= {
        f for f in os.listdir(out) if f.endswith(".parquet")
    }

    # a third drain with nothing new is a no-op
    _drain(spark, src, out, cp)
    assert spark.read.parquet(out).count() == len(want_all)

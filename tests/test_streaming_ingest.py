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


def _drain_deduped(spark, src, out, cp, ledger):
    from clip_retrieval_spark.streaming.ingest import (
        stream_pages_to_triples_deduped,
    )

    q = stream_pages_to_triples_deduped(spark, src, out, cp, ledger)
    q.awaitTermination(300)
    assert not q.isActive


def test_streaming_ingest_ledger_drops_recrawled_pages(spark, tmp_path):
    """Round-4 verdict item #6: a re-sent (re-crawled) batch — same
    page content arriving in brand-new files, which the file-level
    streaming commit log cannot catch — adds ZERO new triples and one
    empty ledger delta."""
    src = str(tmp_path / "pages")
    out = str(tmp_path / "triples")
    cp = str(tmp_path / "cp")
    ledger = str(tmp_path / "ledger")

    pages = pages_df(spark, 80)
    pages.write.mode("append").parquet(src)
    _drain_deduped(spark, src, out, cp, ledger)
    got1 = _triple_set(spark.read.parquet(out))
    assert got1 == _triple_set(extract_and_triples_df(pages))
    n_deltas1 = len(
        [d for d in os.listdir(ledger) if d.startswith("batch_id=")]
    )
    ledger_rows = spark.read.parquet(ledger).count()
    assert ledger_rows == pages.count()  # corpus has no in-batch dups

    # re-crawl: identical pages land again as NEW parquet files
    pages.write.mode("append").parquet(src)
    _drain_deduped(spark, src, out, cp, ledger)
    result = spark.read.parquet(out)
    assert _triple_set(result) == got1
    assert result.count() == len(got1)  # zero new rows, no duplicates
    n_deltas2 = len(
        [d for d in os.listdir(ledger) if d.startswith("batch_id=")]
    )
    assert n_deltas2 == n_deltas1 + 1  # exactly one new (empty) delta
    assert spark.read.parquet(ledger).count() == ledger_rows


def test_streaming_ingest_deduped_batch_replay_is_idempotent(
    spark, tmp_path
):
    """foreachBatch is at-least-once: simulate a crash-replay of a
    committed batch by calling the per-batch processor again with the
    same batch_id — output and ledger must be byte-stable (the ledger
    read excludes the batch's own delta, so the replay cannot mask
    its rows)."""
    from clip_retrieval_spark.streaming.ingest import (
        _read_ledger,
    )
    from clip_retrieval_spark.operators.dedup import incremental_dedup
    from pyspark.sql import functions as F

    out = str(tmp_path / "triples")
    ledger = str(tmp_path / "ledger")
    pages = pages_df(spark, 40).localCheckpoint(eager=True)

    def process(batch_df, batch_id):
        led = _read_ledger(spark, ledger, before_batch=batch_id)
        with_id = batch_df.withColumn("_page_id", F.xxhash64("url"))
        kept, delta = incremental_dedup(
            with_id, led, content_cols=["html"], id_col="_page_id"
        )
        extract_and_triples_df(kept.drop("_page_id")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"batch_id={batch_id}"))
        delta.write.mode("overwrite").parquet(
            os.path.join(ledger, f"batch_id={batch_id}")
        )

    process(pages, 0)
    want = _triple_set(spark.read.parquet(out))
    want_ledger = spark.read.parquet(ledger).count()
    assert len(want) > 0 and want_ledger == 40

    process(pages, 0)  # crash-replay of the SAME batch
    assert _triple_set(spark.read.parquet(out)) == want
    assert spark.read.parquet(out).count() == len(want)
    assert spark.read.parquet(ledger).count() == want_ledger

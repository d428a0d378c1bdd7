"""Streaming KG ingest: new page files -> triples, incrementally.

The batch pipeline (plans.pipeline) processes a snapshot; real corpora
arrive continuously (a crawler keeps appending page files). Structured
Streaming turns the SAME stage-1+2 transformation into an incremental
job: `readStream` tails the input directory, the fused extract+triples
mapInPandas runs unchanged (it is stateless, so it is streaming-legal
as-is), and `writeStream` + a checkpoint directory give exactly-once
file-level semantics — a restarted query resumes from the checkpoint
and never reprocesses a committed input file. This replaces the batch
DAG's bucket ledger with Spark's own streaming commit log at the
ingest edge; downstream global stages (linking, CC) stay periodic
batch jobs over the growing triples table, which is the standard
lambda split for shuffle-heavy graph work.

The reference is strictly batch (clip_inference walks a fixed file
list, reference clip_inference/main.py); streaming ingest is one of
the engine additions, consistent with the north rule's resumability
posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from clip_retrieval_spark.fixtures import PAGES_SCHEMA
from clip_retrieval_spark.operators.triples import extract_and_triples_df


def read_page_stream(
    spark: SparkSession,
    src_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over a directory of page parquet files.
    ``max_files_per_trigger`` bounds per-micro-batch work (the knob that
    keeps batch duration, and so end-to-end latency, flat as the
    directory grows)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def stream_pages_to_triples(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Incremental stage-1+2: tail ``src_dir`` for page files, emit
    triples parquet under ``out_dir``. Exactly-once per input file via
    ``checkpoint_dir`` (restart-safe: already-committed files are
    skipped by the streaming commit log).

    ``available_now=True`` drains everything currently present and
    stops (the batch-backfill trigger); ``False`` runs continuously
    with the default micro-batch trigger.
    """
    pages = read_page_stream(spark, src_dir, max_files_per_trigger)
    triples = extract_and_triples_df(pages)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""spark-submit entry point for incremental KG ingest (stage 1+2).

Tails a directory of page parquet files and appends triples, with
exactly-once-per-input-file semantics from the streaming checkpoint:

    spark-submit --py-files dist/clip_retrieval_spark.zip \
        jobs/run_stream_ingest.py --pages /data/pages \
        --out /data/triples --checkpoint /data/_cp --once

``--once`` drains everything currently present and exits (run it from a
scheduler for batch-cadence backfill); without it the query runs until
interrupted. Re-running after ANY crash resumes from the checkpoint.
Downstream global stages (linking, CC) stay periodic batch jobs over
the growing triples table — see clip_retrieval_spark/streaming/ingest.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from clip_retrieval_spark.session import get_spark  # noqa: E402
from clip_retrieval_spark.streaming.ingest import (  # noqa: E402
    stream_pages_to_triples,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--once", action="store_true",
                    help="drain available files then exit (availableNow)")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument(
        "--refresh-kg", default=None, metavar="DIR",
        help="after a --once drain, run the periodic downstream refresh "
        "(linking + CC -> nodes/edges tables under DIR) over the grown "
        "triples sink; idempotent per epoch (epoch = sink row count), "
        "so a scheduler can pass this every run",
    )
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="kg-stream-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    q = stream_pages_to_triples(
        spark,
        args.pages,
        args.out,
        args.checkpoint,
        available_now=args.once,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    q.awaitTermination()
    progress = q.lastProgress or {}
    result = {
        "out": args.out,
        "last_batch_rows": progress.get("numInputRows"),
        "status": "drained" if args.once else "stopped",
    }
    if args.refresh_kg and args.once:
        from clip_retrieval_spark.io import TableStore
        from clip_retrieval_spark.plans.pipeline import KGPipeline

        triples = spark.read.parquet(args.out)  # respects sink commit log
        # epoch from parquet footers of committed sink files (no job)
        epoch = TableStore(spark, os.path.dirname(args.out)).fast_count(
            os.path.basename(args.out)
        )
        tables = KGPipeline(spark, args.refresh_kg).refresh_downstream(
            triples, epoch=epoch
        )
        result["refresh"] = {
            "epoch": epoch,
            "tables": {k: v.count() for k, v in tables.items()},
        }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

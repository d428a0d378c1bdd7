"""Composed end-to-end driver: pages -> 4-stage KG pipeline -> ANN
index build -> KGClient smoke query, one CLI — the analog of the
reference's ``clip-retrieval end2end`` (reference clip_end2end.py:6-55:
download -> inference -> index -> back/front in one command).

    python jobs/end2end.py --n-pages 2000 --out /tmp/kg_e2e

    spark-submit --py-files dist/clip_retrieval_spark.zip \
        jobs/end2end.py --n-pages 100000 --out /data/kg_e2e

Steps (all in one SparkSession):
  1. synthesize (or read) pages
  2. KGPipeline.run: extract -> triples -> link -> canonicalize,
     checkpointed under <out>/ (resumable mid-run)
  3. build_index_tables over the pipeline's entities table
     -> <out>/index/ (IVF centroids + PQ codebooks/codes)
  4. KGClient.from_index smoke query: top-k for a sampled entity
     surface; asserts the result is non-empty and rank-1 is the
     queried surface itself (exact-match sanity)

Prints one JSON line of per-step wall plus the smoke-query result.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from clip_retrieval_spark.fixtures import pages_df  # noqa: E402
from clip_retrieval_spark.session import get_spark  # noqa: E402


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=2000)
    ap.add_argument("--pages-parquet", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--n-cells", type=int, default=16)
    ap.add_argument("--pq-m", type=int, default=8)
    ap.add_argument("--pq-k", type=int, default=16)
    ap.add_argument("--index", choices=("flat", "ivf", "pq"),
                    default="pq")
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args(argv)

    from clip_retrieval_spark.api import KGClient  # noqa: E402
    from clip_retrieval_spark.operators.embed import DIM  # noqa: E402
    from clip_retrieval_spark.plans.index_build import (  # noqa: E402
        build_index_tables,
    )
    from clip_retrieval_spark.plans.pipeline import KGPipeline  # noqa: E402

    spark = get_spark(master=args.master, app_name="kg-end2end")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    if args.pages_parquet:
        pages = spark.read.parquet(args.pages_parquet)
    else:
        pages = pages_df(spark, args.n_pages)

    t0 = time.monotonic()
    pipe = KGPipeline(spark, args.out, n_buckets=args.n_buckets,
                      materialize_text=False)
    pipe.run(pages)
    counts = pipe.table_counts()
    timings["pipeline_sec"] = round(time.monotonic() - t0, 2)

    entities = spark.read.parquet(os.path.join(args.out, "entities"))
    idx_dir = os.path.join(args.out, "index")
    t0 = time.monotonic()
    if args.index != "flat":  # flat scans entities directly — no build
        build_index_tables(
            entities, idx_dir, dim=DIM, n_cells=args.n_cells,
            pq_m=args.pq_m, pq_k=args.pq_k,
            id_col="entity_id", vec_col="embedding",
            skip_ivf=(args.index == "pq"), skip_pq=(args.index == "ivf"),
        )
    timings["index_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    if args.index == "flat":
        client = KGClient(entities, k=args.k, dim=DIM, index="flat")
    else:
        client = KGClient.from_index(
            entities, idx_dir, index=args.index, k=args.k,
        )
    probe = entities.orderBy("entity_id").first()
    hits = client.query(text=probe["surface"])
    timings["query_sec"] = round(time.monotonic() - t0, 2)

    if not hits:
        raise SystemExit("end2end smoke FAILED: empty top-k")
    if hits[0]["surface"] != probe["surface"]:
        raise SystemExit(
            f"end2end smoke FAILED: rank-1 {hits[0]['surface']!r} != "
            f"queried {probe['surface']!r}"
        )
    result = {
        "counts": counts,
        "index": args.index,
        "query_surface": probe["surface"],
        "top1": hits[0],
        "n_hits": len(hits),
        **timings,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()

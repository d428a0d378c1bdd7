"""spark-submit entry point for offline ANN index construction — the
analog of the reference's ``clip-retrieval index`` step (reference
README.md:271-289: autofaiss index build over inference-output
embeddings; consumed by clip_back via --indices-paths,
clip_back.py:928-975). Here the "index" is a set of parquet tables the
engine's own operators produce and KGClient.from_index loads:

    spark-submit jobs/build_index.py \
        --embeddings /data/entities.parquet --out /data/index \
        --dim 64 --n-cells 256 --pq-m 8 --pq-k 16

Writes under --out:
    centroids.parquet     (cell_id, centroid)         - IVF coarse codebook
    pq_codebooks.parquet  (sub, cell_id, centroid)    - PQ subspace codebooks
    pq_codes.parquet      (id, codes)                 - encoded corpus
    meta.parquet          one row of build parameters

All training happens in-engine (operators.kmeans / operators.pq):
assignment/encoding are narrow folds over broadcast codebooks, so the
build scales with the corpus scan, not with driver memory.
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

from clip_retrieval_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--embeddings", required=True,
                    help="parquet with (id, embedding) columns")
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--dim", type=int, required=True)
    ap.add_argument("--n-cells", type=int, default=256)
    ap.add_argument("--iterations", type=int, default=2)
    ap.add_argument("--pq-m", type=int, default=8)
    ap.add_argument("--pq-k", type=int, default=16)
    ap.add_argument("--skip-ivf", action="store_true")
    ap.add_argument("--skip-pq", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="kg-build-index")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(args.embeddings).select(
        args.id_col, args.vec_col
    )
    t0 = time.monotonic()
    from clip_retrieval_spark.plans.index_build import (  # noqa: E402
        build_index_tables,
    )

    result = build_index_tables(
        emb, args.out, dim=args.dim, n_cells=args.n_cells,
        iterations=args.iterations, pq_m=args.pq_m, pq_k=args.pq_k,
        id_col=args.id_col, vec_col=args.vec_col,
        skip_ivf=args.skip_ivf, skip_pq=args.skip_pq,
    )
    result["wall_sec"] = round(time.monotonic() - t0, 2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

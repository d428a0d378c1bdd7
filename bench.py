"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full column
materialization — count() would let Catalyst prune work). The KG
pipeline stages run over pages synthesized from the documents table at
the same scale factor.

Noise control (round-2 lesson: a single-sample bench under sandbox load
recorded a false 11x regression): every query and the KG pass run
$SPARK_GRAFT_BENCH_RUNS times (default 3) and the reported number is
the MEDIAN; the raw runs and os.getloadavg() ride along in the JSON so
a contaminated run is self-identifying.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clip_retrieval_spark.entry_queries import QUERIES  # noqa: E402
from clip_retrieval_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "window_top3_orders",
    "events_hourly_rollup",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "lang_id_stopwords",
    "doc_fingerprints",
    "ann_topk_bruteforce",
    "embedding_neardup_pairs",
    "kg_extract_text",
    "kg_triples",
    "kg_links",
    "kmeans_assign2",
    "pq_adc_search",
    "chunk_dedup_ratio",
    "doc_communities_lpa",
    # link_prediction_topk is gate-only: its wall is dominated by the
    # same dedup_jaccard_pairs upstream doc_communities_lpa already
    # times, so benching it would double-count one plan
    "semantic_dedup_keep",
    "lm_perplexity",
    # r5: the count-min swap-in; benched INSTEAD of the exact
    # topk_tokens_by_source (same upstream tokenization, and the sketch
    # path is the one that matters at scale)
    "topk_tokens_sketch",
    # r5 wave 8: SNM is a block-partitioned window over the corpus and
    # the histogram sketch is the one-pass grouped-percentile swap-in.
    # link_negative_samples is gate-only per the link_prediction_topk
    # precedent: measured 14.1 s of which ~95% is its kg_nodes_edges
    # upstream (the full stage-1..4 DAG) — benching it would
    # double-count a plan the KG entries already time
    "er_snm_pairs",
    "hist_quantile_sketch",
    # The r5 KG-consumer gates are gate-only, per the
    # link_prediction_topk precedent: doc_bfs_distances' wall is ~85%
    # the same dedup_jaccard_pairs upstream doc_communities_lpa
    # already times (measured at sf0.1: 12.7 s jaccard vs 2.5 s of
    # actual BFS rounds), kg_twohop_paths/kg_ntriples_export re-run
    # the stage DAG kg_links already times, and hll/blocking share
    # the benched tokenization upstreams.
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # non-POSIX platform
        return []


def _wait_for_idle() -> dict:
    """Load gate (round-4 verdict: BENCH_r04 started at loadavg 11.4 and
    its per-query walls were contention, not signal). Poll until 1-min
    loadavg drops below SPARK_GRAFT_BENCH_MAX_LOAD (default 2.0) or
    SPARK_GRAFT_BENCH_LOAD_WAIT seconds (default 900) elapse, then
    proceed either way — the returned record rides the output JSON so a
    run that started contaminated self-identifies instead of silently
    publishing noise."""
    threshold = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "900"))
    t0 = time.monotonic()
    while True:
        la = _loadavg()
        waited = round(time.monotonic() - t0, 1)
        if not la or la[0] < threshold:
            return {"threshold": threshold, "waited_sec": waited,
                    "satisfied": True, "loadavg": la}
        if waited >= max_wait:
            return {"threshold": threshold, "waited_sec": waited,
                    "satisfied": False, "loadavg": la}
        time.sleep(min(15.0, max(max_wait - waited, 1.0)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")), 1)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    load_gate = _wait_for_idle()
    spark = get_spark(
        master=f"local[{cpus}]", app_name="bench", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_start = _loadavg()

    # warm-up (JVM + Python workers), not timed
    _force(QUERIES["q1_pricing_summary"][0](spark, sf_dir))

    timings: dict[str, float] = {}
    runs_raw: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name][0]
        samples: list[float] = []
        for _ in range(n_runs):
            t0 = time.monotonic()
            _force(fn(spark, sf_dir))
            samples.append(round(time.monotonic() - t0, 3))
        runs_raw[name] = samples
        timings[name] = round(statistics.median(samples), 3)

    # the north metric: fused stage-1+2 triples/sec over a deterministic
    # synthetic pages corpus scaled to the sf (600k pages/sf-unit)
    from clip_retrieval_spark.fixtures import pages_df
    from clip_retrieval_spark.operators.triples import extract_and_triples_df

    n_pages = max(int(600_000 * float(sf)), 1000)
    pages = pages_df(spark, n_pages)
    # Observation rides the noop write — counting in the same pass
    # instead of a second full extraction run
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    kg_samples: list[float] = []
    n_triples = 0
    for i in range(n_runs):
        t0 = time.monotonic()
        tr = extract_and_triples_df(pages)
        obs = Observation(f"kg{i}")
        tr.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
            "noop"
        ).mode("overwrite").save()
        kg_samples.append(round(time.monotonic() - t0, 3))
        n_triples = obs.get["n"]
    kg_wall = statistics.median(kg_samples)
    runs_raw["kg_fused_pass"] = kg_samples

    total = round(sum(timings.values()), 3)
    # like-for-like subtotal over the round-3 query set, so round-over-
    # round totals stay comparable as new queries join the headline list
    r03_set = set(BENCH_QUERIES) - {"chunk_dedup_ratio",
                                    "doc_communities_lpa",
                                    "semantic_dedup_keep",
                                    "lm_perplexity",
                                    # added after r3 (r5):
                                    "topk_tokens_sketch",
                                    "er_snm_pairs",
                                    "hist_quantile_sketch"}
    total_r03 = round(
        sum(v for k, v in timings.items() if k in r03_set), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "value_r03_queryset": total_r03,
                "unit": "sec",
                "queries": timings,
                "runs": runs_raw,
                "n_runs": n_runs,
                "loadavg_start": load_start,
                "loadavg_end": _loadavg(),
                "load_gate": load_gate,
                "sf": float(sf),
                "cpus": int(cpus),
                "kg_pages": n_pages,
                "kg_wall_sec": round(kg_wall, 3),
                "kg_triples": n_triples,
                "pages_per_sec": round(n_pages / kg_wall, 1),
                "triples_per_sec": round(n_triples / kg_wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

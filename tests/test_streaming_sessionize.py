"""Stateful streaming sessionization (applyInPandasWithState)."""

from __future__ import annotations

import json


def test_sessionize_stream_closes_gapped_sessions(spark, tmp_path):
    from clip_retrieval_spark.streaming.sessionize import sessionize_stream
    from pyspark.sql import types as T

    src = tmp_path / "events"
    src.mkdir()
    base = 1700000000
    rows = [
        # user 1: 3 events, 10-min gaps -> one session; then a 2h gap
        # -> session closes; 2 more events stay open in state
        {"user_id": 1, "ts": base},
        {"user_id": 1, "ts": base + 600},
        {"user_id": 1, "ts": base + 1200},
        {"user_id": 1, "ts": base + 1200 + 7200},
        {"user_id": 1, "ts": base + 1200 + 7300},
        # user 2: single burst, stays open in state (not emitted)
        {"user_id": 2, "ts": base + 100},
        {"user_id": 2, "ts": base + 200},
    ]
    with open(src / "a.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .selectExpr("user_id", "timestamp_seconds(ts) as ts")
    )
    sessions = sessionize_stream(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sess_out").collect()
    }
    # user 1's first session closes in-batch (2h gap in the data);
    # user 2's idle session flushes via the event-time TIMEOUT once the
    # watermark (driven by user 1's later events) passes it; user 1's
    # open tail stays in state (watermark hasn't reached its timeout)
    assert got == {
        (1, float(base), float(base + 1200), 3),
        (2, float(base + 100), float(base + 200), 2),
    }, got


def test_metrics_rollup_drops_late_data_past_watermark(spark, tmp_path):
    """Watermark semantics across restarts: a record arriving AFTER
    the checkpointed watermark passed its window must be dropped — the
    finalized minute keeps its run-1 value instead of silently
    absorbing a stale metric replay (the late-data contract of
    streaming/metrics._rollup's 2-minute watermark)."""
    import json as _json
    import os

    from clip_retrieval_spark.streaming.metrics import rollup_metrics_once

    mdir = tmp_path / "metrics"
    odir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(mdir)
    base = 1_700_000_100 // 60 * 60

    def rec(at, rows):
        return _json.dumps(
            {"stage": "s1", "run_id": "r", "at": float(at),
             "rows": rows, "wall_ms": 1, "cpu_ms": 1, "buckets": 1}
        )

    # run 1: two records in minute 0, one at minute +10 that drives the
    # watermark to base+600-120s, far past minute 0's window end
    (mdir / "b1.jsonl").write_text(
        "\n".join([rec(base + 10, 5), rec(base + 20, 7),
                   rec(base + 600, 1)]) + "\n"
    )
    rollup_metrics_once(spark, str(mdir), odir, ckpt)
    first = {
        (r.minute.timestamp(), r.rows, r.reports)
        for r in spark.read.parquet(odir).filter("stage = 's1'").collect()
    }
    assert (float(base), 12, 2) in first

    # run 2: one LATE record for minute 0 (behind the checkpointed
    # watermark) and one fresh record at minute +20
    (mdir / "b2.jsonl").write_text(
        "\n".join([rec(base + 30, 100), rec(base + 1200, 2)]) + "\n"
    )
    rollup_metrics_once(spark, str(mdir), odir, ckpt)
    rows = {
        r.minute.timestamp(): (r.rows, r.reports)
        for r in spark.read.parquet(odir).filter("stage = 's1'").collect()
    }
    assert rows[float(base)] == (12, 2), "late record leaked past watermark"
    assert rows[float(base + 1200)] == (2, 1)

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

"""Count-min sketch: approximate heavy hitters with bounded memory.

The 10^12-token swap-in documented by ``topk_tokens_by_source``
(entry_queries.py): exact per-key counts need a shuffle keyed by every
distinct token, while a count-min sketch is a fixed depth x width grid
of counters that merges associatively — each executor folds its
partition into a local grid, partial grids sum cell-wise, and the
final state is depth*width rows regardless of corpus size (Cormode &
Muthukrishnan 2005). Estimates only ever OVER-count (est >= true;
est <= true + 2N/width per row w.p. 1/2, min over depth rows), which
is the safe direction for stopword/boilerplate screens.

Replayability contract: buckets are hex-digit prefixes of
md5(key ':' row) — bit-identical in Spark and DuckDB — so the driver's
oracle replays the exact sketch state on the same parquet (the same
trick distinct_sketch_kmv uses). No RNG, no JVM-specific hashing.

Scale notes: the sketch build is one algebraic aggregation over
(row, bucket) — map-side combine collapses each partition to at most
depth*width cells before the shuffle. The estimate path broadcasts the
finished sketch (depth*width rows, a few KB) so candidate keys never
shuffle. Reference analog: clip_back.py's metadata counting is exact
and in-memory; this is the distributed-scale replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cm_bucket(key, row, hex_digits: int):
    """Bucket in [0, 16^hex_digits) from the md5 of "key:row" — the
    cross-engine-stable uniform hash family (one row index = one seed).
    """
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", key, row.cast("string"))),
            1,
            hex_digits,
        ),
        16,
        10,
    ).cast("int")


def _check_width(width: int) -> int:
    hex_digits = 0
    w = width
    while w > 1:
        if w % 16:
            raise ValueError("width must be a power of 16")
        w //= 16
        hex_digits += 1
    if hex_digits == 0:
        raise ValueError("width must be >= 16")
    return hex_digits


def count_min_sketch(
    counts: DataFrame,
    key_col: str,
    weight_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Fold (key, weight) rows into the sketch grid.

    Returns the sketch state as (row, bucket, total) — at most
    depth * width rows. ``counts`` may be raw occurrences
    (weight_col = lit(1) pre-aggregated or not): the grid sums
    whatever weights it is given, and SUM is algebraic, so partial
    grids combine map-side before the single small shuffle."""
    hex_digits = _check_width(width)
    rows = F.explode(
        F.array([F.lit(r) for r in range(depth)])
    ).alias("row")
    return (
        counts.select(
            F.col(key_col).alias("key"),
            F.col(weight_col).alias("weight"),
            rows,
        )
        .withColumn(
            "bucket", _cm_bucket(F.col("key"), F.col("row"), hex_digits)
        )
        .groupBy("row", "bucket")
        .agg(F.sum("weight").alias("total"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for every key in ``keys``.

    Returns (key_col, est) with est = min over rows of the key's
    bucket counters — the classic CM upper-bound estimate. The sketch
    side is broadcast (<= depth*width rows), so this is a narrow pass
    over the candidate keys: no shuffle of the corpus."""
    hex_digits = _check_width(width)
    expanded = (
        keys.select(F.col(key_col).alias("key"))
        .distinct()
        .select(
            "key",
            F.explode(
                F.array([F.lit(r) for r in range(depth)])
            ).alias("row"),
        )
        .withColumn(
            "bucket", _cm_bucket(F.col("key"), F.col("row"), hex_digits)
        )
    )
    return (
        expanded.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("total"), F.lit(0))).alias("est"))
        .select(F.col("key").alias(key_col), "est")
    )

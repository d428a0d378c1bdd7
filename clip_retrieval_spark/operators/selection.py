"""Distributed exact selection (k-th smallest) without a global sort.

An exact global quantile at 10^12 rows cannot be a `ORDER BY ... LIMIT`
(full-sort shuffle) and should not have to be approximate. The classic
answer is iterative histogram refinement (the distributed
median-of-medians / bisection family): each round bins the surviving
range into B equal-width buckets with ONE algebraic aggregation,
collects the B counts (driver-side, B ints — the same legitimate
tiny-collect class as k-means' codebook), locates the bucket holding
the target rank, and recurses into it. R rounds shrink the candidate
range by ~B^R (128^3 ≈ 2·10^6x), after which the residue is window-
ranked — a shuffle of the residue only, never the table.

Exactness does not depend on B or R: after every narrowing the target's
rank is RE-ANCHORED with an exact strict-below count, so float edge
effects at bucket boundaries can widen the residue slightly but can
never move the selected element; the final rank step is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def kth_smallest(
    df: DataFrame,
    col: str,
    k: int,
    rounds: int = 3,
    bins: int = 128,
) -> float:
    """Exact k-th smallest value of ``df[col]`` (1-indexed; nulls
    ignored), via ``rounds`` histogram-refinement passes + one ranked
    pass over the residue."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    vals = df.select(F.col(col).alias("v")).filter(
        F.col("v").isNotNull()
    )
    head = vals.agg(
        F.count("*").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    n = head["n"]
    if k > n:
        raise ValueError(f"k={k} exceeds non-null count {n}")
    lo, hi = float(head["lo"]), float(head["hi"])

    remaining = k  # rank of the target within [lo, hi]
    slack = 0.0  # one bucket of float-edge slack for the final rank
    for _ in range(rounds):
        if lo >= hi:
            break  # range collapsed: every candidate equals lo
        width = (hi - lo) / bins
        slack = width
        bucket = F.least(
            F.lit(bins - 1),
            F.floor((F.col("v") - lo) / width).cast("int"),
        )
        stats = (
            vals.filter((F.col("v") >= lo) & (F.col("v") <= hi))
            .groupBy(bucket.alias("b"))
            .agg(F.count("*").alias("c"))
            .collect()
        )
        counts = {r["b"]: r["c"] for r in stats}
        prev_lo = lo
        seen = 0
        for b in range(bins):
            c = counts.get(b, 0)
            if seen + c >= remaining:
                lo_b = lo + b * width
                hi_b = hi if b == bins - 1 else lo + (b + 1) * width
                lo, hi = lo_b, hi_b
                break
            seen += c
        # Re-anchor exactly: float edges can misplace boundary rows by
        # one bucket, so never trust `seen` — count strictly-below rows
        # of the NEW lower bound and restate the in-range rank.
        below = vals.filter(F.col("v") < lo).count()
        remaining = k - below
        if remaining < 1:
            # the target sits exactly on a float boundary just below
            # `lo`; step the lower bound back one bucket and re-anchor
            lo = prev_lo if b == 0 else prev_lo + (b - 1) * width
            below = vals.filter(F.col("v") < lo).count()
            remaining = k - below

    w = Window.orderBy("v")

    def _pick(residue: DataFrame) -> list:
        return (
            residue.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == remaining)
            .select("v")
            .collect()
        )

    picked = _pick(vals.filter((F.col("v") >= lo) & (F.col("v") <= hi)))
    if not picked:
        # the upper bound is a SIZE optimization only: `remaining` is
        # anchored to count(v < lo), so ranking everything >= lo is
        # always exact. An ulp-level float edge can bin a value one
        # bucket low and push the target just past `hi` — widen by one
        # bucket of slack rather than trusting the edge.
        picked = _pick(
            vals.filter((F.col("v") >= lo) & (F.col("v") <= hi + slack))
        )
    if not picked:
        raise RuntimeError(
            f"selection lost rank {remaining} above {lo}"
        )
    return float(picked[0]["v"])

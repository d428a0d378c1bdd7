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
    if lo >= hi:
        # constant column: every non-null value equals lo. Without this
        # short-circuit the final rank pass would window-sort the WHOLE
        # column in one task.
        return lo

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
        while remaining < 1:
            # the target sits exactly on a float boundary just below
            # `lo`; widen the lower bound back bucket by bucket until
            # the anchored rank is positive again (terminates at the
            # global min, where below=0 and remaining=k>=1).
            lo = prev_lo if lo - width <= prev_lo else lo - width
            below = vals.filter(F.col("v") < lo).count()
            remaining = k - below
            if lo <= prev_lo and remaining < 1:
                prev_lo -= width  # duplicates stacked within an ulp
                # of the round floor: keep stepping below it

    if lo >= hi:
        # the surviving range collapsed (duplicate-saturated column):
        # every candidate in [lo, hi] equals lo and the anchored rank
        # remaining >= 1 selects it — no rank pass needed, and no
        # single-task window over a potentially huge residue.
        return lo

    def _pick(residue: DataFrame, rem: int) -> float | None:
        # cheap aggregates first: they bound the residue and settle the
        # common degenerate shapes without a single-task global window
        st = residue.agg(
            F.count("*").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        ).collect()[0]
        if st["c"] < rem:
            return None  # rank lies past this residue: caller widens
        if rem == 1:
            return float(st["mn"])
        if st["mn"] == st["mx"]:
            return float(st["mn"])  # all-equal residue
        w = Window.orderBy("v")
        rows = (
            residue.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == rem)
            .select("v")
            .collect()
        )
        return float(rows[0]["v"]) if rows else None

    got = _pick(
        vals.filter((F.col("v") >= lo) & (F.col("v") <= hi)), remaining
    )
    if got is None:
        # the upper bound is a SIZE optimization only: `remaining` is
        # anchored to count(v < lo), so ranking everything >= lo is
        # always exact. An ulp-level float edge can bin a value one
        # bucket low and push the target just past `hi` — widen by one
        # bucket of slack rather than trusting the edge.
        got = _pick(
            vals.filter((F.col("v") >= lo) & (F.col("v") <= hi + slack)),
            remaining,
        )
    if got is None:
        raise RuntimeError(
            f"selection lost rank {remaining} above {lo}"
        )
    return got

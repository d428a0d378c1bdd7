"""Property-based as-of-join test: random keyed event streams through
operators.asof.asof_join must match a brute-force per-row reference
(for each left row: the right row with max (ts, tie) among ts<=left.ts,
or strictly < in strict mode). Randomized inputs cover the tie/NULL/
empty-side edges a golden fixture misses."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clip_retrieval_spark.operators.asof import asof_join

_key = st.sampled_from(["k1", "k2", "k3"])
_ts = st.integers(min_value=0, max_value=12)

_rights = st.lists(
    st.tuples(_key, _ts), min_size=0, max_size=12
)
_lefts = st.lists(
    st.tuples(_key, _ts), min_size=1, max_size=10
)


def _brute(lefts, rights, strict):
    out = {}
    for li, (lk, lts) in enumerate(lefts):
        best = None
        for ri, (rk, rts) in enumerate(rights):
            if rk != lk:
                continue
            if (rts >= lts) if strict else (rts > lts):
                continue
            if best is None or (rts, ri) > best[:2]:
                best = (rts, ri)
        out[li] = best[1] if best is not None else None
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(lefts=_lefts, rights=_rights, strict=st.booleans())
def test_asof_join_matches_bruteforce(spark, lefts, rights, strict):
    l_df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)],
        "k string, ts long, lid long",
    )
    r_df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rights)],
        "k string, ts long, rid long",
    ) if rights else spark.createDataFrame([], "k string, ts long, rid long")
    got = {
        r["lid"]: r["right_rid"]
        for r in asof_join(
            l_df, r_df, on="k", tie_break="rid", strict=strict
        ).collect()
    }
    assert got == _brute(lefts, rights, strict)

"""The composed end2end driver (jobs/end2end.py) — the analog of the
reference's clip_end2end.py:6-55 one-command lifecycle — run whole on a
small synthetic corpus: pipeline -> index build -> client query."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs")
)

import end2end  # noqa: E402


def test_end2end_chain(spark, tmp_path):
    out = str(tmp_path / "e2e")
    result = end2end.main(
        [
            "--n-pages", "300",
            "--out", out,
            "--index", "pq",
            "--n-cells", "4",
            "--pq-k", "4",
            "--k", "3",
        ]
    )
    assert result["n_hits"] > 0
    assert result["top1"]["surface"] == result["query_surface"]
    assert result["top1"]["rank"] == 1
    assert result["counts"]["triples"] > 0
    assert result["counts"]["nodes"] > 0
    # the index artifacts really landed on disk
    for t in ("pq_codebooks.parquet", "pq_codes.parquet", "meta.parquet"):
        assert os.path.exists(os.path.join(out, "index", t))

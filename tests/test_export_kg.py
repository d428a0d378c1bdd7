"""jobs/export_kg.py: N-Triples export of a materialized KG —
representative-surface resolution, W3C line shape, determinism."""

from __future__ import annotations

import gzip
import glob
import json


def _write_kg(spark, root):
    """Minimal nodes/edges tables in the pipeline's STAGE_TABLES
    layout: two canonicals (one merged pair), three edges."""
    nodes = spark.createDataFrame(
        [
            (11, 1, "Acme Corp"),
            (12, 1, "ACME Corporation"),  # merged into canonical 1
            (21, 2, "Beta Inc"),
        ],
        "entity_id long, canonical_id long, surface string",
    )
    edges = spark.createDataFrame(
        [
            (1, "acquired", 2, "u1", "2024-01-01T00:00:00"),
            (2, "owns", 1, "u2", "2024-01-02T00:00:00"),
            (1, "acquired", 2, "u3", "2024-01-03T00:00:00"),
        ],
        "canonical_subj long, pred string, canonical_obj long, "
        "url string, warc_ts string",
    )
    nodes.write.parquet(f"{root}/nodes")
    edges.write.parquet(f"{root}/edges")


def _read_lines(out_dir):
    lines = []
    for p in sorted(glob.glob(f"{out_dir}/part-*.txt.gz")):
        with gzip.open(p, "rt") as f:
            lines.extend(ln.rstrip("\n") for ln in f if ln.strip())
    return sorted(lines)


def test_export_kg_ntriples(spark, tmp_path, capsys):
    from jobs.export_kg import main

    kg = str(tmp_path / "kg")
    out = str(tmp_path / "nt")
    _write_kg(spark, kg)
    res = main(["--kg-dir", kg, "--out", out])
    assert res["n_triples"] == 3
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["n_triples"] == 3

    lines = _read_lines(out)
    # canonical 1's representative surface is the lexicographic min
    # ("ACME Corporation" < "Acme Corp"); spaces percent-encoded
    assert lines == sorted(
        [
            "<http://kg.example/e/ACME%20Corporation> "
            "<http://kg.example/p/acquired> "
            "<http://kg.example/e/Beta%20Inc> .",
            "<http://kg.example/e/Beta%20Inc> "
            "<http://kg.example/p/owns> "
            "<http://kg.example/e/ACME%20Corporation> .",
            "<http://kg.example/e/ACME%20Corporation> "
            "<http://kg.example/p/acquired> "
            "<http://kg.example/e/Beta%20Inc> .",
        ]
    )

    # deterministic across reruns (overwrite mode)
    main(["--kg-dir", kg, "--out", out])
    assert _read_lines(out) == lines

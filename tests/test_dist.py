"""Ship-shape evidence: the engine really runs as
``spark-submit --py-files dist/clip_retrieval_spark.zip`` (the north
rule's packaging contract) — from a NEUTRAL working directory with the
repo stripped from PYTHONPATH, so every import must resolve from the
zipped package, not the checkout."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(dest: str) -> str:
    """Same content as `make dist`, built portably via zipfile."""
    pkg = os.path.join(REPO, "clip_retrieval_spark")
    zpath = os.path.join(dest, "clip_retrieval_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_zip(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")

    zpath = _build_zip(str(tmp_path))
    job = str(tmp_path / "job.py")
    shutil.copyfile(os.path.join(REPO, "jobs", "run_pipeline.py"), job)

    env = dict(os.environ)
    # the checkout must NOT be importable: the zip is the only source
    env["PYTHONPATH"] = ""
    env.pop("SPARK_HOME", None)
    out_dir = str(tmp_path / "kg")
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zpath,
            job,
            "--n-pages", "300",
            "--out", out_dir,
            "--shuffle-partitions", "8",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [
        ln for ln in proc.stdout.strip().splitlines()
        if ln.startswith("{")
    ][-1]
    result = json.loads(line)
    assert result["n_pages"] == 300
    assert result["counts"]["triples"] > 0
    assert result["counts"]["edges"] > 0
    # the KG tables really landed where the job said
    assert os.path.isdir(os.path.join(out_dir, "edges"))

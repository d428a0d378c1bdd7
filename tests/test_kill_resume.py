"""Hard-kill resume test: SIGKILL the pipeline job mid-run, restart it,
and assert the final tables equal an uninterrupted run's — the literal
north-rule scenario (any stage resumes mid-run), beyond the simulated
partial-commit tests in test_pipeline_resume.py."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = 3000


def _run_job(out_dir: str, kill_after: float | None = None):
    proc = subprocess.Popen(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--n-pages", str(N_PAGES),
            "--out", out_dir,
            "--master", "local[4]",
            "--shuffle-partitions", "8",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )
    if kill_after is None:
        out, _ = proc.communicate(timeout=600)
        assert proc.returncode == 0, out
        return json.loads(out.strip().splitlines()[-1])
    time.sleep(kill_after)
    # SIGKILL the whole process group: driver JVM + python workers die
    # with no chance to clean up (the crash the checkpoint protocol is
    # designed for)
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait(timeout=60)
    return None


def test_sigkill_then_resume_produces_identical_tables(tmp_path):
    ref = _run_job(str(tmp_path / "ref"))

    out = str(tmp_path / "killed")
    _run_job(out, kill_after=25.0)  # dies somewhere mid-DAG
    # some stage data may exist without commits; resume must handle it
    resumed = _run_job(out)

    assert resumed["counts"] == ref["counts"], (resumed, ref)
    # checkpoint ledger covers every stage exactly once per bucket
    import duckdb

    cp = duckdb.sql(
        f"SELECT stage, partition_id, COUNT(*) AS n "
        f"FROM '{out}/_checkpoints/*.parquet' GROUP BY 1, 2 HAVING n > 1"
    ).fetchall()
    assert cp == [], cp

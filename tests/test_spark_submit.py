"""North-rule launch path: `spark-submit --py-files engine.zip
jobs/pagerank_job.py` as a real subprocess (the exact cluster launch
shape, with a local[2] master standing in for the cluster manager).
Checkpoint state + resume are exercised through the same entrypoint.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return cand if os.path.exists(cand) else None
    except ImportError:
        return None


def test_spark_submit_pyfiles_pagerank(spark, tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit binary not found")

    # package the engine exactly as the documented cluster launch does
    zpath = tmp_path / "engine.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "networkit_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    # tiny deterministic pages table (written with the session fixture)
    from networkit_spark.sources.pages import gen_pages_pdf

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 0)]
    pages_dir = str(tmp_path / "pages")
    spark.createDataFrame(gen_pages_pdf(edges, 5)).write.parquet(pages_dir)

    out_dir = str(tmp_path / "pr_out")
    ckpt_dir = str(tmp_path / "pr_state")
    env = dict(os.environ)
    env.pop("SPARK_LOCAL_DIRS", None)
    proc = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--py-files", str(zpath),
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            os.path.join(REPO, "jobs", "pagerank_job.py"),
            "--pages", pages_dir,
            "--out", out_dir,
            "--checkpoint", ckpt_dir,
            "--max-iterations", "5",
            "--tol", "0",
            "--top-k", "5",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),  # NOT the repo root: --py-files must provide the pkg
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 5
    assert {"id", "url", "score"} <= set(rows[0].asDict())
    # durable per-superstep state + metrics landed
    assert os.path.isdir(os.path.join(ckpt_dir, "state"))
    assert os.path.exists(os.path.join(ckpt_dir, "metrics.jsonl"))

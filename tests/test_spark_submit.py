"""spark-submit --py-files packaging (the north rule's execution mode).

The engine must run as ``spark-submit --py-files engine.zip main.py <cmd>``
on a cluster — no pip install on executors, no repo checkout.  This test
builds the zip exactly as a deploy pipeline would, then drives
generate → replay --wap → validate through REAL spark-submit processes
(fresh JVMs, the package imported only from the zip), asserting the
replayed table validates clean.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "credix_data_pipeline_spark"


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        cand = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
        return cand if os.path.exists(cand) else None
    except ImportError:
        return None


def _build_zip(out_path: str) -> str:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(REPO, PKG)
        for dirpath, _dirs, files in os.walk(pkg_root):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                abs_f = os.path.join(dirpath, fn)
                zf.write(abs_f, os.path.relpath(abs_f, REPO))
    return out_path


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not found")
def test_spark_submit_py_files_end_to_end(tmp_path):
    submit = _spark_submit()
    zip_path = _build_zip(str(tmp_path / "engine.zip"))
    main_py = os.path.join(REPO, PKG, "main.py")
    feed, table = str(tmp_path / "feed"), str(tmp_path / "table")

    env = {k: v for k, v in os.environ.items()}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # the zip must be the ONLY way the package resolves in the driver too
    env.pop("PYTHONPATH", None)

    def run(*args: str) -> subprocess.CompletedProcess:
        return subprocess.run(
            [
                submit,
                "--master", "local[2]",
                "--py-files", zip_path,
                main_py,
                "--shuffle-partitions", "4",
                *args,
            ],
            capture_output=True,
            text=True,
            cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
            env=env,
            timeout=420,
        )

    r = run("generate", "--feed", feed, "--events", "1500",
            "--conversations", "30", "--events-per-chunk", "500")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["chunks"] == 3

    r = run("replay", "--feed", feed, "--table", table,
            "--buckets", "4", "--fast", "--wap")
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["batches"] >= 1 and rep["rows_in"] >= 1500

    r = run("validate", "--table", table)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["passed"]

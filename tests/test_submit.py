"""Cluster deployment path: `spark-submit --py-files engine.zip` (north
rule) must run the extraction job with the package imported from the zip,
not the repo checkout — so the wrapper is invoked from a foreign cwd."""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_wrapper_runs_extract(tmp_path):
    env = dict(os.environ)
    env["SPARK_EXTRACT_DIST"] = str(tmp_path / "dist")
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    proc = subprocess.run(
        ["bash", os.path.join(ROOT, "tools", "submit.sh"),
         "--master", "local[4]",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--synthesize", "--workdir", str(tmp_path / "run")],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "extracted 500 new / 500 docs" in proc.stdout
    assert os.path.exists(tmp_path / "dist" / "ollama_ocr_spark.zip")
    # resume contract holds across spark-submit invocations too
    proc2 = subprocess.run(
        ["bash", os.path.join(ROOT, "tools", "submit.sh"),
         "--master", "local[4]",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--synthesize", "--workdir", str(tmp_path / "run")],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=300,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "extracted 0 new / 500 docs" in proc2.stdout


if __name__ == "__main__":
    sys.exit(0)

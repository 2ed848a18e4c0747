"""Launch-shape test: spark-submit --py-files <zip> tools/qc_submit.py
(the north_rule's cluster launch contract), run end-to-end in a fresh
process with the repo NOT on PYTHONPATH — the package must arrive via the
py-files zip alone."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(os.path.dirname(shutil.which("python") or sys.executable)),
        "bin",
        "spark-submit",
    )
    if not shutil.which("spark-submit"):
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        if os.path.exists(cand):
            spark_submit = cand
        else:
            pytest.skip("spark-submit not found")

    sys.path.insert(0, REPO)
    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "kneaddata_spark.zip"))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out_dir = str(tmp_path / "out")
    # one retry: this spawns a SECOND Spark JVM; under the full suite's
    # load this box occasionally kills/starves it (observed one-off
    # failure in an otherwise-green run; always passes standalone)
    for attempt in (1, 2):
        proc = subprocess.run(
            [
                spark_submit,
                "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--py-files", zip_path,
                os.path.join(REPO, "tools", "qc_submit.py"),
                "--synthesize", "300",
                "--output", out_dir,
            ],
            capture_output=True,
            text=True,
            timeout=600,
            env=env,
            cwd=str(tmp_path),  # NOT the repo: only the zip provides the package
        )
        if proc.returncode == 0:
            break
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert metrics["n_rows"] == 300
    assert 0 < metrics["n_kept"] < 300
    assert os.path.isdir(os.path.join(out_dir, "clips_qc", "status=kept"))

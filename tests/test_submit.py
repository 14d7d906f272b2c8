"""The north rule's deployment model, run for real: spark-submit
--py-files with the package resolving from the shipped zip alone.

The test stages the job script in a temp dir and strips PYTHONPATH, so
neither the driver nor the executors can see the repo checkout — the
import works from dist/har2tree_spark.zip or the submit fails (the
executor-side mapInPandas stages in datagen/cascade are what forgetting
--py-files breaks on a real cluster)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, REPO)
    from tools.make_pyfiles_zip import build

    zip_path = build(str(tmp_path / "har2tree_spark.zip"))
    job = tmp_path / "submit_job.py"
    shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), job)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            str(job), "", "200",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
        check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["docs"] == 200
    assert res["join_rows"] > 0 and res["tile_rollups"] > 0
    # the package must have come from the shipped zip, not a checkout
    assert "har2tree_spark.zip" in res["pkg_from"], res["pkg_from"]

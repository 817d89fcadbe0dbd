"""The north-rule launch shape: the job must run via spark-submit
--py-files with the library shipped as a zip (no repo on sys.path)."""

import json
import os
import shutil
import subprocess
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def test_spark_submit_py_files_runs_pipeline():
    if not os.path.exists(SPARK_SUBMIT):
        import pytest
        pytest.skip("spark-submit not installed")
    tmp = tempfile.mkdtemp(prefix="pikes_submit_")
    try:
        zpath = f"{tmp}/pikes_spark.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            pkg = os.path.join(REPO, "pikes_spark")
            for root, _dirs, files in os.walk(pkg):
                for f in files:
                    if f.endswith((".py", ".tsv")):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, REPO))
        out = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]",
             "--conf", "spark.sql.shuffle.partitions=8",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zpath,
             os.path.join(REPO, "scripts", "submit_job.py"),
             "--sf-dir", "/root/testdata/sf0.001",
             "--out", f"{tmp}/out"],
            cwd=tmp, capture_output=True, text=True, timeout=480)
        assert out.returncode == 0, out.stderr[-2000:]
        result = json.loads(out.stdout.strip().splitlines()[-1])
        assert result["added_triples"] > 0
        assert result["snapshot_id"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

"""Deployment-shape test: the whole pipeline via `spark-submit --py-files`
with the library shipped as a zip (no repo on PYTHONPATH), run at two
parallelism levels — asserts identical top-k results (rank identity is
parallelism-independent) and that the packaged artifact is self-contained."""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = "/root/repo"


def _spark_submit() -> str:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("spark-submit not found")


def test_spark_submit_pyfiles_two_levels(tmp_path):
    zip_path = (
        subprocess.check_output(
            [sys.executable, f"{ROOT}/tools/package_pyfiles.py", str(tmp_path / "jassv2_spark.zip")]
        )
        .decode()
        .strip()
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # library must come from --py-files only
    outs = {}
    for cores in (2, 8):
        raw = subprocess.check_output(
            [
                _spark_submit(),
                "--master",
                f"local[{cores}]",
                "--driver-memory",
                "4g",
                "--py-files",
                zip_path,
                f"{ROOT}/tools/submit_job.py",
                "--sf-dir",
                "/root/testdata/sf0.001",
                "--n-queries",
                "30",
            ],
            env=env,
            cwd=str(tmp_path),  # NOT the repo: proves the zip is self-contained
            stderr=subprocess.DEVNULL,
            timeout=300,
        ).decode()
        outs[cores] = json.loads([l for l in raw.splitlines() if l.startswith("{")][-1])
    assert outs[2]["n_result_rows"] > 0
    assert outs[2]["master"] == "local[2]" and outs[8]["master"] == "local[8]"
    # rank-identical results at both cluster sizes
    assert outs[2]["result_md5"] == outs[8]["result_md5"]
    assert outs[2]["n_docs"] == outs[8]["n_docs"] == 500

"""Deployment contract: the package runs via spark-submit --py-files
from its zip alone (north rule).  The job subprocess starts in a neutral
cwd with PYTHONPATH scrubbed, so the only way `import crawler_core_spark`
can succeed is through the shipped archive."""

import os
import shutil
import subprocess
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit in PATH"
)
def test_spark_submit_pyfiles_zip_runs_crawl():
    tmp = tempfile.mkdtemp(prefix="submit-test-")
    try:
        zip_path = shutil.make_archive(
            os.path.join(tmp, "ccs"), "zip", REPO, "crawler_core_spark"
        )
        env = {
            k: v for k, v in os.environ.items() if k != "PYTHONPATH"
        }
        out = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--py-files", zip_path,
                os.path.join(REPO, "scripts", "submit_job.py"),
            ],
            cwd=tmp,
            env=env,
            capture_output=True,
            text=True,
            timeout=420,
        )
        marker = [
            ln for ln in out.stdout.splitlines() if ln.startswith("SUBMIT_OK")
        ]
        assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
        assert marker, out.stdout[-2000:]
        _, n_results, order_ok = marker[0].split()
        assert int(n_results) > 0 and order_ok == "True"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

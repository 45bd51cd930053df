"""North-rule shipping form: the crawl job must run via
``spark-submit --py-files frontier_engine.zip`` with the engine imported
from the zip (NOT from the repo working tree)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_crawl(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles import build

    from frontier_engine import fixtures

    paths = fixtures.corpus("mini")  # pre-generate with the normal import
    zip_path = build(str(tmp_path / "frontier_engine.zip"))

    # run the job from a directory that does NOT contain the package, so
    # the only way `import frontier_engine` resolves is the --py-files zip
    job_dir = tmp_path / "jobsite"
    job_dir.mkdir()
    shutil.copy(os.path.join(REPO, "jobs", "crawl.py"), job_dir / "crawl.py")

    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--py-files", zip_path,
            str(job_dir / "crawl.py"),
            "--pages", paths["pages"], "--seeds", paths["seeds"],
            "--robots", paths["robots"],
            "--warehouse", str(tmp_path / "wh"),
            "--max-epochs", "2",
        ],
        capture_output=True, text=True, env=env, cwd=str(job_dir), timeout=600,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    summary = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["epochs_run"] == 2 and summary["total_drained"] > 0

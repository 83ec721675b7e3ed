"""spark-submit --py-files on a REAL multi-executor cluster (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

``local-cluster[2,2,1024]`` launches two separate executor JVMs (own
Python worker pools, real serialization/broadcast boundaries — unlike
local[N] threads). The package ships ONLY via the --py-files zip:
PYTHONPATH is stripped and cwd is neutral, so a packaging regression
(module not in the zip, driver-only path assumption, non-picklable
closure) fails loudly here. --verify-oracle replays the serial
reference-semantics oracle and asserts crawl-order + seen-set parity
(reference distributed.py:42-66 master/slave dispatch semantics).
"""

import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed")
def test_spark_submit_local_cluster_parity(tmp_path):
    zip_path = tmp_path / "etlpy_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        pkg = os.path.join(REPO, "etlpy_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    sys.path.insert(0, REPO)
    from etlpy_spark.sources.synthetic_web import WebConfig, seed_urls

    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text(
        "\n".join(seed_urls(WebConfig(n_hosts=8, politeness_budget=4), n_per_host=2))
    )

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,2,1024]",
            "--py-files", str(zip_path),
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.session.timeZone=UTC",
            os.path.join(REPO, "tools", "submit_crawl.py"),
            "--workdir", str(tmp_path / "crawl"),
            "--seeds-file", str(seeds_file),
            "--rounds", "1", "--hosts", "8", "--budget", "4", "--shards", "4",
            "--verify-oracle",
        ],
        cwd=str(tmp_path),  # neutral cwd: repo not importable implicitly
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "PARITY OK" in out.stdout, out.stdout

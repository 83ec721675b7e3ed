"""Executor-side external writes are retry/speculation-safe (round-2
verdict item #1): a task that fails MID-WRITE — after part of its output
already landed — is retried by Spark, and the final tables still match the
serial reference-semantics oracle bitwise: no duplicated seen/log/image
rows, no stray part files in the manifest.

Mechanism under test (frontier.py / catalog.py):
  - seen + crawl-log writers: one deterministic ``part-{pid:05d}.parquet``
    per task via tmp + atomic ``os.replace`` — a retry replaces its own
    identical row set;
  - image writer: CHUNK-bounded files in a private attempt dir under
    ``<data>.inprogress/``, atomically renamed to ``part-{pid:05d}/`` as
    the task's last step (first rename wins); ``commit_external`` sweeps
    in-progress leftovers and rejects duplicate partition outputs.

The failure is injected by ``frontier._fail_once`` (ETLPY_FAIL_ONCE_DIR):
partition 0 of the seen write raises once, and partition 0 of the image
write raises once AFTER its first chunk file landed — so the retry must
supersede a partially-written attempt. The crawl runs in a subprocess on
``local[4,2]`` (maxFailures=2; the shared test session's local[4] would
abort the job on the first failure).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_injected_task_failures_keep_crawl_parity(tmp_path):
    sys.path.insert(0, REPO)
    from etlpy_spark.sources.synthetic_web import WebConfig, seed_urls

    web = WebConfig(n_hosts=8, politeness_budget=4)
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("\n".join(seed_urls(web, n_per_host=2)))
    fail_dir = tmp_path / "faults"
    fail_dir.mkdir()
    workdir = tmp_path / "crawl"

    env = {**os.environ, "ETLPY_FAIL_ONCE_DIR": str(fail_dir)}
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "submit_crawl.py"),
            "--master", "local[4,2]",
            "--workdir", str(workdir),
            "--seeds-file", str(seeds_file),
            "--rounds", "2", "--hosts", "8", "--budget", "4", "--shards", "4",
            "--buckets", "4",
            "--verify-oracle",
        ],
        env=env, capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert "PARITY OK" in out.stdout, out.stdout

    # the injected failures actually fired (one per tagged write stage)
    fired = sorted(os.listdir(fail_dir))
    assert "seen-failed" in fired and "images-failed" in fired, fired

    # no in-progress attempt dirs or tmp files survive into the table
    for root, dirs, files in os.walk(workdir):
        assert not any(d.endswith(".inprogress") for d in dirs), (root, dirs)
        assert not any(f.startswith(".tmp-") for f in files), (root, files)

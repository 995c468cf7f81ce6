"""Deployment surface (north rule: runs via spark-submit --py-files).

Packages crawl4ai_spark into a zip from the working tree, then runs
`scripts/submit_demo.sh` — which submits scripts/submit_crawl.py via
spark-submit with the package shipped ONLY on --py-files and the
driver cwd set to a temp dir, so any repo-relative import fails.
Pins that the packaged job actually crawls and emits interleaved
span documents."""

from __future__ import annotations

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_crawl():
    out = subprocess.run(
        [os.path.join(REPO, "scripts", "submit_demo.sh"), "3000", "local[4]"],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["master"] == "local[4]"
    assert res["pages_crawled"] > 1000
    assert res["supersteps"] >= 2
    # interleaved span docs made it through the packaged pipeline
    assert res["sample_docs"] and res["sample_docs"][0]["spans"]
    kinds = {k for d in res["sample_docs"] for k, _ in d["spans"]}
    assert kinds <= {"text", "media"} and "text" in kinds

"""Localhost stress harness (scripts/stress_bench): the generated
site is deterministic and reference-shaped, the in-process server
serves it, and one mini tier runs the real-socket fetch→extract path
end-to-end with full extraction coverage."""

import json
import os
import subprocess
import sys

from scripts.stress_bench import generate_site


def test_site_generator_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    generate_site(str(a), 5)
    generate_site(str(b), 5)
    for name in ["index.html"] + [f"page_{i}.html" for i in range(5)]:
        assert (a / name).read_text() == (b / name).read_text()
    page = (a / "page_0.html").read_text()
    # reference page shape: title, h1, 5 paragraphs, 3 images
    assert page.count("<p>") == 5 and page.count("<img") == 3
    assert "<title>Test Page 0</title>" in page
    index = (a / "index.html").read_text()
    assert index.count("<a href=") == 5


def test_mini_tier_end_to_end():
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "scripts/stress_bench.py", "--tiers", "quick",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    data = json.loads(out.stdout.strip().splitlines()[-1])
    r = data["tiers"]["quick"]
    assert r["ok"] == 50 and r["extracted"] == 50
    assert r["spans"] == 50 * 9  # h1 + 5 paragraphs + 3 images per page
    assert r["urls_per_sec"] > 0

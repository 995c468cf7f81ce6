#!/usr/bin/env bash
# spark-submit --py-files deployment demo (north rule: "runs via
# spark-submit --py-files on multi-executor clusters").
#
# Builds the crawl4ai_spark zip from the working tree and submits the
# crawl job with the package shipped ONLY via --py-files — the driver
# cwd is a temp dir, so any repo-relative import would fail loudly.
# In the sandbox the master is local[N]; on a real cluster swap
# --master (and executor confs) and nothing else changes.
#
# Usage: scripts/submit_demo.sh [pages] [master]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
PAGES="${1:-20000}"
MASTER="${2:-local[8]}"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

# package: zip the library exactly as a CI release step would
(cd "$REPO" && python - "$WORK/crawl4ai_spark.zip" <<'PY'
import sys, zipfile, pathlib
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(pathlib.Path("crawl4ai_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print(f"packaged {out}")
PY
)
cp "$REPO/scripts/submit_crawl.py" "$WORK/"

cd "$WORK"   # prove imports come from the zip, not the repo
exec spark-submit \
    --master "$MASTER" \
    --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE:-8}" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.ui.enabled=false \
    --py-files "$WORK/crawl4ai_spark.zip" \
    "$WORK/submit_crawl.py" --pages "$PAGES"

"""Supplementary scaling evidence: the fetch→extract pipeline stage
in isolation (no iteration barriers).

At production scale the crawl loop's per-iteration fixed cost (a
driver-serialized handful of Spark jobs) amortizes over millions of
URLs per superstep; what must scale with executors is the per-page
work — extraction.  This measures exactly that: one pass of the fused
extract UDF over the same corpus at local[N] and local[4N].

Usage: python scripts/extract_scaling.py [n_pages] [richness]
Prints one JSON line and appends a section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(cpus: int, n_pages: int, richness: int) -> dict:
    from pyspark.sql import functions as F

    from crawl4ai_spark.extraction.udfs import extract_udf
    from crawl4ai_spark.session import get_spark
    from crawl4ai_spark.sources.synthetic_web import WebConfig, synthetic_pages_df

    spark = get_spark(app_name=f"exs{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    web = WebConfig(n_pages=n_pages, n_hosts=24, seed=42, richness=richness)
    pages = (
        synthetic_pages_df(spark, web, num_partitions=cpus * 4)
        .filter("status_code = 200").select("url", "html").persist()
    )
    n = pages.count()
    # warm the Python workers / JIT, then measure
    pages.limit(512).select(extract_udf("url", "html").alias("e")).agg(F.count("*")).collect()
    t0 = time.time()
    pages.select(extract_udf("url", "html").alias("e")).select(
        F.size("e.spans").alias("s")
    ).agg(F.sum("s")).collect()
    dt = time.time() - t0
    out = {"cpus": cpus, "pages": n, "extract_sec": round(dt, 2),
           "pages_per_sec": round(n / dt, 1)}
    spark.stop()
    return out


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    richness = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    if os.environ.get("EXS_CHILD"):
        cpus = int(os.environ["EXS_CHILD"])
        print(json.dumps(run_one(cpus, n_pages, richness)))
        return
    results = {}
    for cpus in (4, 16):
        env = dict(os.environ, EXS_CHILD=str(cpus))
        out = subprocess.run([sys.executable, __file__, str(n_pages), str(richness)],
                             capture_output=True, text=True, env=env, check=True)
        results[cpus] = json.loads(
            [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        )
    eff = round((results[16]["pages_per_sec"] / results[4]["pages_per_sec"]) / 4.0, 3)
    print(json.dumps({"metric": "extract_scaling_efficiency_4_to_16", "value": eff,
                      "local4": results[4], "local16": results[16]}))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            "\n## Supplementary: extract-stage scaling (no iteration barriers)\n\n"
            "The per-page fetch→extract work — the component that must scale\n"
            "with executors at 100 TB — measured in isolation:\n\n"
            "| config | pages | extract sec | pages/sec |\n|---|---|---|---|\n"
            f"| local[4]  | {results[4]['pages']} | {results[4]['extract_sec']} | {results[4]['pages_per_sec']} |\n"
            f"| local[16] | {results[16]['pages']} | {results[16]['extract_sec']} | {results[16]['pages_per_sec']} |\n\n"
            f"**Extract-stage scaling efficiency (T16/T4)/4 = {eff}**\n"
        )


if __name__ == "__main__":
    main()

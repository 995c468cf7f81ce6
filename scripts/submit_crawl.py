"""spark-submit entry point for the crawl engine.

North-rule deployment surface: the engine ships to a cluster as a
zipped package on --py-files and this script is the driver program —

    spark-submit --master <cluster> \
        --py-files crawl4ai_spark.zip \
        scripts/submit_crawl.py --pages 60000 --seeds 512

Nothing here imports test fixtures or repo-relative paths: the
`crawl4ai_spark` package must resolve from the --py-files zip (or an
installed wheel), exactly as it would on a 1000-executor cluster.  In
the sandbox `scripts/submit_demo.sh` runs this under local[N] as the
stand-in for a multi-executor deployment; on a real cluster only
--master and --conf change — the job code does not.

The job: build the deterministic synthetic web (same generator the
bench and parity suites use), run the full crawl engine (admission →
fetch join → fused extract UDF → link discovery → frontier merge),
and print ONE JSON line with pages crawled, supersteps, and
throughput, plus a sample of the interleaved span output so the
driver log shows real extracted documents.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20000)
    ap.add_argument("--seeds", type=int, default=256)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--mode", default="best_first",
                    choices=["best_first", "bfs", "dfs"])
    ap.add_argument("--checkpoint-dir", default=None,
                    help="optional SnapshotStore dir (resumable run)")
    args = ap.parse_args()

    # Imports AFTER arg parsing so a --help never needs the zip.
    # On a cluster these resolve from --py-files.
    from pyspark.sql import SparkSession

    from crawl4ai_spark.plans.config import CrawlConfig
    from crawl4ai_spark.plans.crawl import CrawlEngine
    from crawl4ai_spark.plans.state import SnapshotStore
    from crawl4ai_spark.sources.synthetic_web import (
        WebConfig, robots_rows, seed_urls, synthetic_pages_df,
    )

    # getOrCreate picks up the spark-submit --master/--conf; the
    # session factory defaults (session.py) apply only when a conf is
    # unset, so cluster submissions fully control the runtime.
    spark = SparkSession.builder.appName("crawl4ai_spark_submit").getOrCreate()
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    web = WebConfig(n_pages=args.pages, n_hosts=max(8, args.pages // 2500),
                    seed=args.seed)
    pages = synthetic_pages_df(spark, web, num_partitions=n_parts * 2).persist()
    pages.count()
    robots = spark.createDataFrame(robots_rows(web))

    store = SnapshotStore(args.checkpoint_dir) if args.checkpoint_dir else None
    cfg = CrawlConfig(
        mode=args.mode, max_depth=64, max_pages=args.pages,
        base_budget=args.pages, global_budget=max(1024, args.pages),
        max_retries=0, max_iterations=64, track_host_state=False,
    )
    t0 = time.time()
    res = CrawlEngine(spark, cfg, pages, robots, store=store).run(
        seed_urls(web, n_seeds=args.seeds)
    )
    crawl_sec = time.time() - t0

    sample = [
        {"doc_id": r["doc_id"],
         "spans": [(s["kind"], (s["text"] or "")[:40]) for s in r["spans"][:4]]}
        for r in res.docs.limit(2).collect()
    ]
    print(json.dumps({
        "pages_crawled": res.state.pages_crawled,
        "supersteps": res.state.iteration,
        "crawl_sec": round(crawl_sec, 2),
        "urls_per_sec": round(res.state.pages_crawled / crawl_sec, 1)
        if crawl_sec > 0 else 0.0,
        "frontier_rows": res.frontier.count(),
        "sample_docs": sample,
        "master": spark.sparkContext.master,
        "checkpointed": store is not None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

"""Supplementary scaling evidence: the near-dup curation cascade
(minhash → LSH banding → exact-Jaccard verify) at two parallelism
levels — the same N vs 4N protocol as the crawl-loop record, applied
to the training-data side of the engine.

The corpus is synthesized deterministically IN SPARK (Catalyst
expressions only — word choices are xxhash64-derived from the row id,
every 10th doc is a near-dup of its decade head), so both legs hash
the identical document set and the measured window contains the full
cascade: shingle explode, 8 min-agg permutations, band self-join,
candidate-bounded verification.

Usage: python scripts/dedup_scaling.py [n_docs] [words_per_doc]
Prints one JSON line and appends a section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [
    "spark", "query", "table", "scan", "join", "merge", "sort", "hash",
    "batch", "stream", "window", "filter", "group", "order", "value",
    "column", "vector", "shuffle", "slow", "fast", "small", "big",
    "the", "a", "line", "row", "data", "key", "part", "agg", "customer", "frontier",
]


def synth_docs(spark, n_docs: int, words: int, cpus: int):
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # every 10th doc copies its decade head's words (id -> id - 9) and
    # appends a distinct tail word: a planted near-dup, not an exact dup
    head = F.when(F.col("doc_id") % 10 == 9, F.col("doc_id") - 9).otherwise(F.col("doc_id"))
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(words - 1)),
            lambda j: F.element_at(
                vocab,
                (F.pmod(
                    F.xxhash64(F.concat(head.cast("string"), F.lit("_"), j.cast("string"))),
                    F.lit(len(VOCAB)),
                ) + 1).cast("int"),
            ),
        ),
        " ",
    )
    text = F.when(
        F.col("doc_id") % 10 == 9, F.concat(body, F.lit(" nearduplicate"))
    ).otherwise(body)
    return base.repartition(cpus * 4, "doc_id").select("doc_id", text.alias("text"))


def run_one(cpus: int, n_docs: int, words: int) -> dict:
    from crawl4ai_spark.operators.dedup import (
        jaccard_pairs, lsh_candidate_pairs, minhash_signature,
    )
    from crawl4ai_spark.session import get_spark

    spark = get_spark(app_name=f"dds{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 4)
    docs = synth_docs(spark, n_docs, words, cpus).persist()
    n = docs.count()

    def cascade():
        sig = minhash_signature(docs, "text", "doc_id", num_perm=8, shingle_n=3)
        cand = lsh_candidate_pairs(sig, "doc_id", bands=4, rows_per_band=2)
        return jaccard_pairs(docs, "text", "doc_id", shingle_n=3,
                             threshold=0.5, candidates=cand)

    # warm JIT / codegen off the clock on a slice, then measure the full run
    cascade().limit(16).count()
    t0 = time.time()
    n_pairs = cascade().count()
    dt = time.time() - t0
    from bench import _host_probe

    out = {"cpus": cpus, "docs": n, "pairs": n_pairs,
           "cascade_sec": round(dt, 2), "docs_per_sec": round(n / dt, 1),
           "host_probe_mops": _host_probe(16)}
    spark.stop()
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    words = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    if os.environ.get("DDS_CHILD"):
        print(json.dumps(run_one(int(os.environ["DDS_CHILD"]), n_docs, words)))
        return
    results = {}
    for cpus in (4, 16):
        env = dict(os.environ, DDS_CHILD=str(cpus))
        out = subprocess.run([sys.executable, __file__, str(n_docs), str(words)],
                             capture_output=True, text=True, env=env, check=True)
        results[cpus] = json.loads(
            [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        )
    eff = round((results[16]["docs_per_sec"] / results[4]["docs_per_sec"]) / 4.0, 3)
    # probe-normalized: divide each leg's throughput by its own host
    # probe, cancelling ambient host drift between the legs (the same
    # normalization the crawl-loop record uses)
    eff_norm = None
    p4, p16 = results[4]["host_probe_mops"], results[16]["host_probe_mops"]
    if p4 and p16:
        eff_norm = round(
            (results[16]["docs_per_sec"] / p16) / (results[4]["docs_per_sec"] / p4) / 4.0, 3
        )
    print(json.dumps({"metric": "dedup_cascade_scaling_efficiency_4_to_16",
                      "value": eff, "probe_normalized": eff_norm,
                      "local4": results[4], "local16": results[16]}))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            "\n## Supplementary: dedup-cascade scaling (curation path)\n\n"
            "The minhash → LSH → exact-Jaccard near-dup cascade over a\n"
            "deterministic synthetic corpus (planted near-dups), same N vs 4N\n"
            "protocol; per-leg host probes shown for attribution:\n\n"
            "| config | docs | pairs | cascade sec | docs/sec | probe Miter/s |\n"
            "|---|---|---|---|---|---|\n"
            f"| local[4]  | {results[4]['docs']} | {results[4]['pairs']} | {results[4]['cascade_sec']} | {results[4]['docs_per_sec']} | {results[4]['host_probe_mops']} |\n"
            f"| local[16] | {results[16]['docs']} | {results[16]['pairs']} | {results[16]['cascade_sec']} | {results[16]['docs_per_sec']} | {results[16]['host_probe_mops']} |\n\n"
            f"**Dedup-cascade scaling efficiency (T16/T4)/4 = {eff}**"
            + (f" (probe-normalized: **{eff_norm}**)\n" if eff_norm is not None else "\n")
        )


if __name__ == "__main__":
    main()

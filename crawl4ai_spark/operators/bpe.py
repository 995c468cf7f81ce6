"""Distributed BPE tokenizer fitting (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

Fitting a tokenizer is a standard step of a training-data pipeline,
and its distributed form has a specific scale shape the naive
corpus-pass version misses: after ONE corpus pass that builds the
word-frequency table (groupBy(word) — the only time the 100 TB corpus
flows), every merge iteration runs over that table alone, which is
VOCABULARY-bounded (10^7-10^8 rows at web scale, ~fits one executor's
scan in seconds).  Each iteration is:

  1. adjacent-pair counts: one map-side explode of the symbol arrays
     weighted by word count + one groupBy((a, b)) sum — combine-
     friendly, keys are symbol pairs;
  2. argmax pair: a 1-row collect (model-sized, the kmeans_fit
     precedent — the driver holds only the merge list);
  3. apply the merge: a map-only left-fold over each word's symbol
     array (no shuffle), with the table localCheckpoint'd so the
     per-iteration expression tree stays flat.

The greedy left-fold merge is exactly BPE's non-overlapping left-to-
right replacement: once a pair merges, the merged symbol sits at the
fold accumulator's tail and cannot re-consume its own right half
("aaaa" + merge(a,a) → [aa, aa], not [aa, a, a]).

`bpe_encode` applies a learned merge list to documents via an
Arrow-batched pandas UDF — the merge list is a closure constant
(broadcast with the serialized UDF), the corpus side is map-only.
Per-row Python never appears; encoding at 100 TB would export the
merges to a real tokenizer runtime, this is the in-plan equivalent.

Reference parity note: the reference repo (crawl4ai) has no
tokenizer fitting — this is beyond-reference training-data surface
(SURVEY §2 addendum), like dedup/LM/DSIR.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.operators.dedup import normalize_text

__all__ = [
    "word_freq_table",
    "symbolize",
    "pair_counts",
    "merge_pair",
    "bpe_fit",
    "bpe_encode",
]

END = "</w>"


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): the corpus's distinct words with counts — the ONE
    corpus-wide pass; everything after runs on this table."""
    words = F.filter(F.split(normalize_text(text_col), " "), lambda w: w != F.lit(""))
    return (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def symbolize(word, end_mark: str = END) -> Column:
    """Initial symbol array: the word's characters + an end-of-word
    marker (so merges can learn suffixes without crossing words)."""
    c = F.col(word) if isinstance(word, str) else word
    return F.concat(F.split(c, ""), F.array(F.lit(end_mark)))


def pair_counts(wf: DataFrame, sym_col: str = "syms",
                count_col: str = "n") -> DataFrame:
    """(a, b, count): adjacent symbol pairs over the word table,
    weighted by word frequency.  Map-side explode + one keyed sum."""
    s = F.col(sym_col)
    pairs = F.when(F.size(s) < 2, F.array().cast("array<struct<a:string,b:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.struct(
                F.element_at(s, i).alias("a"), F.element_at(s, i + 1).alias("b")
            ),
        )
    )
    return (
        wf.select(F.col(count_col).alias("_n"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("_n").alias("count"))
    )


def merge_pair(syms: Column, a: str, b: str) -> Column:
    """Replace every non-overlapping left-to-right occurrence of the
    adjacent pair (a, b) with the merged symbol a+b — one fold, no
    shuffle."""
    merged = F.lit(a + b)
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_fit(df: DataFrame, n_merges: int, text_col: str = "text",
            min_count: int = 2) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges from the corpus.  Returns the merge
    list [(a, b, count), ...] in learned order.  Ties in pair count
    break lexicographically on (a, b) so the fit is deterministic
    across partitionings and engines.  Stops early when the best
    remaining pair's count falls below `min_count`."""
    wf = word_freq_table(df, text_col).withColumn("syms", symbolize("word"))
    wf = wf.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            pair_counts(wf)
            .orderBy(F.desc("count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["count"] < min_count:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["count"])
        merges.append((a, b, c))
        wf = wf.withColumn("syms", merge_pair(F.col("syms"), a, b))
        # vocabulary-bounded table: materialize per iteration so each
        # fold runs over data, not an n-merges-deep expression tree
        wf = wf.localCheckpoint(eager=True)
    return merges


def _apply_merges_py(tokens: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python merge application (one word), in learned order."""
    for a, b in merges:
        out: list[str] = []
        for t in tokens:
            if out and out[-1] == a and t == b:
                out[-1] = a + b
            else:
                out.append(t)
        tokens = out
    return tokens


def bpe_encode(df: DataFrame, merges: list[tuple[str, str, int]] | list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id",
               end_mark: str = END) -> DataFrame:
    """(id, tokens, n_tokens): encode documents with a learned merge
    list via one Arrow-batched pandas UDF (the merge list ships as a
    closure constant; the corpus side is map-only, no shuffle)."""
    from pyspark.sql.functions import pandas_udf

    ms = [(m[0], m[1]) for m in merges]

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        import re

        out = []
        for t in texts:
            toks: list[str] = []
            for w in re.sub(r"\s+", " ", (t or "").lower().strip()).split(" "):
                if not w:
                    continue
                toks.extend(_apply_merges_py(list(w) + [end_mark], ms))
            out.append(toks)
        return pd.Series(out)

    return df.select(
        F.col(id_col),
        encode(F.col(text_col)).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))

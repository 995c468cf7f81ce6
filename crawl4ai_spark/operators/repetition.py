"""Repetition + rule-based quality signals for training-data curation —
the Gopher repetition/quality rules and the C4 line/document rules,
re-expressed as native Catalyst column expressions.

Semantics follow the published recipes:

- Gopher (Rae et al. 2021, "Scaling Language Models: Methods, Analysis
  & Insights from Training Gopher", App. A1.1): duplicate-line /
  duplicate-line-character fractions, top n-gram character fraction,
  duplicate n-gram character fraction, and the document-quality rule
  set (word count, mean word length, symbol ratio, bullet/ellipsis
  line fractions, alphabetic-word fraction, stop-word presence).
- C4 (Raffel et al. 2020, "Exploring the Limits of Transfer Learning",
  §2.2): keep lines ending in terminal punctuation with ≥3 words and
  no "javascript"; drop documents with <5 sentences, "lorem ipsum",
  or a curly brace.

Where the papers leave counting details open we pin one deterministic
choice (documented per function) so the Spark plan and the DuckDB
oracle agree bit-for-bit:

- "duplicate" occurrences are occurrences beyond the first of an
  identical element — duplicates = n − n_distinct (the standard
  open-source reading, e.g. DataTrove's GopherRepetitionFilter).
- n-gram character length counts only word characters (the joined
  n-gram's length minus its n−1 separator spaces).
- duplicate-n-gram char fraction sums word-chars of every beyond-first
  occurrence; overlapping n-grams may re-count characters, so the
  value is an upper bound and can exceed 1 on degenerate text (the
  thresholded filters care about the ≤0.15 region, where it is tight).
- the "top" n-gram is the one with the highest count, ties broken by
  larger word-char length (further ties don't change the fraction).

Everything is a per-row array fold over the already-split word/line
arrays: zero Python, zero shuffle, column-pruned — a projection that
composes with the other text operators in one pass over a 100 TB scan.
Scale note: work per row is O(words·log words) for the sort-based
folds; no state leaves the row, so the operator is embarrassingly
parallel and skew-free regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "split_lines",
    "split_words",
    "dup_line_stats",
    "top_ngram_char_fraction",
    "dup_ngram_char_fraction",
    "gopher_repetition",
    "gopher_quality_flags",
    "c4_line_keep",
    "c4_clean_text",
    "c4_doc_flags",
    "cross_doc_ngram_dup",
    "dedup_paragraphs",
    "GOPHER_STOPWORDS",
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def split_lines(text) -> Column:
    """Non-blank lines (newline-split, trimmed-empty removed)."""
    return F.filter(F.split(_col(text), "\n"), lambda l: F.trim(l) != F.lit(""))


def split_words(text) -> Column:
    """Non-empty whitespace tokens."""
    return F.filter(F.split(F.trim(_col(text)), r"\s+"), lambda w: w != F.lit(""))


# ── Gopher repetition signals ────────────────────────────────────────

def _dup_fold(sorted_arr: Column, weight) -> Column:
    """Linear fold over a SORTED array summing `weight(x)` for every
    occurrence equal to its predecessor — i.e. the total weight of
    duplicate (beyond-first) occurrences.  One pass, struct accumulator,
    no outer-array references (safe from re-evaluation)."""
    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).alias("dup"))
    return F.aggregate(
        sorted_arr,
        init,
        lambda a, x: F.struct(
            x.alias("prev"),
            (a["dup"] + F.when(x == a["prev"], weight(x)).otherwise(F.lit(0))).alias("dup"),
        ),
        lambda a: a["dup"],
    )


def dup_line_stats(text) -> Column:
    """struct<n_lines, dup_line_frac, dup_line_char_frac>.

    dup_line_frac = duplicate line occurrences / lines
    dup_line_char_frac = characters in duplicate occurrences / line chars
    (Gopher A1.1 'duplicate line fraction' pair.)"""
    lines = split_lines(text)
    n = F.size(lines)
    srt = F.array_sort(lines)
    dup_n = n - F.size(F.array_distinct(lines))
    dup_chars = _dup_fold(srt, lambda x: F.length(x))
    tot_chars = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    return F.struct(
        n.alias("n_lines"),
        F.when(n > 0, dup_n.cast("double") / n).otherwise(F.lit(0.0)).alias("dup_line_frac"),
        F.when(tot_chars > 0, dup_chars.cast("double") / tot_chars)
        .otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
    )


def _ngrams(words: Column, n: int) -> Column:
    """Word n-grams joined by single spaces; empty array when the
    document has fewer than n words (guarded — Spark's sequence()
    descends when start>stop, which would fabricate indexes)."""
    m = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), m - (n - 1)),
        lambda j: F.concat_ws(" ", F.slice(words, j, n)),
    )
    return F.when(m >= n, grams).otherwise(F.array().cast("array<string>"))


def _word_chars(words: Column) -> Column:
    return F.aggregate(words, F.lit(0), lambda a, x: a + F.length(x))


def top_ngram_char_fraction(text, n: int) -> Column:
    """Fraction of word characters covered by the most frequent word
    n-gram: count·char_len(top gram)/total word chars, 0 when the top
    count is <2 (a gram seen once covers nothing 'repetitive').
    Single sorted-scan fold; ties on count take the longer gram."""
    words = split_words(text)
    srt = F.array_sort(_ngrams(words, n))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"), F.lit(0).alias("run"),
        F.lit(0).alias("best"), F.lit(0).alias("bestchars"),
    )
    sep = F.lit(n - 1)  # concat_ws added n-1 single spaces

    def merge(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        chars = F.length(x) - sep
        better = (run > a["best"]) | ((run == a["best"]) & (chars > a["bestchars"]))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(a["best"]).alias("best"),
            F.when(better, chars).otherwise(a["bestchars"]).alias("bestchars"),
        )

    top = F.aggregate(
        srt, init, merge,
        lambda a: F.when(a["best"] >= 2, a["best"] * a["bestchars"]).otherwise(F.lit(0)),
    )
    tot = _word_chars(words)
    return F.when(tot > 0, top.cast("double") / tot).otherwise(F.lit(0.0))


def dup_ngram_char_fraction(text, n: int) -> Column:
    """Fraction of word characters in duplicate (beyond-first) word
    n-gram occurrences — Gopher's 'duplicate n-gram character
    fraction' in its standard occurrence-weighted reading; overlapping
    grams may re-count characters (documented upper bound)."""
    words = split_words(text)
    srt = F.array_sort(_ngrams(words, n))
    dup = _dup_fold(srt, lambda x: F.length(x) - F.lit(n - 1))
    tot = _word_chars(words)
    return F.when(tot > 0, dup.cast("double") / tot).otherwise(F.lit(0.0))


def gopher_repetition(text) -> Column:
    """The Gopher repetition signal block as one struct column —
    composes into a single projection with the other text operators."""
    ls = dup_line_stats(text)
    return F.struct(
        ls["n_lines"].alias("n_lines"),
        ls["dup_line_frac"].alias("dup_line_frac"),
        ls["dup_line_char_frac"].alias("dup_line_char_frac"),
        top_ngram_char_fraction(text, 2).alias("top_2gram_char_frac"),
        top_ngram_char_fraction(text, 3).alias("top_3gram_char_frac"),
        dup_ngram_char_fraction(text, 5).alias("dup_5gram_char_frac"),
        dup_ngram_char_fraction(text, 10).alias("dup_10gram_char_frac"),
    )


# ── Gopher document-quality rules ────────────────────────────────────

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    text,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_words: int = 2,
) -> Column:
    """struct of the Gopher quality-rule booleans plus `passes` (AND of
    all).  Thresholds default to the paper's; each rule is also exposed
    so a pipeline can report per-rule rejection counters."""
    t = _col(text)
    words = split_words(t)
    n_words = F.size(words)
    mwl = F.when(n_words > 0, _word_chars(words).cast("double") / n_words).otherwise(F.lit(0.0))
    # symbols: '#' occurrences + '...'/'…' runs (paper's hash+ellipsis rule)
    n_sym = (
        F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
        + F.regexp_count(t, F.lit(r"\.\.\.|…"))
    )
    lines = split_lines(t)
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•‣▪]"))).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double") / n_words,
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, lambda w: F.lower(w))),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_mwl = (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len)
    ok_sym = F.when(n_words > 0, n_sym.cast("double") / n_words <= max_symbol_word_ratio).otherwise(F.lit(False))
    ok_bullet = bullet_frac <= max_bullet_line_frac
    ok_ellipsis = ellipsis_frac <= max_ellipsis_line_frac
    ok_alpha = alpha_frac >= min_alpha_word_frac
    ok_stop = stop_hits >= min_stop_words
    return F.struct(
        ok_words.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_bullet.alias("ok_bullet_lines"),
        ok_ellipsis.alias("ok_ellipsis_lines"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stop_words"),
        (ok_words & ok_mwl & ok_sym & ok_bullet & ok_ellipsis & ok_alpha & ok_stop).alias("passes"),
    )


# ── C4 rules ─────────────────────────────────────────────────────────

_C4_TERMINAL = r"""[.!?"”»]$"""


def c4_line_keep(line: Column) -> Column:
    """C4 line rule: ends in terminal punctuation, ≥3 words, and does
    not mention 'javascript' (case-insensitive)."""
    t = F.trim(line)
    return (
        t.rlike(_C4_TERMINAL)
        & (F.size(F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))) >= 3)
        & ~F.lower(t).contains("javascript")
    )


def c4_clean_text(text) -> Column:
    """Document text with only the C4-kept lines, newline-joined."""
    kept = F.filter(split_lines(text), c4_line_keep)
    return F.array_join(kept, "\n")


def c4_doc_flags(text, min_sentences: int = 5) -> Column:
    """struct<n_lines, n_kept_lines, n_sentences, has_lorem_ipsum,
    has_brace, keep_doc> — the C4 document-level gate over the line
    gate's survivors.  Sentences are counted as terminal-punctuation
    marks in the kept text (the standard proxy)."""
    t = _col(text)
    lines = split_lines(t)
    kept = F.filter(lines, c4_line_keep)
    kept_text = F.array_join(kept, "\n")
    n_sent = F.regexp_count(kept_text, F.lit(r"[.!?]"))
    lorem = F.lower(t).contains("lorem ipsum")
    brace = t.contains("{")
    return F.struct(
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        lorem.alias("has_lorem_ipsum"),
        brace.alias("has_brace"),
        ((n_sent >= min_sentences) & ~lorem & ~brace).alias("keep_doc"),
    )


# ── cross-document duplicate n-gram spans ────────────────────────────

def cross_doc_ngram_dup(
    docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-wide duplicated-span signal: which of a document's word
    n-grams also occur in ≥`min_docs`−1 OTHER documents (the 13-gram
    convention from Lee et al. 2022, 'Deduplicating Training Data
    Makes Language Models Better' / the CCNet-style shared-span
    filters).  Per input doc: (id, n_grams, n_dup_grams,
    dup_gram_char_frac) where the fraction is dup-gram word-chars over
    the doc's word-chars (occurrence-weighted; same convention as
    `dup_ngram_char_fraction`).

    Scale shape: one explode to (doc, gram-hash) — linear in corpus
    tokens — then two partial-agg groupBys ((id, hash) then hash) and
    one hash-keyed join back.  Grams travel as 8-byte xxhash64 keys,
    never as strings, so shuffle bytes ≈ 24/row; gram-frequency skew
    is absorbed by the (id, hash) pre-aggregation (a boilerplate gram
    repeated across 10^9 docs is one row per doc entering the
    doc-frequency agg, which map-side combines).
    """
    from crawl4ai_spark.operators.dedup import normalize_text

    words = F.filter(F.split(normalize_text(text_col), " "), lambda w: w != F.lit(""))
    base = docs.select(
        F.col(id_col).alias("_id"),
        words.alias("_ws"),
    ).select(
        "_id",
        F.aggregate("_ws", F.lit(0), lambda a, x: a + F.length(x)).alias("_wchars"),
        F.explode_outer(_ngrams(F.col("_ws"), n)).alias("_gram"),
    )
    # xxhash64(NULL) returns the seed, not NULL — guard the gram-less row
    gram_hash = F.when(F.col("_gram").isNotNull(), F.xxhash64("_gram"))
    per_doc_gram = base.groupBy("_id", gram_hash.alias("_h")).agg(
        F.count("_gram").alias("_cnt"),
        F.max(F.length("_gram") - (n - 1)).alias("_chars"),
        F.max("_wchars").alias("_wchars"),
    )
    doc_freq = per_doc_gram.filter(F.col("_h").isNotNull()).groupBy("_h").agg(
        F.count("*").alias("_ndocs")
    )
    joined = per_doc_gram.join(doc_freq, "_h", "left")
    dup = F.col("_ndocs") >= min_docs
    out = joined.groupBy("_id").agg(
        F.sum(F.when(F.col("_h").isNotNull(), F.col("_cnt")).otherwise(F.lit(0)))
        .cast("int").alias("n_grams"),
        F.sum(F.when(dup, F.col("_cnt")).otherwise(F.lit(0))).cast("int").alias("n_dup_grams"),
        F.sum(F.when(dup, F.col("_cnt") * F.col("_chars")).otherwise(F.lit(0))).alias("_dupch"),
        F.max("_wchars").alias("_wchars"),
    )
    return out.select(
        F.col("_id").alias(id_col),
        "n_grams",
        "n_dup_grams",
        F.when(F.col("_wchars") > 0, F.col("_dupch").cast("double") / F.col("_wchars"))
        .otherwise(F.lit(0.0)).alias("dup_gram_char_frac"),
    )


# ── corpus-wide paragraph dedup ──────────────────────────────────────

def dedup_paragraphs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide exact paragraph dedup (the C4 span-dedup idea at
    paragraph granularity): every normalized paragraph is kept only at
    its first occurrence across the whole corpus, first = lowest
    (id, position).  Returns one row per input doc:
    (id, n_paras, n_kept, text_dedup).

    Scale shape: explode → ONE hash-keyed window (partitioned by the
    16-byte paragraph hash — fine-grained keys, no skew pileup: even a
    boilerplate paragraph repeated 10^9 times partitions by ITS hash
    alone and the window only row_numbers within it) → one groupBy(id)
    to reassemble.  Two keyed shuffles total, both on high-cardinality
    keys; nothing collects to the driver."""
    from pyspark.sql import Window

    paras = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode_outer(split_lines(text_col)).alias("_pos", "_para"),
    )
    # paragraph-less docs ride through as a (null, null) row; give each
    # its OWN window key so a billion empty docs never share a partition
    norm = F.coalesce(
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("_para"))), r"\s+", " ")),
        F.concat(F.lit("empty:"), F.col("_id").cast("string")),
    )
    w = Window.partitionBy("_norm").orderBy("_id", "_pos")
    ranked = paras.withColumn("_norm", norm).withColumn("_rn", F.row_number().over(w))
    kept_struct = F.when((F.col("_rn") == 1) & F.col("_para").isNotNull(),
                         F.struct("_pos", "_para"))
    agg = (
        ranked.groupBy("_id")
        .agg(
            F.count("_para").alias("n_paras"),
            F.count(kept_struct).alias("n_kept"),
            F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("n_paras").cast("int").alias("n_paras"),
            F.col("n_kept").cast("int").alias("n_kept"),
            F.array_join(F.transform("_kept", lambda s: s["_para"]), "\n").alias("text_dedup"),
        )
    )
    return agg

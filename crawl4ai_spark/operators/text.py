"""Text-analysis operators for large-scale training-data pipelines —
all native Catalyst column expressions (zero Python in the hot path).

These are the per-document quality/statistics operators a 100 TB
corpus pipeline runs between crawl and training: token counting,
quality scoring, language identification, and fingerprinting.  Each
returns a Column so they compose into a single projection over the
documents scan (one pass, column-pruned).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "ws_token_count",
    "regex_token_count",
    "word_stats",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "fingerprint",
    "vocab_coverage",
    "STOPWORDS",
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def ws_token_count(text) -> Column:
    """Whitespace tokens (the fast token-count proxy)."""
    t = F.trim(_col(text))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def regex_token_count(text) -> Column:
    """BPE-ish sub-word token proxy: word pieces, numbers, and
    punctuation runs each count as one token — a deterministic stand-in
    for a real tokenizer's token count."""
    t = _col(text)
    return F.size(
        F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def word_stats(text) -> Column:
    """struct<n_words, n_chars, mean_word_len> in one pass."""
    t = _col(text)
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    n_chars = F.length(t)
    mean_len = F.when(n_words > 0,
                      F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
                      .cast("double") / n_words).otherwise(F.lit(0.0))
    return F.struct(
        n_words.alias("n_words"), n_chars.alias("n_chars"), mean_len.alias("mean_word_len")
    )


def punct_ratio(text) -> Column:
    t = _col(text)
    n = F.length(t)
    punct = n - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


# Top stopwords per language — the n-gram-free language-ID heuristic:
# count distinct-stopword hits per language, argmax wins.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "den", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour", "qui", "pas"],
    "es": ["el", "la", "los", "las", "es", "una", "por", "con", "para", "del", "como", "pero"],
}


def _words_lower(text) -> Column:
    return F.filter(
        F.split(F.lower(_col(text)), r"[^a-zA-Zà-ÿä-üá-ú]+"), lambda w: w != F.lit("")
    )


def stopword_ratio(text, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of `lang` — a standard
    quality signal (low ratio ⇒ boilerplate/navigation/code)."""
    words = _words_lower(text)
    sw = STOPWORDS[lang]
    hits = F.size(F.filter(words, lambda w: w.isin(sw)))
    n = F.size(words)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text) -> Column:
    """Composite document-quality heuristic in [0,1]:
    0.3·length-band + 0.3·stopword-band + 0.2·(1−punct-excess)
    + 0.2·word-length-band.  Deterministic, explainable, vectorized."""
    t = _col(text)
    n = F.length(t)
    length_band = F.when(n >= 200, 1.0).when(n >= 50, 0.5).otherwise(0.0)
    swr = stopword_ratio(t, "en")
    sw_band = F.when(swr >= 0.2, 1.0).when(swr >= 0.08, 0.5).otherwise(0.0)
    pr = punct_ratio(t)
    punct_band = F.greatest(F.lit(0.0), F.lit(1.0) - F.greatest(F.lit(0.0), (pr - 0.15) * 4))
    stats = word_stats(t)
    mwl = stats["mean_word_len"]
    wl_band = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.3)
    return (0.3 * length_band + 0.3 * sw_band + 0.2 * punct_band + 0.2 * wl_band)


def lang_id(text) -> Column:
    """struct<lang, hits>: language whose stopword list scores the most
    token hits; ties broken by fixed language order (en,de,fr,es);
    'und' (undetermined) when nothing hits."""
    words = _words_lower(text)
    best_lang = F.lit("und")
    best_hits = F.lit(0)

    def _hits(sw: list[str]):
        # NOTE: a 1-arg closure, NOT a 2-arg lambda with a default —
        # Spark HOF lambdas with 2 params receive (element, index).
        return F.size(F.filter(words, lambda w: w.isin(sw)))

    # iterate in reversed priority so earlier languages win ties
    for lang in reversed(list(STOPWORDS)):
        hits = _hits(STOPWORDS[lang])
        take = hits >= best_hits  # later-constructed (earlier-priority) wins ties
        best_lang, best_hits = (
            F.when(take & (hits > 0), F.lit(lang)).otherwise(best_lang),
            F.when(take, hits).otherwise(best_hits),
        )
    return F.struct(best_lang.alias("lang"), best_hits.alias("hits"))


def vocab_coverage(df, text_col: str = "text", top_k: int = 50):
    """Corpus vocabulary head: the top_k most frequent (normalized)
    words with rank and cumulative corpus coverage — the stats a
    tokenizer/vocab decision reads off a corpus.

    Shapes: one explode + one word-keyed count (map-side combined),
    then a distributed top-k (TakeOrderedAndProject — never a global
    sort of the vocab); the unpartitioned rank/cumsum window runs on
    the ≤ top_k surviving rows only, so it is bounded at any corpus
    size.  Ties break lexicographically for cross-engine determinism.
    """
    from pyspark.sql import Window

    words = F.filter(
        F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "),
        lambda w: w != F.lit(""),
    )
    counts = (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("_total"))
    topk = counts.orderBy(F.desc("cnt"), "word").limit(top_k)
    w = Window.orderBy(F.desc("cnt"), "word").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        topk.withColumn("rank", F.row_number().over(Window.orderBy(F.desc("cnt"), "word")))
        .withColumn("_cum", F.sum("cnt").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "word", "cnt", "rank",
            F.round(F.col("_cum") / F.col("_total"), 6).alias("coverage"),
        )
    )


def fingerprint(text) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercased
    text — the exact-dup identity used by dedup_exact (and reproducible
    in any engine with md5)."""
    norm = F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")
    return F.md5(norm)

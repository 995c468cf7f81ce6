"""Filter/scoring statistics (A1, A2) + per-URL config matcher (F12).

Clean-room re-expression of:
- FilterStats (total/passed/rejected per filter,
  /root/reference/crawl4ai/deep_crawling/filters.py:18-66) — here a
  ONE-PASS aggregation: every filter's pass count computes as a
  conditional sum over the same scan, instead of a mutable counter
  per apply() call;
- ScoringStats (urls_scored / total / min / max / average,
  /root/reference/crawl4ai/deep_crawling/scorers.py:26-60);
- CrawlerRunConfig.url_matcher / MatchMode (glob string, list of
  globs with OR/AND, /root/reference/crawl4ai/async_configs.py
  :1376-1410) — compiled to a Column choosing the FIRST matching
  config per URL, the arun_many([configs]) dispatch rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.functions.filters import url_pattern_filter
from crawl4ai_spark.functions.specs import compile_filters_column

__all__ = ["filter_stats", "scoring_stats", "match_config"]


def filter_stats(df: DataFrame, filters: list[dict], url_col: str = "url") -> DataFrame:
    """One row per filter spec: (filter, total, passed, rejected).
    Computed in a single scan — each filter is a conditional-sum
    column, then unpivoted (A1)."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, spec in enumerate(filters):
        pred = compile_filters_column([spec], F.col(url_col))
        aggs.append(F.sum(F.when(pred, 1).otherwise(0)).alias(f"_p{i}"))
    row = df.agg(*aggs)
    names = [
        spec.get("name", spec.get("kind", f"filter_{i}"))
        for i, spec in enumerate(filters)
    ]
    stack = "stack({}, {}) as (filter, passed)".format(
        len(filters),
        ", ".join(f"'{n}', _p{i}" for i, n in enumerate(names)),
    )
    return row.select(F.col("_total"), F.expr(stack)).select(
        "filter",
        F.col("_total").alias("total"),
        F.col("passed"),
        (F.col("_total") - F.col("passed")).alias("rejected"),
    )


def scoring_stats(df: DataFrame, score_col: str = "score") -> DataFrame:
    """Single-row ScoringStats aggregate (A2): urls_scored,
    total_score, min, max, average (0.0 average on empty input, like
    the reference's get_average)."""
    return df.agg(
        F.count(score_col).alias("urls_scored"),
        F.coalesce(F.sum(score_col), F.lit(0.0)).alias("total_score"),
        F.min(score_col).alias("min_score"),
        F.max(score_col).alias("max_score"),
        F.coalesce(F.avg(score_col), F.lit(0.0)).alias("average_score"),
    )


def queue_stats(frontier: DataFrame, current_iteration: int) -> DataFrame:
    """Batch QueueStats (A5, async_dispatcher.py:509-521): pending
    depth plus highest/average wait in iteration units.  (The
    streaming variant with event-time windows lives in
    streaming.continuous.fetch_metrics_stream.)"""
    pending = frontier.filter(F.col("status") == "pending")
    wait = F.lit(current_iteration) - F.col("enqueue_iter")
    return pending.agg(
        F.count(F.lit(1)).alias("total_queued"),
        F.coalesce(F.max(wait), F.lit(0)).alias("highest_wait_iters"),
        F.coalesce(F.avg(wait), F.lit(0.0)).alias("avg_wait_iters"),
    )


def match_config(
    url: Column,
    configs: list[dict],
    default: str | None = None,
) -> Column:
    """First-match config dispatch (F12): each entry is
    {"id": str, "matcher": glob | [globs], "match_mode": "or"|"and"}
    — a no-matcher entry matches everything (async_configs.py:1380).
    Returns the matched config id (or `default`)."""
    expr = F.lit(default)
    for cfg in reversed(configs):
        matcher = cfg.get("matcher")
        if matcher is None:
            cond = F.lit(True)
        else:
            patterns = [matcher] if isinstance(matcher, str) else list(matcher)
            if not patterns:
                cond = F.lit(False)
            elif cfg.get("match_mode", "or") == "and":
                cond = F.lit(True)
                for p in patterns:
                    cond = cond & url_pattern_filter(url, [p])
            else:
                cond = url_pattern_filter(url, patterns)
        expr = F.when(cond, F.lit(cfg["id"])).otherwise(expr)
    return expr

"""Deterministic sampling / data-mixing operators.

After filtering and dedup, a training-data pipeline MIXES: sample each
stratum (language, source, quality band) at its own rate, or fill a
per-stratum token budget.  Everything here is hash-deterministic — the
same row set always produces the same sample, independent of
partitioning, task order, or cluster size — which is what makes a
100 TB sampling job resumable and auditable (Spark's `df.sample` is
seed-stable only for a fixed partitioning).

- `hash_u01` — uniform [0,1) from the first 8 hex chars of md5(key);
  reproducible in any engine with md5 (the correctness oracle runs the
  same expression in DuckDB).
- `stratified_sample` — keep rows where u01(key) < fraction[stratum].
  Pure projection + filter: NO shuffle, trivially scale-free.
- `budget_sample` — per stratum, admit docs in u01 order until a
  weight budget (e.g. token count) fills.  Exact mode runs one window
  per stratum (a per-stratum sort — fine up to strata of ~10^8 rows);
  `approx=True` replaces the sort with a computed u01 cutoff
  budget/total_weight per stratum (one agg + broadcast join + a
  stateless filter — fully scale-free, hits the budget within sampling
  error because u01 is uniform and independent of weight).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_u01", "stratified_sample", "budget_sample", "mixture_weights", "mixture_sample"]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_u01(key) -> Column:
    """Deterministic uniform [0,1) from md5 of the (stringified) key."""
    h8 = F.substring(F.md5(_col(key).cast("string")), 1, 8)
    return F.conv(h8, 16, 10).cast("double") / F.lit(float(2**32))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s with probability fractions[s],
    decided by the row's own hash — no shuffle, no state, same result
    at any parallelism."""
    frac = F.lit(float(default_fraction))
    for stratum, f in sorted(fractions.items()):
        frac = F.when(_col(strata_col) == stratum, F.lit(float(f))).otherwise(frac)
    return df.filter(hash_u01(key_col) < frac)


def budget_sample(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    budgets: dict[str, float],
    key_col: str,
    approx: bool = False,
) -> DataFrame:
    """Admit docs per stratum, in hash-u01 order, until the stratum's
    weight budget is filled (a doc is admitted while the budget is not
    yet exhausted BEFORE it, so one doc may overshoot).  Adds
    `_u01` and `cum_weight` columns to the kept rows.

    approx=True swaps the per-stratum sort for a u01 cutoff of
    budget/total_weight (clamped to 1): scale-free, budget hit in
    expectation."""
    u = hash_u01(key_col).alias("_u01")
    base = df.withColumn("_u01", u)
    budget = F.lit(None).cast("double")
    for stratum, b in sorted(budgets.items()):
        budget = F.when(_col(strata_col) == stratum, F.lit(float(b))).otherwise(budget)
    base = base.withColumn("_budget", budget).filter(F.col("_budget").isNotNull())

    if approx:
        totals = base.groupBy(strata_col).agg(F.sum(weight_col).alias("_total"))
        return (
            base.join(F.broadcast(totals), strata_col)
            .filter(F.col("_u01") < F.least(F.lit(1.0), F.col("_budget") / F.col("_total")))
            .drop("_total", "_budget")
        )

    from pyspark.sql import Window

    w = (
        Window.partitionBy(strata_col)
        .orderBy("_u01", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = base.withColumn("cum_weight", F.sum(weight_col).over(w))
    return out.filter(
        (F.col("cum_weight") - _col(weight_col)) < F.col("_budget")
    ).drop("_budget")


def mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.7,
    budget: float | None = None,
) -> DataFrame:
    """Temperature-based mixture weights over groups (sources,
    languages, domains): target share of group g ∝ n_g^alpha — the
    multilingual sampling rule of XLM-R/mBERT/mT5 (alpha < 1 flattens
    the natural distribution toward small groups; alpha = 1 keeps it;
    alpha = 0 is uniform).

    Output: (group, n_docs, nat_share, target_share[, rate]) — one row
    per group, a broadcastable dim at any corpus size.  With `budget`
    (total docs wanted), `rate` = min(1, budget·target_share / n_g) is
    the per-doc keep probability realizing the mixture WITHOUT
    upsampling (groups whose quota exceeds their size saturate at 1;
    the realized total then undershoots by the saturated mass — the
    standard without-replacement compromise).

    One groupBy agg (combine-friendly counts) + one 1-row total dim
    riding the plan as a broadcast — no collect, no window.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    pw = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    counts = counts.withColumn("_pw", pw)
    tot = counts.agg(
        F.sum("n_docs").alias("_n_total"), F.sum("_pw").alias("_pw_total")
    )
    out = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n_docs",
            (F.col("n_docs") / F.col("_n_total")).alias("nat_share"),
            (F.col("_pw") / F.col("_pw_total")).alias("target_share"),
            *(
                [
                    F.least(
                        F.lit(1.0),
                        F.lit(float(budget)) * (F.col("_pw") / F.col("_pw_total"))
                        / F.col("n_docs"),
                    ).alias("rate")
                ]
                if budget is not None
                else []
            ),
        )
    )
    return out


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.7,
    budget: float | None = None,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Resample the corpus to the temperature-alpha mixture: keep each
    row iff hash_u01(key) < its group's rate.  Deterministic and
    partitioning-invariant like `stratified_sample`; the rate dim is
    broadcast so the corpus side never shuffles."""
    if weights is None:
        if budget is None:
            raise ValueError("mixture_sample needs budget or a weights dim")
        weights = mixture_weights(df, group_col, alpha, budget)
    dim = weights.select(group_col, "rate")
    return (
        df.join(F.broadcast(dim), group_col)
        .filter(hash_u01(key_col) < F.col("rate"))
    )

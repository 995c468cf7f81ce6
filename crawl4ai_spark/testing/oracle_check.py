"""Side-by-side Spark-vs-DuckDB oracle checker — a local mirror of
the driver's correctness gate (row count + schema + order-insensitive
value comparison with column names sorted).

Run all queries:   python -m crawl4ai_spark.testing.oracle_check [sf_dir]
Run one query:     python -m crawl4ai_spark.testing.oracle_check sf_dir name
"""

from __future__ import annotations

import math
import sys

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(a: pd.DataFrame, b: pd.DataFrame, float_tol: float = 1e-9) -> list[str]:
    problems: list[str] = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"schema mismatch: {sorted(a.columns)} vs {sorted(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count mismatch: {len(a)} vs {len(b)}")
    a, b = _normalize(a), _normalize(b)
    n = min(len(a), len(b))
    for c in a.columns:
        av, bv = a[c].iloc[:n], b[c].iloc[:n]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            bad = 0
            for x, y in zip(av.astype(float), bv.astype(float)):
                if (math.isnan(x) and math.isnan(y)):
                    continue
                if abs(x - y) > float_tol:
                    bad += 1
            if bad:
                problems.append(f"column {c}: {bad} float mismatches (tol {float_tol})")
        else:
            neq = (av.astype(str) != bv.astype(str)).sum()
            if neq:
                idx = (av.astype(str) != bv.astype(str)).idxmax()
                problems.append(
                    f"column {c}: {neq} mismatches, first at row {idx}: "
                    f"{av.iloc[idx]!r} vs {bv.iloc[idx]!r}"
                )
    return problems


def check_query(spark, con, name: str, sf_dir: str) -> list[str]:
    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    spark_df = qs[name](spark, sf_dir).toPandas()
    if name not in oracles:
        return [] if len(spark_df) >= 0 else ["spark query failed"]
    duck_df = con.sql(oracles[name]).df()
    return compare_frames(spark_df, duck_df)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None

    import __spark_entry__ as entry_mod
    from crawl4ai_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb_con(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name in qs:
        if only and name != only:
            continue
        try:
            problems = check_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: EXCEPTION {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:4]))
            failures += 1
        else:
            tag = "ok   " if name in oracles else "ok(rows-only)"
            print(f"{tag} {name}")
    print(f"\n{failures} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

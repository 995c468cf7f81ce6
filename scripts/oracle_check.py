"""Local stand-in for the driver's correctness gate.

Runs every `queries()` entry on Spark AND its `oracle_sql()` SQL on
DuckDB at sf0.01, then compares row count, sorted column names, and a
value hash (columns sorted by name, rows sorted, floats rounded).

Usage:  python scripts/oracle_check.py [query ...]
Exit code 1 if any query mismatches.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return None
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(repr(_canon(r[i])) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from crawl4ai_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle_check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {"err": f"spark: {e}"}
            continue
        if name not in oracles:
            results[name] = {"rows": len(srows), "oracle": "none"}
            continue
        try:
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {"err": f"duckdb: {e}"}
            continue
        rows_match = len(srows) == len(orows)
        schema_match = sorted(scols) == sorted(ocols)
        hash_match = (
            rows_match and schema_match
            and _hash(srows, scols) == _hash(orows, ocols)
        )
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": len(srows), "oracle_rows": len(orows),
        }
        if not (rows_match and schema_match and hash_match):
            failures.append(name)
            if not schema_match:
                results[name]["spark_cols"] = sorted(scols)
                results[name]["oracle_cols"] = sorted(ocols)
    spark.stop()
    print(json.dumps(results, indent=1))
    if failures:
        print(f"FAILED: {failures}", file=sys.stderr)
        sys.exit(1)
    print(f"all {len(results)} queries green", file=sys.stderr)


if __name__ == "__main__":
    main()

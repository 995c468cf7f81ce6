"""Global physical-plan invariants over the ENTIRE driver-contract
query surface: every `queries()` entry must compile to a plan with

- no CartesianProduct: all-pairs joins are banned everywhere — every
  join must ride a key (hash/sort-merge/bucketed) or an explicitly
  broadcast-bounded small side (BroadcastNestedLoopJoin over a
  broadcast probe set is allowed: it scales with the corpus, not
  corpus²);
- no BatchEvalPython: row-at-a-time Python UDFs are banned — Python
  reaches a plan only as Arrow-vectorized pandas UDFs
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).

This is the 100-TB smell test the per-operator tests can't give:
any future query added to `queries()` gets audited automatically.
`crawl_bfs` is excluded — building its DataFrame runs the whole
engine loop (its plan shape is pinned by the crawl parity suite and
the bucketed no-exchange assertion instead).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SKIP = {"crawl_bfs"}

_NAMES = [n for n in entry_mod.queries() if n not in SKIP]


@pytest.mark.parametrize("name", _NAMES)
def test_no_cartesian_no_rowwise_python(spark, sf_dir, name):
    df = entry_mod.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: all-pairs join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"

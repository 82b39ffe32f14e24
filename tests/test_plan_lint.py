"""Registry-wide physical-plan lint: EVERY registered query's executed
plan is checked for the anti-patterns that kill a 100 TB / 1000-executor
scale-up. test_plans.py asserts specific positive properties (pushdown,
broadcast) on representative queries; this sweep asserts the negative
properties on all of them, so a regression in ANY query is caught the
round it appears.

Rules:
- `CartesianProduct` never appears (equi-joins must stay hash joins;
  the intentional band/theta joins compile to BroadcastNestedLoopJoin
  with a broadcast-small side, never a shuffled cartesian).
- `BatchEvalPython` never appears (row-at-a-time Python UDFs are
  banned; Python only ever runs Arrow-batched via MapInPandas /
  FlatMapGroupsInPandas / FlatMapCoGroupsInPandas).
- `Exchange SinglePartition` is allowed ONLY as the merge step of a
  keyless (scalar) aggregation, where each task contributes exactly one
  partial-aggregate row — O(num_tasks) rows through the exchange, not
  data. Any other single-partition funnel (global Window.orderBy,
  coalesce(1), un-keyed sort) is a straggler at scale and fails here.
"""

from __future__ import annotations

import re

import pytest

from thrill_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")

# Exchange SinglePartition whose child is a keyless partial aggregate:
# the scalar-merge pattern (one row per upstream task).
# (HashAggregate prints "keys=[]", SortAggregate prints "key=[]")
_SCALAR_MERGE_CHILD = re.compile(
    r"^[\s:+|-]*(\*\(\d+\)\s*)?(Hash|Sort|ObjectHash)?Aggregate\(keys?=\[\],"
    r" functions=\[(partial_|merge_)"
)


def _single_partition_violations(plan: str) -> list[str]:
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if not _SCALAR_MERGE_CHILD.match(child):
            bad.append(f"line {i}: {line.strip()} over {child.strip()[:80]}")
    return bad


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_lint(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for pat in FORBIDDEN:
        assert pat not in plan, f"{name}: {pat} in executed plan"
    viol = _single_partition_violations(plan)
    assert not viol, f"{name}: non-scalar single-partition funnel:\n" + "\n".join(viol)

"""Plan-shape regression guard over the full query registry.

An accidental unkeyed join (dropped join condition, broken band/cell
key) appears in the physical plan as CartesianProduct — the one plan
node that cannot survive a 100 TB input. Intentional tiny-side cross
joins (broadcast query sets, 1-row totals) plan as
BroadcastNestedLoopJoin and stay allowed; this test pins the
distinction for every registered query.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry

# d08 runs its iterative label-propagation rounds during plan
# construction (driver loop inherent to connected components); its
# per-round joins are key-partitioned by design and the full run is
# covered by the operator tests + oracle.
SKIP = {"d08_dedup_clusters"}


def _physical_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


@pytest.mark.parametrize("name", [n for n in entry.queries() if n not in SKIP])
def test_no_cartesian_product(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian:\n{plan}"

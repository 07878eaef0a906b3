"""Registry-wide plan-shape sweep: every registered query's physical
plan is screened for the scale anti-patterns that kill a 100 TB run —
row-at-a-time Python UDFs, non-broadcast cartesian products, and
unpartitioned (single-reducer) windows. Individual queries get precise
budgets in test_plans.py; this sweep guarantees no NEW query can land
with one of the forbidden shapes, whatever its name.

Plans are built (analysis + physical planning only, nothing executes),
so the whole 80+-query sweep costs seconds.
"""

from __future__ import annotations

import re

import pytest

from sarkac_spark.plans.audit import executed_plan
from sarkac_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"

# BatchEvalPython = row-at-a-time Python UDF (the ~100x-slower path).
# Arrow-vectorized Python (MapInPandas / FlatMapGroupsInPandas /
# ArrowEvalPython) is allowed — that is the designed escape hatch.
ROW_AT_A_TIME = "BatchEvalPython"

# Non-broadcast cartesian product: |left| x |right| tasks. Broadcast
# nested-loop joins (1-row as-of bounds, tiny dims, query fan-out) are
# the cheap kind and allowed.
CARTESIAN = "CartesianProduct"

# A window whose spec has no partition columns funnels the whole input
# through ONE reducer: windowspecdefinition(...) opening directly with
# the frame means zero partition/order expressions before it.
UNPARTITIONED_WINDOW = re.compile(
    r"windowspecdefinition\(specifiedwindowframe"
)


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in all_queries().items():
        out[name] = executed_plan(fn(spark, SF_DIR))
    return out


def test_no_row_at_a_time_python(plans):
    bad = [n for n, p in plans.items() if ROW_AT_A_TIME in p]
    assert bad == [], f"row-at-a-time Python UDF in: {bad}"


def test_no_cartesian_products(plans):
    bad = [n for n, p in plans.items() if CARTESIAN in p]
    assert bad == [], f"non-broadcast cartesian product in: {bad}"


def test_no_unpartitioned_windows(plans):
    bad = [n for n, p in plans.items() if UNPARTITIONED_WINDOW.search(p)]
    assert bad == [], f"unpartitioned window in: {bad}"

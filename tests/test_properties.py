"""Property-based tests (hypothesis) for the pure-Python layers:
duration parsing, JSON numeric-leaf flattening, DSL merge invariants.
Spark stays out of the example loops — these run hundreds of cases."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from sarkac_spark.config import DSL, humanize_duration, parse_duration
from sarkac_spark.operators.discovery import (
    field_list_hash,
    numeric_leaf_paths_of_json,
    topic_diff,
)

UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


@given(st.integers(min_value=1, max_value=10_000), st.sampled_from(sorted(UNITS)))
def test_duration_roundtrip(qty, unit):
    seconds = parse_duration(f"{qty}{unit}")
    assert seconds == qty * UNITS[unit]
    # humanize always re-parses to the same number of seconds
    assert parse_duration(humanize_duration(seconds)) == seconds


# JSON payloads: nested dicts/lists with numeric, string, bool, null leaves
json_leaves = st.one_of(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=8),
    st.booleans(),
    st.none(),
)
json_payloads = st.recursive(
    json_leaves,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
                min_size=1,
                max_size=6,
            ),
            children,
            max_size=4,
        ),
    ),
    max_leaves=12,
)


def _resolve(obj, path: str):
    """Reference getByPath semantics: dot-path with numeric segments as
    list indexes."""
    if path == "":
        return obj
    cur = obj
    for seg in path.split("."):
        if isinstance(cur, list):
            cur = cur[int(seg)]
        elif isinstance(cur, dict):
            cur = cur[seg]
        else:
            raise KeyError(path)
    return cur


@settings(max_examples=300)
@given(json_payloads)
def test_numeric_leaf_paths_resolve_to_numbers(payload):
    paths = numeric_leaf_paths_of_json(payload)
    # every returned path resolves to a non-bool number
    for p in paths:
        v = _resolve(payload, p)
        assert isinstance(v, (int, float)) and not isinstance(v, bool)
    # completeness: every numeric leaf is found (count them independently)
    def count_numeric(node) -> int:
        if isinstance(node, bool):
            return 0
        if isinstance(node, (int, float)):
            return 1
        if isinstance(node, dict):
            return sum(count_numeric(v) for v in node.values())
        if isinstance(node, list):
            return sum(count_numeric(v) for v in node)
        return 0

    assert len(paths) == count_numeric(payload)


@settings(max_examples=200)
@given(json_payloads)
def test_field_hash_is_deterministic_and_json_stable(payload):
    paths = numeric_leaf_paths_of_json(payload)
    assert field_list_hash(paths) == field_list_hash(list(reversed(paths)))
    # serialization round-trip doesn't change discovery output
    assert numeric_leaf_paths_of_json(json.loads(json.dumps(payload))) == paths


@given(
    st.lists(st.text(min_size=1, max_size=6), max_size=8, unique=True),
    st.lists(st.text(min_size=1, max_size=6), max_size=8, unique=True),
)
def test_topic_diff_partition(known, current):
    new, deleted = topic_diff(known, current)
    # disjoint, and union reconstructs the symmetric difference
    assert set(new) & set(deleted) == set()
    assert set(new) == set(current) - set(known)
    assert set(deleted) == set(known) - set(current)


@given(
    st.dictionaries(
        st.sampled_from(["t1", "t2", "t3"]),
        st.lists(st.sampled_from(["a", "b.c", "d"]), max_size=3, unique=True),
        max_size=3,
    )
)
def test_dsl_merge_idempotent_and_preserves_fixed(discovered):
    base = DSL.parse({"t1": {"fields": {"a": {"windows": ["1m"]}}}})
    merged = base.merge_discovered(discovered)
    # fixed config always wins (reference DSLHandler.js:329-335)
    t1 = {f.path: f for f in merged.topics["t1"].fields}
    assert t1["a"].windows == (60,)
    # merging the same discovery again changes nothing
    assert merged.merge_discovered(discovered).tasks() == merged.tasks()


# --- HLL error envelope across register sizes --------------------------------
# Parametrized rather than hypothesis-looped: the estimator is fully
# deterministic (md5-derived hashes), so each (b, n) point is one fixed
# case — and each needs a Spark job, which hypothesis's hundreds of
# examples would multiply for zero extra coverage.

import pytest


@pytest.mark.parametrize("b", [8, 10, 12])
def test_hll_error_envelope_across_b(spark, b):
    """VERDICT r4 item 7: the relative error of hll_distinct must stay
    within ~3·(1.04/sqrt(m)) for m = 2^b across cardinalities spanning
    the linear-counting and raw-HLL regimes, and the linear-counting
    branch must actually ENGAGE at low cardinality (est_raw <= 2.5m
    with empty registers present — recomputed from the register state
    itself, not inferred from accuracy)."""
    from sarkac_spark.operators.sketch import (
        _hll_alpha,
        hll_distinct,
        hll_registers,
    )

    m = 1 << b
    bound = 3 * 1.04 / m**0.5
    for n in (max(8, m // 8), 5 * m, 40 * m):
        d = spark.range(n).selectExpr(f"concat('v{b}_', id) AS v")
        est = hll_distinct(d, "v", b=b).collect()[0].est_distinct
        assert abs(est - n) / n <= bound, (b, n, est)

    # low-cardinality regime: prove the linear-counting branch is taken
    n_small = m // 16
    d = spark.range(n_small).selectExpr(f"concat('lc{b}_', id) AS v")
    regs = {r.idx: r.M for r in hll_registers(d, "v", [], b=b).collect()}
    zeros = m - len(regs)
    rho_max = 60 - b + 1
    s = sum(2.0 ** (-M) for M in regs.values()) + zeros * 2.0 ** (-rho_max) * 0
    s += zeros  # untouched registers contribute 2^0 = 1 each
    est_raw = _hll_alpha(m) * m * m / s
    assert zeros > 0 and est_raw <= 2.5 * m  # branch condition holds
    est = hll_distinct(d, "v", b=b).collect()[0].est_distinct
    # linear counting is near-exact this far below m (±2 absolute floor:
    # at b=8 n_small is 16 and a single register collision moves the
    # rounded estimate by 1)
    assert abs(est - n_small) <= max(2, 0.05 * n_small), (b, n_small, est)


@pytest.mark.parametrize("cap", [1, 3, 7, None])
def test_df_cap_equals_window_formulation(spark, cap):
    """_df_cap (broadcast anti-join, the de-straggler round-6 rewrite)
    must be row-identical to the count-window formulation it replaced —
    the DuckDB oracles still encode the windowed SQL, so this is the
    bridge that keeps the hash gate honest."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sarkac_spark.operators.dedup import _df_cap

    rows = [(i, f"k{i % 5}") for i in range(40)] + [(100 + i, "hot") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, key string")

    got = {(r.id, r.key) for r in _df_cap(df, "key", cap).collect()}
    windowed = df.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("key"))
    )
    if cap is not None:
        windowed = windowed.filter(F.col("__df") <= cap)
    expect = {(r.id, r.key) for r in windowed.collect()}
    assert got == expect

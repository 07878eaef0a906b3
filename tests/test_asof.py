"""As-of join semantics: inclusive ties, no-prior-match handling, key
isolation — mirrors DuckDB ASOF JOIN behavior (the oracle)."""

from __future__ import annotations

import datetime as dt

from sarkac_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(5), "c")],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "x"), (1, _ts(15), "y"), (2, _ts(99), "z")],
        "k long, ts timestamp, rv string",
    )
    return left, right


def test_asof_inner(spark):
    left, right = _frames(spark)
    got = {
        (r.k, r.lv): r.r_rv
        for r in asof_join(left, right, on=["k"]).collect()
    }
    # equal timestamps match (inclusive <=); most recent prior wins;
    # k=2 left row has no prior right row -> dropped (inner)
    assert got == {(1, "a"): "x", (1, "b"): "y"}


def test_asof_left(spark):
    left, right = _frames(spark)
    got = {
        (r.k, r.lv): r.r_rv
        for r in asof_join(left, right, on=["k"], how="left").collect()
    }
    assert got == {(1, "a"): "x", (1, "b"): "y", (2, "c"): None}


def test_asof_key_isolation(spark):
    # a right row for another key must never leak across keys
    left = spark.createDataFrame([(1, _ts(50), "a")], "k long, ts timestamp, lv string")
    right = spark.createDataFrame([(2, _ts(10), "x")], "k long, ts timestamp, rv string")
    assert asof_join(left, right, on=["k"]).count() == 0

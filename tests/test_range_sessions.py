"""Range join boundary semantics and sessionization construction."""

from __future__ import annotations

import datetime as dt

from sarkac_spark.operators.range_join import range_join
from sarkac_spark.operators.sessions import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [("k", _ts(0), 1), ("k", _ts(100), 2), ("k", _ts(101), 3), ("x", _ts(50), 4)],
        "key string, ts timestamp, pid long",
    )
    intervals = spark.createDataFrame(
        [("k", _ts(0), _ts(100), 10)],
        "key string, start_ts timestamp, end_ts timestamp, iid long",
    )
    got = sorted(
        r.pid
        for r in range_join(
            points, intervals, on=["key"], bucket_seconds=60
        ).collect()
    )
    # inclusive both ends; 101 outside; other key excluded
    assert got == [1, 2]


def test_range_join_interval_spanning_buckets(spark):
    # interval longer than the bucket: every covered bucket must probe
    points = spark.createDataFrame(
        [("k", _ts(3500), 1), ("k", _ts(7100), 2)],
        "key string, ts timestamp, pid long",
    )
    intervals = spark.createDataFrame(
        [("k", _ts(3000), _ts(7200), 10)],
        "key string, start_ts timestamp, end_ts timestamp, iid long",
    )
    got = sorted(
        r.pid
        for r in range_join(
            points, intervals, on=["key"], bucket_seconds=3600
        ).collect()
    )
    assert got == [1, 2]


def test_sessionize(spark):
    rows = [
        (1, _ts(0), 100),
        (1, _ts(60), 101),     # same session (gap 60 < 1800)
        (1, _ts(60 + 1801), 102),  # > gap: new session
        (2, _ts(30), 200),     # other key: own session numbering
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = {
        r.event_id: r.session_seq
        for r in sessionize(df, ["user_id"], order_tiebreak=["event_id"]).collect()
    }
    assert got == {100: 1, 101: 1, 102: 2, 200: 1}

    stats = {
        (r.user_id, r.session_seq): (r.n_events, r.duration_us)
        for r in session_stats(
            df, ["user_id"], order_tiebreak=["event_id"]
        ).collect()
    }
    assert stats[(1, 1)] == (2, 60 * 1_000_000)
    assert stats[(1, 2)] == (1, 0)
    assert stats[(2, 1)] == (1, 0)


def test_funnel_ordering_semantics(spark):
    from sarkac_spark.operators.sessions import funnel

    rows = [
        # user 1: clean view -> click -> purchase
        (1, 1, _ts(0), "view"), (2, 1, _ts(10), "click"), (3, 1, _ts(20), "purchase"),
        # user 2: purchase BEFORE click -> purchase must not count
        (4, 2, _ts(0), "view"), (5, 2, _ts(5), "purchase"), (6, 2, _ts(10), "click"),
        # user 3: click before any view -> only the later view counts
        (7, 3, _ts(0), "click"), (8, 3, _ts(10), "view"),
        # user 4: simultaneous view+click (tie) -> strict > rejects click
        (9, 4, _ts(0), "view"), (10, 4, _ts(0), "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = funnel(
        df, "user_id", "ts", "event_type",
        steps=("view", "click", "purchase"), id_tiebreak="event_id",
    ).collect()[0]
    # views: users 1,2,3,4; valid clicks: user 1 and 2 (click after view);
    # valid purchases: user 1 only
    assert (out.n_view, out.n_click, out.n_purchase) == (4, 2, 1)

"""Sigma-scan behavior tests — the batch analogue of the reference's
example fixture (example/produceExampleMessages.js: steady baseline with
planted spikes must be flagged; see SURVEY.md §5)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sarkac_spark.operators.anomaly import sigma_scan
from sarkac_spark.operators.stats import (
    rate_series,
    retention_filter,
    trailing_window_stats,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), "t", float(v)) for i, (s, v) in enumerate(rows)],
        "event_id long, ts timestamp, event_type string, value double",
    )


def test_planted_spike_flagged(spark):
    # baseline jitters around 15.5 (needs nonzero stddev), one planted spike
    rows = [(i * 10, 15.5 + (0.1 if i % 2 else -0.1)) for i in range(20)]
    rows.append((205, 150.5))  # the reference example's spike value
    df = _mk_events(spark, rows)
    out = sigma_scan(df, windows=(3600,)).collect()
    assert len(out) == 1
    a = out[0]
    assert a.value == 150.5 and a.topic == "t" and a.human_window == "1h"
    assert abs(a.three_sigma) > 1


def test_trailing_percentiles_windows_and_guard(spark):
    from sarkac_spark.operators.stats import trailing_percentiles

    # 5 old rows outside 1h + recent 1..9: the 1h cell sees only the
    # recent values (p50=5), the 1d cell sees everything
    rows = [(-90000 + i, 1000.0) for i in range(5)]
    rows += [(i * 10, float(i + 1)) for i in range(9)]
    df = _mk_events(spark, rows)
    out = {
        r.window_seconds: r
        for r in trailing_percentiles(
            df, ["event_type"], "value", "ts", [3600, 86400 * 2]
        ).collect()
    }
    assert out[3600].p50 == 5.0 and out[3600].n == 9
    assert out[3600].p95 == 8.6  # exact interpolated quantile of 1..9
    assert out[172800].n == 14 and out[172800].p99 > 900
    # min-count guard: 2 in-window rows -> no cell
    tiny = _mk_events(spark, [(0, 1.0), (10, 2.0)])
    assert (
        trailing_percentiles(tiny, ["event_type"], "value", "ts", [3600]).count()
        == 0
    )


def test_robust_scan_resists_masking(spark):
    from sarkac_spark.operators.anomaly import robust_sigma_scan

    # baseline ~15.5 with jitter, then a BURST of 5 huge outliers: the
    # burst inflates mean and stddev enough that the mean-based scan
    # under-scores the outliers themselves (masking); median/MAD stats
    # barely move, so every burst row scores far beyond 3
    rows = [(i * 10, 15.5 + (0.2 if i % 2 else -0.2)) for i in range(40)]
    rows += [(500 + i * 10, 5000.0) for i in range(5)]
    df = _mk_events(spark, rows)
    robust = robust_sigma_scan(df, windows=(3600,)).collect()
    flagged = {r.value for r in robust}
    assert flagged == {5000.0}
    assert all(r.robust_z > 3 for r in robust)
    # robust stats unmoved by the burst: median stays at baseline level
    assert all(abs(r.median - 15.5) < 1 for r in robust)


def test_robust_scan_mad_zero_suppressed(spark):
    from sarkac_spark.operators.anomaly import robust_sigma_scan

    # constant series + one spike: MAD = 0 -> score suppressed (the
    # robust analogue of the stddev-0 Infinity guard)
    rows = [(i * 10, 42.0) for i in range(10)] + [(200, 9000.0)]
    df = _mk_events(spark, rows)
    assert robust_sigma_scan(df, windows=(3600,)).count() == 0


def test_zero_stddev_suppressed(spark):
    # constant series + spike within same window: stddev>0 case flags, but a
    # fully-constant window (stddev=0) must emit nothing (DSLHandler.js:194-197)
    df = _mk_events(spark, [(i * 10, 42.0) for i in range(10)])
    assert sigma_scan(df, windows=(3600,)).count() == 0


def test_min_count_guard(spark):
    # two in-window events -> no stats -> no anomalies (DSLHandler.js:243-254)
    df = _mk_events(spark, [(0, 1.0), (10, 100.0)])
    assert sigma_scan(df, windows=(3600,)).count() == 0
    stats = trailing_window_stats(df, ["event_type"], "value", "ts", [3600])
    assert stats.count() == 0


def test_trailing_window_excludes_old_rows(spark):
    # 5 old rows far outside the 1h window + 3 recent: stats over recent only
    rows = [(-90000 + i, 1000.0) for i in range(5)] + [(0, 10.0), (10, 20.0), (20, 30.0)]
    df = _mk_events(spark, rows)
    stats = trailing_window_stats(df, ["event_type"], "value", "ts", [3600]).collect()
    assert len(stats) == 1
    assert stats[0].n == 3 and abs(stats[0].mean - 20.0) < 1e-9


def test_retention_filter(spark):
    rows = [(-90000, 1.0), (-10, 2.0), (0, 3.0)]
    df = _mk_events(spark, rows)
    kept = retention_filter(df, "ts", 3600)
    assert kept.count() == 2


def test_rate_series_buckets(spark):
    # 6 events in minute 0, 2 in minute 1
    rows = [(i, 1.0) for i in range(6)] + [(60 + i, 1.0) for i in range(2)]
    df = _mk_events(spark, rows)
    out = {r.bucket_ts.second + r.bucket_ts.minute * 60: r.n for r in rate_series(df, ["event_type"], "ts", 60).collect()}
    assert out == {0: 6, 60: 2}


def test_multi_window_fanout(spark):
    rows = [(i * 100, 10.0 + (i % 3)) for i in range(40)]
    df = _mk_events(spark, rows)
    stats = trailing_window_stats(df, ["event_type"], "value", "ts", [600, 3600, 7200])
    got = {r.window_seconds: r.n for r in stats.collect()}
    assert set(got) == {600, 3600, 7200}
    assert got[600] < got[3600] <= got[7200]


def test_decayed_stats_halving(spark):
    from sarkac_spark.operators.stats import decayed_stats

    # three points at 0, 1, and 2 half-lives before as_of (values 1, 2, 4):
    # weights 1, 1/2, 1/4 -> decayed mean = (1 + 1 + 1) / 1.75
    hl = 3600
    rows = [(-2 * hl, 4.0), (-hl, 2.0), (0, 1.0)]
    out = decayed_stats(
        _mk_events(spark, rows), ["event_type"], "value", "ts", hl
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.weight_mass == 1.75
    assert r.decayed_mean == round(3 / 1.75, 6)
    assert r.n == 3
    # age cap: a point 1000 half-lives old must not underflow/overflow —
    # its capped 2^-40 weight vanishes from the 6-decimal mass but a
    # huge value still contributes finitely to the mean
    old = decayed_stats(
        _mk_events(spark, rows + [(-1000 * hl, 9e9)]),
        ["event_type"], "value", "ts", hl,
    ).collect()[0]
    assert old.n == 4 and old.weight_mass == 1.75
    assert 0 < old.decayed_mean - r.decayed_mean < 0.01


def test_iqr_outliers_fences(spark):
    from sarkac_spark.operators.anomaly import iqr_outliers

    # tight 1..9 base with one far point on each side
    rows = [(i * 10, float(i + 1)) for i in range(9)]
    rows += [(100, 100.0), (110, -50.0)]
    out = iqr_outliers(_mk_events(spark, rows)).collect()
    assert {r.value for r in out} == {100.0, -50.0}
    assert all(r.fence_lo < r.p25 < r.p75 < r.fence_hi for r in out)
    # constant distribution (IQR=0) is suppressed entirely
    flat = [(i * 10, 5.0) for i in range(10)] + [(200, 50.0)]
    assert iqr_outliers(_mk_events(spark, flat)).count() == 0

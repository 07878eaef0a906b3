"""Control-chart detectors (operators/control.py): CUSUM, EWMA, seasonal.

Each planted-signal fixture encodes the defining property of its chart:
a 1-sigma level shift that a 3-sigma gate never sees but CUSUM
accumulates; a drifting bucket mean that leaves the EWMA band; a nightly
dip that flat sigma flags but the seasonal baseline absorbs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sarkac_spark.operators.anomaly import sigma_scan
from sarkac_spark.operators.control import (
    cusum_scan,
    ewma_scan,
    seasonal_sigma_scan,
)

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def _alternating(i: int) -> float:
    # +/-1 alternation: mean 0, stddev_pop 1 exactly (even counts)
    return 1.0 if i % 2 == 0 else -1.0


def test_cusum_trips_on_one_sigma_shift_that_sigma_scan_misses(spark):
    """A +1.25-sigma level shift never exceeds a 3-sigma gate, but the
    CUSUM hi arm accumulates (z - k) ~ 0.75/point and trips in ~7 points."""
    rows = []
    for i in range(40):
        rows.append((i, T0 + dt.timedelta(seconds=i), "t", _alternating(i)))
    for i in range(40, 60):  # shifted regime: 1.25 +/- 1
        rows.append(
            (i, T0 + dt.timedelta(seconds=i), "t", 1.25 + _alternating(i))
        )
    df = _events(spark, rows)

    flagged = cusum_scan(df).orderBy("ts_us").collect()
    assert flagged, "CUSUM must detect the persistent small shift"
    assert all(r.direction in ("up", "both") for r in flagged)
    # trips inside the shifted regime. (Batch CUSUM standardizes against
    # the whole-series stats, which the shift itself dilutes — mean ~0.42,
    # sd ~1.16 here — so the average per-point drift is ~0.2 sigma and the
    # trip lands ~19 points in, later than the online-textbook ~7.)
    first = min(r.event_id for r in flagged)
    assert 40 <= first < 60

    # the per-point 3-sigma scan is blind to the same data
    assert sigma_scan(df.withColumn("props", df.value)).count() == 0


def test_cusum_down_direction(spark):
    rows = []
    for i in range(40):
        rows.append((i, T0 + dt.timedelta(seconds=i), "t", _alternating(i)))
    for i in range(40, 60):
        rows.append(
            (i, T0 + dt.timedelta(seconds=i), "t", -1.25 + _alternating(i))
        )
    flagged = cusum_scan(_events(spark, rows)).collect()
    assert flagged and all(r.direction in ("down", "both") for r in flagged)


def test_cusum_quiet_series_stays_quiet(spark):
    rows = [
        (i, T0 + dt.timedelta(seconds=i), "t", _alternating(i))
        for i in range(200)
    ]
    assert cusum_scan(_events(spark, rows)).count() == 0


def test_ewma_flags_drifted_buckets(spark):
    """Hourly bucket means at level 10 for 30 buckets, then 14: the EWMA
    crosses the asymptotic band within a few shifted buckets."""
    rows = []
    eid = 0
    for b in range(40):
        level = 10.0 if b < 30 else 14.0
        for j in range(4):
            rows.append(
                (
                    eid,
                    T0 + dt.timedelta(hours=b, minutes=10 * j),
                    "t",
                    level + (0.5 if j % 2 == 0 else -0.5),
                )
            )
            eid += 1
    # with 30 buckets at 10 and 10 at 14: mu=11, sd=sqrt(3), so the 3-sigma
    # band edge is exactly |14-11| — use 2 sigma for a clear margin
    out = ewma_scan(_events(spark, rows), limit_sigma=2.0).collect()
    assert out, "EWMA must flag the shifted regime"
    shifted_start = int(
        (T0 + dt.timedelta(hours=30)).timestamp() * 1_000_000
    )
    assert all(r.bucket_us >= shifted_start for r in out)
    assert all(r.band_lo < r.mu < r.band_hi for r in out)


def test_seasonal_baseline_absorbs_nightly_dip(spark):
    """A 3am dip to level 1 (vs daytime 10) trips flat sigma but is normal
    against the hour-of-day baseline; a genuinely anomalous 3am spike to
    daytime level still trips the seasonal scan."""
    rows = []
    eid = 0
    for day in range(8):
        for hour in range(24):
            level = 1.0 if hour == 3 else 10.0
            for j in range(2):
                rows.append(
                    (
                        eid,
                        T0 + dt.timedelta(days=day, hours=hour, minutes=30 * j),
                        "t",
                        level + (0.25 if (eid % 2 == 0) else -0.25),
                    )
                )
                eid += 1
    # one anomalous 3am point at daytime level
    rows.append((eid, T0 + dt.timedelta(days=8, hours=3), "t", 10.0))
    df = _events(spark, rows)

    seasonal = seasonal_sigma_scan(df).collect()
    assert [r.event_id for r in seasonal] == [eid]
    assert seasonal[0].hour_of_day == 3

    # flat global sigma flags the *routine* dip rows instead
    flat = cusum_scan(df)  # any global-stats detector; cusum trips on dips
    assert flat.count() > 0


def test_seasonal_hour_wraps_for_negative_epochs(spark):
    """Pre-1970 timestamps must land in [0, 24): 1969-12-31 23:30 is
    hour 23, not -1 (pmod, not %)."""
    rows = [
        (i, dt.datetime(1969, 12, 31, 23, 30) + dt.timedelta(days=i), "t", 5.0)
        for i in range(6)
    ]
    rows.append((99, dt.datetime(1970, 1, 4, 23, 30), "t", 50.0))
    out = seasonal_sigma_scan(
        _events(spark, rows), min_count=3, z_threshold=1.0
    ).collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].hour_of_day == 23


def test_seasonal_tolerates_colliding_input_columns(spark):
    """An input that already has an `n` column must not produce
    AMBIGUOUS_REFERENCE (internals are __-prefixed)."""
    rows = [
        (i, T0 + dt.timedelta(hours=i), "t", float(i % 5)) for i in range(50)
    ]
    df = _events(spark, rows).withColumn("n", F.lit(1))
    seasonal_sigma_scan(df).collect()  # must not raise

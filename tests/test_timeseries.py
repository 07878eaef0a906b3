from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sarkac_spark.operators.timeseries import gap_fill

STEP = 60 * 1_000_000  # 1-minute buckets in microseconds


def test_gap_fill_dense_and_ffill(spark):
    rows = [
        # key "a": minutes 0, 1, 1, 4 -> gap at 2 and 3
        ("a", datetime(2024, 1, 1, 0, 0, 10), 10.0),
        ("a", datetime(2024, 1, 1, 0, 1, 0), 20.0),
        ("a", datetime(2024, 1, 1, 0, 1, 30), 40.0),
        ("a", datetime(2024, 1, 1, 0, 4, 59), 7.0),
        # key "b": single observation -> 1-row grid, nothing filled
        ("b", datetime(2024, 1, 1, 5, 0, 0), 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, value double")
    out = gap_fill(df, ["k"], "ts", "value", bucket_seconds=60)
    got = {(r.k, r.bucket_us): r for r in out.collect()}

    a_buckets = sorted(b for k, b in got if k == "a")
    assert len(a_buckets) == 5  # minutes 0..4, dense
    assert a_buckets == [a_buckets[0] + i * STEP for i in range(5)]

    base = a_buckets[0]
    assert got[("a", base)].v_fill == 10.0
    assert got[("a", base + STEP)].v_fill == 30.0  # avg(20, 40)
    assert got[("a", base + STEP)].n_obs == 2
    # gap minutes carry the last observed average forward
    for i in (2, 3):
        r = got[("a", base + i * STEP)]
        assert r.v_fill == 30.0 and r.n_obs == 0 and r.filled
    assert got[("a", base + 4 * STEP)].v_fill == 7.0
    assert not got[("a", base + 4 * STEP)].filled

    b_rows = [r for (k, _), r in got.items() if k == "b"]
    assert len(b_rows) == 1 and b_rows[0].v_fill == 1.0 and not b_rows[0].filled
    # v_fill is never NULL: every grid starts at the key's first observation
    assert out.filter(F.col("v_fill").isNull()).count() == 0


def test_series_correlation(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from sarkac_spark.operators.timeseries import series_correlation

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # series A: hourly means 10, 20, 30, 40; B = 2*A (corr +1);
    # C = reversed A (corr -1); D constant (zero variance -> dropped)
    for h, base in enumerate([10.0, 20.0, 30.0, 40.0]):
        ts = t0 + dt.timedelta(hours=h)
        rows += [
            (ts, "A", base),
            (ts, "B", 2 * base),
            (ts, "C", 50.0 - base),
            (ts, "D", 7.0),
        ]
    d = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {
        (r.series_a, r.series_b): r
        for r in series_correlation(d, min_buckets=3).collect()
    }
    # D has zero variance: every pair involving it is dropped
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert out[("A", "B")].corr == 1.0
    assert out[("A", "C")].corr == -1.0
    assert out[("B", "C")].corr == -1.0
    assert all(r.n_buckets == 4 for r in out.values())

    # min_buckets guard: restricting to fewer shared buckets drops pairs
    short = d.filter(F.col("ts") < t0 + dt.timedelta(hours=2))
    assert series_correlation(short, min_buckets=3).count() == 0

"""applyInPandasWithState cooldown over a real streaming query: state
must carry the last-emit timestamp across micro-batches."""

from __future__ import annotations

import pytest

# e2e tier: real streaming queries / subprocess sessions — minutes each.
# Excluded from the default (driver-verify) fast run; the builder's
# once-per-round full run includes them (pytest -m "slow or not slow").
pytestmark = pytest.mark.slow


import datetime as dt

from pyspark.sql import functions as F

from sarkac_spark.streaming.stateful_cooldown import stateful_cooldown

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "event_id long, topic string, path string, window_seconds long, event_ts_us long"


def _rows(ids_offsets):
    base_us = int(T0.timestamp()) * 1_000_000
    return [
        (i, "t", "p", 300, base_us + s * 1_000_000) for i, s in ids_offsets
    ]


def test_stateful_cooldown_across_batches(spark, tmp_path):
    # batch 1: emits at 0s; 60s and 110s suppressed. batch 2 (separate
    # file): 130s emitted (>=120s after 0), 200s suppressed (<120 after
    # 130), 260s emitted — requires state carried across batches.
    src = tmp_path / "src"
    b1 = _rows([(0, 0), (1, 60), (2, 110)])
    b2 = _rows([(3, 130), (4, 200), (5, 260)])
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = stateful_cooldown(stream, cooldown_seconds=120)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cooldown_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    kept = sorted(
        r.event_id for r in spark.sql("SELECT event_id FROM cooldown_out").collect()
    )
    assert kept == [0, 3, 5]


def test_stateful_cooldown_multiple_keys(spark, tmp_path):
    src = tmp_path / "src2"
    rows = _rows([(0, 0), (1, 30)]) + [
        (10, "t2", "p", 300, int(T0.timestamp()) * 1_000_000 + 30 * 1_000_000)
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    out = stateful_cooldown(stream, cooldown_seconds=120)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cooldown_out2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = sorted(
        r.event_id for r in spark.sql("SELECT event_id FROM cooldown_out2").collect()
    )
    # independent state per key: t2's first anomaly emits despite t's
    assert kept == [0, 10]

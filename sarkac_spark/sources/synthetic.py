"""Synthetic message generator — the reference's de-facto test fixture
(example/produceExampleMessages.js): a steady baseline payload
``{"sub": {"one": 15.5}, "two": 16}`` with a planted spike
``sub.one = 150.5`` every Nth message and a planted dip ``two = -100``
every Mth (reference lines 14-45; cadence 2.5 s / 30 s / 60 s, i.e. every
12th and every 24th message).

Batch builder for golden tests plus a rate-source streaming variant.
Baseline values get a small deterministic jitter so window stddev is
nonzero (a perfectly constant series would suppress all scores under the
reference's stddev=0 guard — see test_zero_stddev_suppressed).
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import DataFrame, SparkSession, functions as F

TOPIC = "test-topic"
SPIKE_EVERY = 12
DIP_EVERY = 24
BASE_ONE, SPIKE_ONE = 15.5, 150.5
BASE_TWO, DIP_TWO = 16.0, -100.0


def _payload(i: int) -> str:
    jitter = 0.1 if i % 2 else -0.1
    one = SPIKE_ONE if i % SPIKE_EVERY == SPIKE_EVERY - 1 else BASE_ONE + jitter
    two = DIP_TWO if i % DIP_EVERY == DIP_EVERY - 1 else BASE_TWO + jitter
    return json.dumps({"sub": {"one": one}, "two": two})


def example_messages(
    spark: SparkSession,
    n: int = 96,
    tick_seconds: float = 2.5,
    t0: dt.datetime = dt.datetime(2024, 1, 1, 12, 0, 0),
) -> DataFrame:
    """Batch fixture: n messages at the reference cadence."""
    rows = [
        (TOPIC, str(i), _payload(i), t0 + dt.timedelta(seconds=i * tick_seconds))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "topic string, key string, value string, ts timestamp"
    )


def expected_anomaly_indices(n: int) -> tuple[list[int], list[int]]:
    """(spike indices on sub.one, dip indices on two) planted in the first
    n messages — the golden expectation."""
    spikes = [i for i in range(n) if i % SPIKE_EVERY == SPIKE_EVERY - 1]
    dips = [i for i in range(n) if i % DIP_EVERY == DIP_EVERY - 1]
    return spikes, dips


def example_message_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Streaming fixture over the rate source: same payload sequence keyed
    by the rate source's monotonically increasing ``value``."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    ).load()
    i = F.col("value")
    jitter = F.when(i % 2 == 1, F.lit(0.1)).otherwise(F.lit(-0.1))
    one = F.when(i % SPIKE_EVERY == SPIKE_EVERY - 1, F.lit(SPIKE_ONE)).otherwise(
        F.lit(BASE_ONE) + jitter
    )
    two = F.when(i % DIP_EVERY == DIP_EVERY - 1, F.lit(DIP_TWO)).otherwise(
        F.lit(BASE_TWO) + jitter
    )
    payload = F.to_json(F.struct(F.struct(one.alias("one")).alias("sub"), two.alias("two")))
    return rate.select(
        F.lit(TOPIC).alias("topic"),
        i.cast("string").alias("key"),
        payload.alias("value"),
        F.col("timestamp").alias("ts"),
    )

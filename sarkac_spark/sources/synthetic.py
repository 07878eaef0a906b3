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


def encode_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic binary PPM (P6) payload: an RGB gradient offset by
    ``seed``. Pure bytes, spec-conformant (comment line included so
    decoders must handle it)."""
    header = f"P6\n# synthetic fixture seed={seed}\n{width} {height}\n255\n".encode()
    raster = bytearray()
    for y in range(height):
        for x in range(width):
            raster += bytes(
                ((x + seed) % 256, (y + seed) % 256, (x + y + seed) % 256)
            )
    return header + bytes(raster)


def encode_wav(
    n_samples: int, sample_rate: int = 8000, period: int = 50, amplitude: int = 12000
) -> bytes:
    """Deterministic 16-bit mono PCM WAV payload: a square wave of the
    given period. Pure ``struct`` packing of the published RIFF layout."""
    import struct

    data = b"".join(
        struct.pack("<h", amplitude if (i // (period // 2)) % 2 == 0 else -amplitude)
        for i in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def example_media(spark: SparkSession, n: int = 12) -> DataFrame:
    """Decodable media fixture matching operators/multimodal.MEDIA_SCHEMA:
    alternating PPM images and PCM WAV clips with truthful metadata, plus
    one compressed-format row (PNG magic, no codec here) to exercise the
    refuse-loudly path when selected."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + i, 6 + i
            rows.append(
                (i, "image", "image/x-portable-pixmap", encode_ppm(w, h, seed=i),
                 w, h, None)
            )
        else:
            n_samp = 800 * i
            rows.append(
                (i, "audio", "audio/wav", encode_wav(n_samp), None, None,
                 int(n_samp / 8000 * 1000))
            )
    rows.append((n, "image", "image/png", b"\x89PNG\r\n\x1a\n....", 1, 1, None))
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )


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

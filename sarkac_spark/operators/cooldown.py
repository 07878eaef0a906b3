"""Anomaly re-emit cooldown (W6).

After emitting an anomaly for a (topic, path, window), the reference
suppresses further emits for that key for 2 minutes via an in-memory TTL
cache (lib/dsl/DSLHandler.js:13,199-210) — emit-first-then-suppress,
where each *emitted* anomaly starts the 2-minute clock.

Two implementations:

- ``cooldown_bucketed``: first anomaly per key per aligned 120 s bucket.
  Pure relational (window function), SQL-expressible, scale-free — the
  semantics of ``dropDuplicatesWithinWatermark`` in the streaming lift.
  Differs from the reference only when anomalies straddle a bucket edge
  within 120 s of each other.
- ``cooldown_exact``: the reference's exact sequential semantics via
  ``applyInPandas`` per key (anomalies are rare, so per-key groups are
  tiny; the fact stream never passes through Python).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

from sarkac_spark.config import ANOMALY_COOLDOWN_SECONDS


def _epoch_us(df: DataFrame, ts_col: str):
    """Epoch-microseconds column: long columns pass through (already
    epoch-us, e.g. sigma_scan's ``event_ts_us``); timestamps convert."""
    if dict(df.dtypes)[ts_col] in ("bigint", "int", "long"):
        return F.col(ts_col)
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def cooldown_bucketed(
    anomalies: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    cooldown_seconds: int = ANOMALY_COOLDOWN_SECONDS,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep the earliest anomaly per key per aligned cooldown bucket.
    Pass ``tiebreak_cols`` (a unique id) when timestamps can collide, so
    "earliest" is deterministic for oracle comparison."""
    # bucket start in epoch-us — pure integer arithmetic, so the DuckDB
    # oracle (epoch_us - epoch_us % N) is bit-identical
    epoch = _epoch_us(anomalies, ts_col)
    bucket = epoch - (epoch % F.lit(cooldown_seconds * 1_000_000))
    w = W.partitionBy(*key_cols, bucket).orderBy(epoch, *tiebreak_cols)
    return (
        anomalies.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def cooldown_exact(
    anomalies: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    cooldown_seconds: int = ANOMALY_COOLDOWN_SECONDS,
) -> DataFrame:
    """Reference-exact emit-then-suppress: scan each key's anomalies in
    time order; emit one, drop everything in the next ``cooldown`` window,
    emit the next survivor, repeat."""
    schema = anomalies.schema
    cd = pd.Timedelta(seconds=cooldown_seconds)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        keep = []
        last = None
        for i, t in zip(pdf.index, pdf[ts_col]):
            if last is None or (t - last) >= cd:
                keep.append(i)
                last = t
        return pdf.loc[keep]

    return anomalies.groupBy(*key_cols).applyInPandas(scan, schema=schema)

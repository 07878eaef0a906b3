"""Sessionization — gap-based session assignment per key.

The classic lag+cumsum construction (all window functions, one shuffle
on the key):

    new_session = (ts - lag(ts)) > gap  ->  0/1
    session_seq = running sum of new_session  (1-based per key)

Streaming equivalent: ``session_window(ts, gap)`` in Structured
Streaming; this batch form is deterministic and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Attach ``session_seq`` (1-based per key). ``order_tiebreak`` makes
    ordering total when timestamps can collide (required for
    deterministic oracle comparison)."""
    key_cols = list(key_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [us, *[F.col(c) for c in order_tiebreak]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(
        "session_seq", F.sum(new_session).over(running).cast("long")
    )


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-session aggregates: bounds (epoch us), event count, duration."""
    s = sessionize(df, key_cols, ts_col, gap_seconds, order_tiebreak)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        s.groupBy(*key_cols, "session_seq")
        .agg(
            F.min(us).alias("session_start_us"),
            F.max(us).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "duration_us", F.col("session_end_us") - F.col("session_start_us")
        )
    )

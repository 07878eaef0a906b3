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


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    id_tiebreak: str | None = None,
) -> DataFrame:
    """Ordered conversion funnel: how many users reached step k with
    each step STRICTLY after their first occurrence of the previous
    step (view -> click -> purchase, in that temporal order — a
    purchase before any click does not count).

    One window-sort pass computes every step's per-row running state:
    ``reached_k(row) = ts of the first step-k event preceding the row
    that itself followed reached_{k-1}`` — the chained running-min
    trick, all window expressions sharing ONE window spec (one sort,
    one shuffle on the user key). The per-user reduction then takes
    min of each step's valid timestamps, and the final 1-row summary
    counts users per step. Strict ``>`` on epoch micros makes ties
    non-qualifying — deterministic under any sort order of equal
    timestamps, on both engines.

    Returns one row: ``n_step_1..n_step_k`` (users reaching each step).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    staged = df.select(F.col(user_col).alias("__u"), us.alias("__us"),
                       F.col(type_col).alias("__t"),
                       *( [F.col(id_tiebreak)] if id_tiebreak else [] ))
    order = [F.col("__us")] + ([F.col(id_tiebreak)] if id_tiebreak else [])
    w = (
        Window.partitionBy("__u")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # valid_k = this row is step k and the running first valid step k-1
    # happened strictly earlier
    prev_first = None
    valid_cols = []
    for k, step in enumerate(steps):
        if prev_first is None:
            valid = F.when(F.col("__t") == step, F.col("__us"))
        else:
            valid = F.when(
                (F.col("__t") == step) & (prev_first < F.col("__us")),
                F.col("__us"),
            )
        staged = staged.withColumn(f"__v{k}", valid)
        # running min over the SAME window spec — no extra sort
        prev_first = F.min(F.col(f"__v{k}")).over(w)
        valid_cols.append(f"__v{k}")
    per_user = staged.groupBy("__u").agg(
        *[F.min(c).alias(f"__first{k}") for k, c in enumerate(valid_cols)]
    )
    return per_user.agg(
        *[
            F.count(F.col(f"__first{k}")).cast("long").alias(f"n_{step}")
            for k, step in enumerate(steps)
        ]
    )

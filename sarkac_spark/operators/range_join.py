"""Range (interval-containment) join — the bucketized equi-join shape.

``range_join(points, intervals)``: every (key, ts) point joined to every
interval [start, end] of the same key that contains it. Spark's naive
plan for a range predicate is BroadcastNestedLoopJoin (quadratic work
unless one side is tiny); the scale shape is:

    explode each interval into the fixed-width buckets it covers
    bucketize each point to its bucket
    equi-join on (key, bucket)            <- hash join, pruned
    exact filter start <= ts <= end       <- removes bucket false hits

Work is proportional to matches + bucket false positives (bounded by
interval_length/bucket + 2 buckets per interval), never |points| x
|intervals|. Pick ``bucket_seconds`` ~ median interval length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def _us(col):
    return F.unix_micros(F.col(col).cast("timestamp"))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner containment join; output = point columns + interval columns
    (minus the join keys, which appear once)."""
    on = list(on)
    bucket_us = bucket_seconds * 1_000_000

    def bucket_of(col):
        us = _us(col)
        # exact integer bucketing: (us - us % N) / N divides an exact
        # multiple (< 2^53), so the double division is error-free; a bare
        # us / N cast could truncate one bucket off near boundaries
        return ((us - us % bucket_us) / bucket_us).cast("long")

    p = points.withColumn("__bucket", bucket_of(ts_col))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(bucket_of(start_col), bucket_of(end_col))),
    )
    joined = p.join(iv, on=[*on, "__bucket"], how="inner")
    return joined.filter(
        (_us(ts_col) >= _us(start_col)) & (_us(ts_col) <= _us(end_col))
    ).drop("__bucket")

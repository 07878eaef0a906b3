"""Time-series regularization: bucketing, gap fill, forward fill.

The reference's stats plane only ever *reads* trailing windows
(SigmaWindow; see SURVEY §2.4 W1) — it has no answer for irregular or
missing samples. These operators turn an irregular event stream into a
dense, regular per-key series, the precondition for any downstream
rate/seasonality/forecast step.

Scale shape: the dense grid is built from the *aggregated* per-bucket
relation (|keys| x |buckets| rows), never by re-scanning the raw facts;
`F.sequence` generates each key's bucket range map-side from its 1-row
span. The forward-fill window partitions by key and its partition size
is bounded by time-range/bucket (compile-time known), not by raw event
volume — so a 100 TB event table with a 1h bucket over 90 days still
fills at most 2160 rows per key per window partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def bucketize(df: DataFrame, ts_col: str, bucket_seconds: int) -> F.Column:
    """Epoch-aligned bucket start in microseconds (long)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    step = F.lit(bucket_seconds * 1_000_000).cast("long")
    return (us - us % step).alias("bucket_us")


def gap_fill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    round_digits: int = 6,
    agg_expr: Column | None = None,
) -> DataFrame:
    """Dense regular series per key: aggregate ``value_col`` into
    ``bucket_seconds`` buckets, generate every bucket between each key's
    first and last observation, and forward-fill gaps with the last
    observed bucket aggregate (default: the rounded bucket average;
    pass ``agg_expr`` to fill with something else — e.g. an exact
    integer sum when cross-engine hash stability matters, since a
    rounded float average can sit a hair from a 6-decimal tie where
    engines' round() implementations legitimately disagree).

    Returns (keys..., bucket_us, n_obs, v_fill, filled) where ``filled``
    marks rows synthesized for empty buckets. ``v_fill`` is never NULL:
    each key's grid starts at its own first observed bucket, so the
    carry-forward always has a seed.
    """
    keys = list(keys)
    step = bucket_seconds * 1_000_000
    if agg_expr is None:
        agg_expr = F.round(F.avg(value_col), round_digits)
    obs = (
        df.groupBy(*keys, bucketize(df, ts_col, bucket_seconds))
        .agg(
            agg_expr.alias("v_obs"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    spans = obs.groupBy(*keys).agg(
        F.min("bucket_us").alias("__lo"), F.max("bucket_us").alias("__hi")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step).cast("long"))
        ).alias("bucket_us"),
    )
    joined = grid.join(obs, [*keys, "bucket_us"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *keys,
        "bucket_us",
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
        F.last("v_obs", ignorenulls=True).over(w).alias("v_fill"),
        F.col("n_obs").isNull().alias("filled"),
    )


def series_correlation(
    df: DataFrame,
    series_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    min_buckets: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlation between metric series over aligned
    time buckets — the "which metrics move together" view that turns a
    per-series anomaly into a correlated-failure diagnosis (and flags
    redundant series worth deduplicating).

    Shape: ONE scan -> per-(series, bucket) aggregation (the only
    data-sized shuffle); the pair relation is an equi-join of the
    bucketed series on bucket — per-bucket fan-out is |series|^2, never
    the raw row count — then one pair-level aggregation over
    |series|^2 x |buckets| rows.

    Cross-engine FP contract: bucket means are exact-integer cents over
    counts (the rolling_hourly_stats tie-free construction), so both
    engines correlate IDENTICAL doubles; only the final pair sums are
    float, absorbed by round().

    Output: (series_a, series_b, n_buckets, corr), series_a < series_b,
    zero-variance and sub-``min_buckets`` pairs dropped.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    hourly = (
        df.groupBy(
            F.col(series_col).alias("s"),
            bucketize(df, ts_col, bucket_seconds).alias("bucket_us"),
        )
        .agg(F.sum(cents).alias("v_cents"), F.count(F.lit(1)).alias("n_obs"))
        .select(
            "s",
            "bucket_us",
            (F.col("v_cents") / (F.lit(100.0) * F.col("n_obs"))).alias("m"),
        )
    )
    a = hourly.select(
        F.col("s").alias("series_a"), "bucket_us", F.col("m").alias("ma")
    )
    b = hourly.select(
        F.col("s").alias("series_b"), "bucket_us", F.col("m").alias("mb")
    )
    p = (
        a.join(b, "bucket_us")
        .filter(F.col("series_a") < F.col("series_b"))
        .groupBy("series_a", "series_b")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("ma").alias("sa"),
            F.sum("mb").alias("sb"),
            F.sum(F.col("ma") * F.col("mb")).alias("sab"),
            F.sum(F.col("ma") * F.col("ma")).alias("saa"),
            F.sum(F.col("mb") * F.col("mb")).alias("sbb"),
        )
    )
    n = F.col("n_buckets")
    var_a = n * F.col("saa") - F.col("sa") * F.col("sa")
    var_b = n * F.col("sbb") - F.col("sb") * F.col("sb")
    corr = (n * F.col("sab") - F.col("sa") * F.col("sb")) / (
        F.sqrt(var_a) * F.sqrt(var_b)
    )
    return (
        p.filter((n >= min_buckets) & (var_a > 0) & (var_b > 0))
        .select(
            "series_a",
            "series_b",
            "n_buckets",
            F.round(corr, round_digits).alias("corr"),
        )
    )

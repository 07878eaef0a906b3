"""Sequential control-chart detectors: CUSUM, EWMA, seasonal baseline.

The reference's only detector is the stateless per-point 3-sigma rule
(lib/dsl/DSLHandler.js:191-192). That rule is blind to two failure
classes every production monitor eventually hits:

- **small persistent shifts** — a level change of 1 sigma never trips a
  3-sigma gate, but a CUSUM accumulates it in ~9 points (Page 1954);
- **time-of-day structure** — a nightly dip is "anomalous" against a
  flat 24 h baseline but perfectly normal against an hour-of-day one.

These detectors extend the anomaly family (sigma / online / robust /
IQR, operators/anomaly.py) with the sequential members. All are pure
DataFrame plans — no Python in the hot path — and every one is
oracle-checkable SQL.

Scale shapes:

- ``cusum_scan``: the textbook recursion ``c_t = max(0, c_{t-1} + z_t - k)``
  is not a window aggregate, but it has a closed prefix form
  (the reflection trick): with ``S_t = sum_{i<=t}(z_i - k)``,
  ``c_t = S_t - min_{i<=t} S_i``. Running sum and running min are both
  add-only prefix frames — O(n log n) sort per series, incremental
  evaluation, never a sliding re-scan. One shuffle on the series key
  (+ one tiny stats broadcast).
- ``ewma_scan``: truncated-kernel EWMA over an aggregated bucket series
  via k ``lag()`` reads sharing ONE window spec (one sort of the tiny
  per-bucket relation, constant work per row). lambda = 1/2 makes every
  kernel weight an exact power of two — bit-identical cross-engine
  (same trick as stats.decayed_stats).
- ``seasonal_sigma_scan``: groupBy (series, hour-of-day) stats +
  broadcast-join scoring — the sigma_scan shape with a season column in
  the key; stats side is |series| x 24 rows, always broadcastable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from sarkac_spark.config import MIN_EVENTS_FOR_STATS

# Standard CUSUM tuning (Montgomery, *Statistical Quality Control*):
# reference value k = 0.5 sigma detects ~1-sigma shifts fastest;
# decision interval h = 5 sigma gives ~370-sample in-control ARL.
CUSUM_K = 0.5
CUSUM_H = 5.0


def cusum_scan(
    df: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    ts_col: str = "ts",
    id_cols: Sequence[str] = ("event_id",),
    k: float = CUSUM_K,
    h: float = CUSUM_H,
    min_count: int = MIN_EVENTS_FOR_STATS,
    round_digits: int = 6,
) -> DataFrame:
    """Two-sided CUSUM changepoint scan: flag every point where the
    accumulated standardized drift exceeds ``h`` sigma.

    ``z_t = (x_t - mean) / stddev`` (per-series global stats, rounded to
    ``round_digits`` before standardizing so both engines feed identical
    z values); ``cusum_hi = S_t - min(S_i, i<=t)`` with
    ``S_t = sum(z_i - k)`` catches upward shifts, and symmetrically
    ``cusum_lo = max(S'_i) - S'_t`` with ``S'_t = sum(z_i + k)`` catches
    downward ones. Ordering is (epoch_us, id) — a total order, so the
    running sums are deterministic and oracle-comparable.

    Output: one row per flagged point with both arms and the direction.
    """
    group_cols = list(group_cols)
    id_cols = list(id_cols)
    stats = df.groupBy(*group_cols).agg(
        F.round(F.avg(value_col), round_digits).alias("__mu"),
        F.round(F.stddev_pop(value_col), round_digits).alias("__sd"),
        F.count(value_col).alias("__n"),
    )
    base = (
        df.join(F.broadcast(stats), on=group_cols)
        .filter((F.col("__n") >= min_count) & (F.col("__sd") > 0))
        .select(
            *group_cols,
            *id_cols,
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
            F.col(value_col).cast("double").alias("__x"),
            F.round(
                (F.col(value_col) - F.col("__mu")) / F.col("__sd"), round_digits
            ).alias("__z"),
        )
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("ts_us", *id_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s_hi = F.sum(F.col("__z") - F.lit(k)).over(w)
    s_lo = F.sum(F.col("__z") + F.lit(k)).over(w)
    cusum_hi = s_hi - F.least(F.min(s_hi).over(w), F.lit(0.0))
    cusum_lo = F.greatest(F.max(s_lo).over(w), F.lit(0.0)) - s_lo
    scored = base.select(
        *group_cols,
        *id_cols,
        "ts_us",
        F.col("__x").alias("value"),
        F.round(cusum_hi, round_digits).alias("cusum_hi"),
        F.round(cusum_lo, round_digits).alias("cusum_lo"),
    ).filter((F.col("cusum_hi") > h) | (F.col("cusum_lo") > h))
    # After a large swing following sustained drift both arms can exceed h
    # on the same row; label that honestly instead of masking the down-trip.
    return scored.withColumn(
        "direction",
        F.when((F.col("cusum_hi") > h) & (F.col("cusum_lo") > h), F.lit("both"))
        .when(F.col("cusum_hi") > h, F.lit("up"))
        .otherwise(F.lit("down")),
    )


# truncated-kernel length: 8 lags of lambda=1/2 cover 1 - 2^-8 = 99.6%
# of the kernel mass; the normalizer makes the truncation exact.
EWMA_LAGS = 8


def ewma_scan(
    df: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    n_lags: int = EWMA_LAGS,
    limit_sigma: float = 3.0,
    min_count: int = MIN_EVENTS_FOR_STATS,
    round_digits: int = 6,
) -> DataFrame:
    """EWMA control chart over the bucketed series: flag buckets whose
    exponentially weighted moving average leaves the control band
    ``mu +/- limit_sigma * sd * sqrt(lambda / (2 - lambda))``
    (the asymptotic EWMA variance, Roberts 1959), lambda = 1/2.

    The EWMA is the truncated kernel
    ``sum_{j=0..L-1} 2^-(j+1) * x_{t-j} / sum_j 2^-(j+1)`` over the
    per-bucket means — L ``lag()`` reads on ONE window spec (single sort
    of the aggregated |series| x |buckets| relation, which is orders of
    magnitude smaller than the facts). Missing lags (series head) drop
    out of both numerator and normalizer, so early buckets use the
    renormalized shorter kernel rather than a NULL. All weights are
    exact powers of two -> bit-identical cross-engine; bucket means are
    rounded before the kernel so both engines convolve identical inputs.

    Gap semantics: the kernel convolves over *existing* buckets — empty
    buckets are absent from the aggregated relation, so ``lag(j)`` reads
    the previous observed bucket, not the previous wall-clock one. For
    sparse series this compresses the effective time constant (the chart
    reacts to the last L observations, however far apart). Densify the
    grid upstream (``timeseries.gap_fill``) when wall-clock-uniform
    smoothing is required.
    """
    group_cols = list(group_cols)
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # pmod keeps buckets floor-aligned for pre-1970 (negative) epochs too
    bucket_us = epoch - F.pmod(epoch, F.lit(bucket_seconds * 1_000_000))
    buckets = df.groupBy(*group_cols, bucket_us.alias("bucket_us")).agg(
        F.round(F.avg(value_col), round_digits).alias("v")
    )
    stats = buckets.groupBy(*group_cols).agg(
        F.round(F.avg("v"), round_digits).alias("mu"),
        F.round(F.stddev_pop("v"), round_digits).alias("sd"),
        F.count(F.lit(1)).alias("nb"),
    )
    w = Window.partitionBy(*group_cols).orderBy("bucket_us")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(n_lags):
        weight = 1.0 / (1 << (j + 1))  # exact power of two
        x_j = F.lag("v", j).over(w)
        num = num + F.when(x_j.isNotNull(), F.lit(weight) * x_j).otherwise(F.lit(0.0))
        den = den + F.when(x_j.isNotNull(), F.lit(weight)).otherwise(F.lit(0.0))
    ewma = F.round(num / den, round_digits)
    # lambda/(2-lambda) = 1/3 for lambda = 1/2
    band = F.lit(limit_sigma) * F.col("sd") * F.sqrt(F.lit(1.0 / 3.0))
    joined = (
        buckets.join(F.broadcast(stats), on=group_cols)
        .filter((F.col("nb") >= min_count) & (F.col("sd") > 0))
        .withColumn("ewma", ewma)
    )
    return (
        joined.filter(F.abs(F.col("ewma") - F.col("mu")) > band)
        .select(
            *group_cols,
            "bucket_us",
            "v",
            "ewma",
            "mu",
            "sd",
            F.round(F.col("mu") - band, round_digits).alias("band_lo"),
            F.round(F.col("mu") + band, round_digits).alias("band_hi"),
        )
    )


def seasonal_sigma_scan(
    df: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    ts_col: str = "ts",
    id_cols: Sequence[str] = ("event_id",),
    z_threshold: float = 3.0,
    min_count: int = MIN_EVENTS_FOR_STATS,
    round_digits: int = 6,
) -> DataFrame:
    """Sigma scoring against an hour-of-day seasonal baseline: each value
    is compared to the stats of its own (series, hour) cell, so diurnal
    structure is part of the model instead of part of the noise.

    Same plan as sigma_scan with the season in the group key: one
    grouped aggregation (|series| x 24 rows — always broadcast), then a
    map-only scoring join. Hour extraction is integer arithmetic on
    epoch micros (identical on both engines, no timezone dependence);
    ``pmod`` wraps pre-1970 (negative) epochs into [0, 24) correctly.

    Internal columns are ``__``-prefixed (anomaly.py convention) so an
    input that already carries e.g. an ``n`` column cannot collide into
    AMBIGUOUS_REFERENCE; the final select re-aliases to the public names.
    """
    group_cols = list(group_cols)
    id_cols = list(id_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # (pmod(us, day) - pmod(us, hour)) is an exact multiple of
    # 3_600_000_000, so the division is exact in IEEE doubles — no
    # truncation-boundary FP risk; pmod keeps the remainders non-negative.
    hour = (
        (F.pmod(us, F.lit(86_400_000_000)) - F.pmod(us, F.lit(3_600_000_000)))
        / F.lit(3_600_000_000)
    ).cast("int")
    facts = df.withColumn("__hour_of_day", hour)
    stats = facts.groupBy(*group_cols, "__hour_of_day").agg(
        F.round(F.avg(value_col), round_digits).alias("__season_mean"),
        F.round(F.stddev_pop(value_col), round_digits).alias("__season_sd"),
        F.count(value_col).alias("__n"),
    )
    joined = facts.join(
        F.broadcast(stats), on=[*group_cols, "__hour_of_day"]
    ).filter((F.col("__n") >= min_count) & (F.col("__season_sd") > 0))
    z = (F.col(value_col) - F.col("__season_mean")) / F.col("__season_sd")
    return (
        joined.withColumn("__season_z", F.round(z, round_digits))
        .filter(F.abs(F.col("__season_z")) > z_threshold)
        .select(
            F.col(group_cols[0]).alias("topic"),
            F.col("__hour_of_day").alias("hour_of_day"),
            *id_cols,
            F.col(value_col).alias("value"),
            F.col("__season_mean").alias("season_mean"),
            F.col("__season_sd").alias("season_sd"),
            F.col("__season_z").alias("season_z"),
        )
    )

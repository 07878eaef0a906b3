"""Driver queries + DuckDB oracles for the sequential control-chart
detectors (operators/control.py): CUSUM, EWMA, seasonal baseline.

These extend the reference's stateless per-point 3-sigma rule
(lib/dsl/DSLHandler.js:191-192) with the sequential detector family; see
operators/control.py for the scale shapes. Every query is exact
closed-form SQL, so all three get full value-hash oracle rows.

Cross-engine FP determinism: inputs to every running sum / kernel are
``round(x, 6)``-ed first, ordering keys are total orders
(ts_us, event_id), and kernel weights are exact powers of two — both
engines then execute the identical sequence of IEEE double ops.
"""

from __future__ import annotations

from sarkac_spark.config import MIN_EVENTS_FOR_STATS
from sarkac_spark.operators.control import (
    CUSUM_H,
    CUSUM_K,
    EWMA_LAGS,
    cusum_scan,
    ewma_scan,
    seasonal_sigma_scan,
)
from sarkac_spark.sources.tables import load_table

EWMA_BUCKET_SECONDS = 3600
EWMA_LIMIT_SIGMA = 2.0  # 3 sigma flags nothing on the synthetic series
SEASONAL_Z = 3.0


def _floor_mod(expr: str, m: int) -> str:
    """DuckDB % is sign-of-dividend; the Spark operators use pmod. Mirror
    floor-mod in the oracle so pre-1970 (negative-epoch) timestamps align
    buckets / hours identically on both engines."""
    return f"((({expr}) % {m}) + {m}) % {m}"


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def q_cusum_scan(spark, sf_dir):
    """Two-sided CUSUM changepoint scan per event_type (k=0.5, h=5)."""
    return cusum_scan(_events(spark, sf_dir))


def q_ewma_scan(spark, sf_dir):
    """EWMA control chart over hourly bucket means (lambda=1/2)."""
    return ewma_scan(
        _events(spark, sf_dir),
        bucket_seconds=EWMA_BUCKET_SECONDS,
        limit_sigma=EWMA_LIMIT_SIGMA,
    )


def q_seasonal_sigma(spark, sf_dir):
    """3-sigma scoring against the (event_type, hour-of-day) baseline."""
    return seasonal_sigma_scan(_events(spark, sf_dir), z_threshold=SEASONAL_Z)


def _cusum_sql() -> str:
    k, h, n = CUSUM_K, CUSUM_H, MIN_EVENTS_FOR_STATS
    return f"""
WITH stats AS (
  SELECT event_type,
         round(avg(value), 6) AS mu,
         round(stddev_pop(value), 6) AS sd,
         count(value) AS n
  FROM events GROUP BY 1
),
base AS (
  SELECT e.event_type, e.event_id, epoch_us(e.ts) AS ts_us, e.value AS x,
         round((e.value - s.mu) / s.sd, 6) AS z
  FROM events e JOIN stats s USING (event_type)
  WHERE s.n >= {n} AND s.sd > 0
),
c1 AS (
  SELECT *, sum(z - {k}) OVER w AS s_hi, sum(z + {k}) OVER w AS s_lo
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
c2 AS (
  SELECT event_type, event_id, ts_us, x,
         round(s_hi - least(min(s_hi) OVER w, 0.0), 6) AS cusum_hi,
         round(greatest(max(s_lo) OVER w, 0.0) - s_lo, 6) AS cusum_lo
  FROM c1
  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, event_id, ts_us, x AS value, cusum_hi, cusum_lo,
       CASE WHEN cusum_hi > {h} AND cusum_lo > {h} THEN 'both'
            WHEN cusum_hi > {h} THEN 'up' ELSE 'down' END AS direction
FROM c2 WHERE cusum_hi > {h} OR cusum_lo > {h}
"""


def _ewma_sql() -> str:
    bucket_us = EWMA_BUCKET_SECONDS * 1_000_000
    num_terms, den_terms = [], []
    for j in range(EWMA_LAGS):
        weight = 1.0 / (1 << (j + 1))  # exact power of two
        lag = f"lag(v, {j}) OVER w"
        num_terms.append(
            f"CASE WHEN {lag} IS NOT NULL THEN {weight!r} * {lag} ELSE 0.0 END"
        )
        den_terms.append(
            f"CASE WHEN {lag} IS NOT NULL THEN {weight!r} ELSE 0.0 END"
        )
    num = "\n       + ".join(num_terms)
    den = "\n       + ".join(den_terms)
    return f"""
WITH buckets AS (
  SELECT event_type,
         epoch_us(ts) - {_floor_mod("epoch_us(ts)", bucket_us)} AS bucket_us,
         round(avg(value), 6) AS v
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         round(avg(v), 6) AS mu,
         round(stddev_pop(v), 6) AS sd,
         count(*) AS nb
  FROM buckets GROUP BY 1
),
kern AS (
  SELECT b.event_type, b.bucket_us, b.v, s.mu, s.sd, s.nb,
         round(({num})
             / ({den}), 6) AS ewma
  FROM buckets b JOIN stats s USING (event_type)
  WHERE s.nb >= {MIN_EVENTS_FOR_STATS} AND s.sd > 0
  WINDOW w AS (PARTITION BY b.event_type ORDER BY b.bucket_us)
)
SELECT event_type, bucket_us, v, ewma, mu, sd,
       round(mu - {EWMA_LIMIT_SIGMA} * sd * sqrt(1.0 / 3.0), 6) AS band_lo,
       round(mu + {EWMA_LIMIT_SIGMA} * sd * sqrt(1.0 / 3.0), 6) AS band_hi
FROM kern
WHERE abs(ewma - mu) > {EWMA_LIMIT_SIGMA} * sd * sqrt(1.0 / 3.0)
"""


def _seasonal_sql() -> str:
    return f"""
WITH f AS (
  SELECT event_type, event_id, value,
         CAST(({_floor_mod("epoch_us(ts)", 86400000000)}
               - {_floor_mod("epoch_us(ts)", 3600000000)})
              / 3600000000 AS INT) AS hour_of_day
  FROM events
),
s AS (
  SELECT event_type, hour_of_day,
         round(avg(value), 6) AS season_mean,
         round(stddev_pop(value), 6) AS season_sd,
         count(value) AS n
  FROM f GROUP BY 1, 2
)
SELECT f.event_type AS topic, f.hour_of_day, f.event_id, f.value,
       s.season_mean, s.season_sd,
       round((f.value - s.season_mean) / s.season_sd, 6) AS season_z
FROM f JOIN s USING (event_type, hour_of_day)
WHERE s.n >= {MIN_EVENTS_FOR_STATS} AND s.season_sd > 0
  AND abs(round((f.value - s.season_mean) / s.season_sd, 6)) > {SEASONAL_Z}
"""


QUERIES = {
    "cusum_scan": q_cusum_scan,
    "ewma_scan": q_ewma_scan,
    "seasonal_sigma": q_seasonal_sigma,
}

ORACLE = {
    "cusum_scan": _cusum_sql(),
    "ewma_scan": _ewma_sql(),
    "seasonal_sigma": _seasonal_sql(),
}

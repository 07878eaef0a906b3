"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; each ``queries()[name]`` runs at
sf=0.01 and is compared against ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).

Implementation lives in ``sarkac_spark``; this module only wires the
driver contract. Float-valued aggregates are rounded to a fixed number of
digits on BOTH sides so engine-specific summation order can't flip the
value hash.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sarkac_spark.operators.anomaly import sigma_scan
from sarkac_spark.operators.stats import total_count, trailing_window_stats, with_as_of
from sarkac_spark.sources.tables import load_table

SIGMA_WINDOWS = (3600, 43200, 86400, 604800)  # 1h/12h/1d (reference freq windows) + 1w


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-window 3-sigma anomaly scan over events (sf0.001)."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return sigma_scan(events, windows=SIGMA_WINDOWS)


# --- queries -------------------------------------------------------------


def _q_sigma_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sigma_scan(events, windows=SIGMA_WINDOWS).drop("props")


def _q_trailing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    stats = trailing_window_stats(
        events, ["event_type"], "value", "ts", SIGMA_WINDOWS
    )
    return stats.select(
        "event_type",
        "window_seconds",
        F.round("mean", 6).alias("mean"),
        F.round("stddev_pop", 6).alias("stddev_pop"),
        "n",
    )


def _q_total_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return total_count(load_table(spark, sf_dir, "events"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "sigma_scan": _q_sigma_scan,
        "trailing_stats": _q_trailing_stats,
        "total_count": _q_total_count,
    }


# --- oracle SQL (DuckDB) ---------------------------------------------------

_WINS_VALUES = (
    "(VALUES (BIGINT '3600','1h'), (BIGINT '43200','12h'), (BIGINT '86400','1d'),"
    " (BIGINT '604800','1w')) AS w(window_seconds, human_window)"
)

_ORACLE: dict[str, str] = {
    "sigma_scan": f"""
WITH eval_at AS (SELECT max(ts) AS as_of FROM events),
wins AS (SELECT * FROM {_WINS_VALUES}),
stats AS (
  SELECT e.event_type, w.window_seconds, w.human_window,
         avg(e.value) AS mean, stddev_pop(e.value) AS sd, count(e.value) AS n
  FROM events e, eval_at a, wins w
  WHERE epoch_us(e.ts) >= epoch_us(a.as_of) - w.window_seconds * 1000000
  GROUP BY 1, 2, 3
)
SELECT e.event_type AS topic,
       'value' AS path,
       s.window_seconds,
       s.human_window,
       e.value AS value,
       round(s.mean, 6) AS median,
       round(s.sd, 6) AS std_dev,
       round((e.value - s.mean) / (3 * s.sd), 6) AS three_sigma,
       e.event_id,
       e.user_id
FROM events e
CROSS JOIN eval_at a
JOIN stats s ON e.event_type = s.event_type
WHERE s.n >= 3 AND s.sd > 0
  AND epoch_us(e.ts) >= epoch_us(a.as_of) - s.window_seconds * 1000000
  AND abs((e.value - s.mean) / (3 * s.sd)) > 1
""",
    "trailing_stats": f"""
WITH eval_at AS (SELECT max(ts) AS as_of FROM events),
wins AS (SELECT * FROM {_WINS_VALUES})
SELECT e.event_type, w.window_seconds,
       round(avg(e.value), 6) AS mean,
       round(stddev_pop(e.value), 6) AS stddev_pop,
       count(e.value) AS n
FROM events e, eval_at a, wins w
WHERE epoch_us(e.ts) >= epoch_us(a.as_of) - w.window_seconds * 1000000
GROUP BY 1, 2
HAVING count(e.value) >= 3
""",
    "total_count": "SELECT count(*) AS n_events FROM events",
}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)

"""Core reference-parity queries (SURVEY.md §2.1-§2.5) over the driver's
``events`` table: ``event_type`` plays the role of the Kafka topic,
``value`` the tracked numeric field, ``props`` the nested-JSON payload.

Every query has a DuckDB oracle. Portability rules used throughout:
- float aggregates rounded to 6 digits on both sides;
- hashes via md5 (identical across engines; the reference's murmur3 ids
  are opaque tokens, SURVEY.md §2.2 P7);
- time arithmetic in epoch microseconds (integers — bit-identical);
- try_cast for JSON numeric extraction (null-on-miss on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sarkac_spark.functions.paths import numeric_leaf
from sarkac_spark.operators.anomaly import (
    iqr_outliers,
    online_sigma_scan,
    robust_sigma_scan,
    sigma_scan,
)
from sarkac_spark.operators.cooldown import cooldown_bucketed
from sarkac_spark.operators.fields import to_sigma_store
from sarkac_spark.operators.stats import (
    decayed_stats,
    latest_by_key,
    rate_series,
    retention_filter,
    total_count,
    trailing_percentiles,
    trailing_window_stats,
)
from sarkac_spark.sources.tables import load_table

SIGMA_WINDOWS = (3600, 43200, 86400, 604800)  # 1h/12h/1d (reference freq windows) + 1w

_WINS_VALUES = (
    "(VALUES (BIGINT '3600','1h'), (BIGINT '43200','12h'), (BIGINT '86400','1d'),"
    " (BIGINT '604800','1w')) AS w(window_seconds, human_window)"
)

# the store fan-out used by multi-field queries: the raw value column plus
# the props.k JSON leaf (P1 path projection)
_STORE_FIELDS = ("value", "props.k")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _store(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return to_sigma_store(
        ev,
        topic_col="event_type",
        ts_col="ts",
        fields={"value": F.col("value"), "props.k": numeric_leaf("props", "k")},
        extra_cols=["event_id"],
    )


_STORE_SQL = """
  SELECT event_type AS topic, ts AS produced, event_id,
         'value' AS field_path, value
  FROM events WHERE value IS NOT NULL
  UNION ALL
  SELECT event_type, ts, event_id, 'props.k',
         TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)
  FROM events WHERE TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL
"""


# --- S1-ish flagship + stats (A1, A2, A3, A5, A6, P6, W1, W2) -------------


def q_sigma_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sigma_scan(_events(spark, sf_dir), windows=SIGMA_WINDOWS).drop("props")


def q_trailing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = trailing_window_stats(
        _events(spark, sf_dir), ["event_type"], "value", "ts", SIGMA_WINDOWS
    )
    return stats.select(
        "event_type",
        "window_seconds",
        F.round("mean", 6).alias("mean"),
        F.round("stddev_pop", 6).alias("stddev_pop"),
        "n",
    )


def q_total_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return total_count(_events(spark, sf_dir))  # A4


def q_trailing_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A1 *improvement*: the reference computes a mean but labels it
    "median" (SigmaModel.js:48 admits it); Spark has an exact
    distributed median — per (event_type, trailing window), both the true
    median and the reference's mean, same one-pass conditional-agg shape."""
    from sarkac_spark.operators.stats import with_as_of

    ev = with_as_of(_events(spark, sf_dir), ts_col="ts", as_of_col="__as_of")
    aggs = []
    for w in SIGMA_WINDOWS:
        in_win = F.unix_micros(F.col("ts").cast("timestamp")) >= (
            F.unix_micros(F.col("__as_of").cast("timestamp"))
            - F.lit(w * 1_000_000)
        )
        cond_val = F.when(in_win, F.col("value"))
        aggs.append(F.round(F.median(cond_val), 6).alias(f"__med_{w}"))
        aggs.append(F.round(F.avg(cond_val), 6).alias(f"__mean_{w}"))
        aggs.append(F.count(cond_val).alias(f"__n_{w}"))
    wide = ev.groupBy("event_type").agg(*aggs)
    stack_args = ", ".join(
        f"bigint({w}), __med_{w}, __mean_{w}, __n_{w}" for w in SIGMA_WINDOWS
    )
    return wide.selectExpr(
        "event_type",
        f"stack({len(SIGMA_WINDOWS)}, {stack_args})"
        " AS (window_seconds, true_median, mislabeled_mean, n)",
    ).filter(F.col("n") >= 3)


def q_trailing_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail stats per (topic, trailing window): exact interpolated
    p50/p95/p99 — what heavy-tailed series are actually alerted on."""
    return trailing_percentiles(
        _events(spark, sf_dir), ["event_type"], "value", "ts", SIGMA_WINDOWS
    )


DECAY_HALF_LIFE = 43200  # 12h — the reference's middle frequency window


def q_decayed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed mean per topic — soft-window replacement for
    the fixed trailing windows."""
    return decayed_stats(
        _events(spark, sf_dir), ["event_type"], "value", "ts", DECAY_HALF_LIFE
    )


def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outliers per topic — the distribution-free member of
    the anomaly family."""
    return iqr_outliers(_events(spark, sf_dir))


def q_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert compaction: each user's newest event (CDC log->snapshot;
    the batch analogue of the streaming per-key value store)."""
    ev = latest_by_key(
        _events(spark, sf_dir), ["user_id"], "ts", tiebreak_cols=["event_id"]
    )
    return ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
        "value",
    )


def q_robust_sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust scoring — outlier bursts can't drag the
    baseline (masking), unlike the reference's mean-based scan."""
    return robust_sigma_scan(_events(spark, sf_dir), windows=SIGMA_WINDOWS)


# --- P1/P2/P3/P4: projection & filters ------------------------------------


def q_path_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        "event_type",
        numeric_leaf("props", "k").alias("k_value"),
    ).filter(F.col("k_value").isNotNull())


def q_sigma_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _store(spark, sf_dir)
    return st.select(
        "topic",
        "field_path",
        "value",
        F.unix_micros(F.col("produced").cast("timestamp")).alias("produced_us"),
        "event_id",
    )


# --- A6/W2: multi-field x multi-window fan-out -----------------------------


def q_multi_field_sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _store(spark, sf_dir)
    return sigma_scan(
        st,
        group_cols=("topic", "field_path"),
        value_col="value",
        ts_col="produced",
        windows=(86400, 604800),
        path_col="field_path",
    )


# --- S6/W3: retention -------------------------------------------------------


def q_retention_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    kept = retention_filter(ev, "ts", 604800)
    return kept.groupBy(F.col("event_type")).agg(F.count(F.lit(1)).alias("n_kept"))


# --- P7: series-key hashing -------------------------------------------------


def q_series_key_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _store(spark, sf_dir)
    return (
        st.select("topic", "field_path")
        .distinct()
        .withColumn("series_key", F.md5(F.concat_ws(":", "topic", "field_path")))
    )


# --- P9/E1/E2: topic sets ----------------------------------------------------

_KNOWN_TOPICS = ("click", "view", "legacy_topic")
_BLACKLIST = ("error",)


def q_topic_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.select(F.col("event_type").alias("topic"))
        .distinct()
        .filter(~F.col("topic").isin(*_BLACKLIST))
    )


def q_topic_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one full-outer join instead of two anti-joins: the two-leg version
    # scanned + distinct-aggregated the fact table twice
    ev = _events(spark, sf_dir)
    current = (
        ev.select(F.col("event_type").alias("topic"))
        .distinct()
        .withColumn("__cur", F.lit(1))
    )
    known = spark.createDataFrame(
        [(t,) for t in _KNOWN_TOPICS], "topic string"
    ).withColumn("__known", F.lit(1))
    j = current.join(known, "topic", "full_outer")
    return (
        j.filter(F.col("__cur").isNull() | F.col("__known").isNull())
        .select(
            "topic",
            F.when(F.col("__known").isNull(), F.lit("created"))
            .otherwise(F.lit("deleted"))
            .alias("change"),
        )
    )


# --- W6: cooldown dedup ------------------------------------------------------


def q_anomaly_cooldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    anomalies = sigma_scan(
        _events(spark, sf_dir), windows=(86400,), keep_ts=True
    ).drop("props")
    return cooldown_bucketed(
        anomalies,
        key_cols=("topic", "path", "window_seconds"),
        ts_col="event_ts_us",
        tiebreak_cols=("event_id",),
    )


# --- W7: message-rate anomalies ----------------------------------------------


def q_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    buckets = rate_series(ev, ["event_type"], "ts", 3600).drop("bucket_ts")
    stats = buckets.groupBy("event_type").agg(
        F.avg("n").alias("mean"),
        F.stddev_pop("n").alias("sd"),
        F.count(F.lit(1)).alias("nb"),
    )
    joined = buckets.join(F.broadcast(stats), "event_type")
    score = (F.col("n") - F.col("mean")) / (F.lit(3.0) * F.col("sd"))
    return (
        joined.filter((F.col("nb") >= 3) & (F.col("sd") > 0) & (F.abs(score) > 1))
        .select(
            F.col("event_type").alias("topic"),
            F.lit("__topic_frequency").alias("path"),
            "bucket_us",
            "n",
            F.round("mean", 6).alias("median"),
            F.round("sd", 6).alias("std_dev"),
            F.round(score, 6).alias("three_sigma"),
        )
    )


# --- as-of join (custom operator Spark lacks; DuckDB ASOF JOIN oracle) ------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup: for every 'error' event, the most recent
    'click' by the same user at-or-before it (operators/asof.py — the
    union+window as-of join, one shuffle, no Python)."""
    from sarkac_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", us.alias("error_ts_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value"),
        us.alias("click_ts_us"),
    )
    return asof_join(
        errors, clicks, on=["user_id"], left_ts="ts", right_ts="ts"
    ).drop("ts")


# --- P5/S3/P7: anomaly output payload ----------------------------------------


def q_anomaly_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = sigma_scan(_events(spark, sf_dir), windows=(86400,), keep_ts=True)
    win_str = F.col("window_seconds").cast("string")
    anomaly_id = F.md5(
        F.concat_ws(
            ":", "topic", "path", win_str, F.col("event_ts_us").cast("string")
        )
    )
    kafka_key = F.md5(F.concat_ws(":", "topic", "path", win_str))
    payload = F.concat(
        F.lit('{"id":"'),
        anomaly_id,
        F.lit('","topic":"'),
        F.col("topic"),
        F.lit('","path":"'),
        F.col("path"),
        F.lit('","window":'),
        win_str,
        F.lit(',"value":'),
        F.round(F.col("value"), 2).cast("decimal(18,2)").cast("string"),
        F.lit("}"),
    )
    return a.select(kafka_key.alias("key"), payload.alias("value"))


def q_online_sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 at zero staleness: every event scored against the trailing-1d
    stats of the strictly-earlier events of its type (the streaming
    ``stateful_sigma_scan``'s batch twin — same semantics, oracle-checked
    here against DuckDB's RANGE-frame window functions)."""
    return online_sigma_scan(
        _events(spark, sf_dir), window_seconds=86400
    ).withColumnRenamed("event_type", "topic")


QUERIES = {
    "sigma_scan": q_sigma_scan,
    "online_sigma": q_online_sigma,
    "trailing_stats": q_trailing_stats,
    "total_count": q_total_count,
    "path_projection": q_path_projection,
    "sigma_store": q_sigma_store,
    "multi_field_sigma": q_multi_field_sigma,
    "retention_prune": q_retention_prune,
    "series_key_hash": q_series_key_hash,
    "topic_blacklist": q_topic_blacklist,
    "topic_diff": q_topic_diff,
    "anomaly_cooldown": q_anomaly_cooldown,
    "rate_anomaly": q_rate_anomaly,
    "anomaly_payload": q_anomaly_payload,
    "asof_join": q_asof_join,
    "trailing_median": q_trailing_median,
    "robust_sigma": q_robust_sigma,
    "trailing_percentiles": q_trailing_percentiles,
    "latest_events": q_latest_events,
    "decayed_stats": q_decayed_stats,
    "iqr_outliers": q_iqr_outliers,
}


ORACLE = {
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
    "online_sigma": """
WITH scored AS (
  SELECT event_type AS topic, event_id, epoch_us(ts) AS event_ts_us, value,
         avg(value) OVER w AS mean,
         stddev_pop(value) OVER w AS sd,
         count(value) OVER w AS n
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
               RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)
)
SELECT topic, event_id, event_ts_us, value,
       round(mean, 6) AS median,
       round(sd, 6) AS std_dev,
       round((value - mean) / (3 * sd), 6) AS three_sigma
FROM scored
WHERE n >= 3 AND sd > 0 AND abs((value - mean) / (3 * sd)) > 1
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
    "trailing_median": f"""
WITH eval_at AS (SELECT max(ts) AS as_of FROM events),
wins AS (SELECT * FROM {_WINS_VALUES})
SELECT e.event_type, w.window_seconds,
       round(median(e.value), 6) AS true_median,
       round(avg(e.value), 6) AS mislabeled_mean,
       count(e.value) AS n
FROM events e, eval_at a, wins w
WHERE epoch_us(e.ts) >= epoch_us(a.as_of) - w.window_seconds * 1000000
GROUP BY 1, 2
HAVING count(e.value) >= 3
""",
    "decayed_stats": """
WITH eval_at AS (SELECT max(ts) AS as_of FROM events),
wk AS (
  SELECT e.event_type, e.value,
         1.0 / (1::BIGINT << least(
           ((epoch_us(a.as_of) - epoch_us(e.ts)) // (BIGINT '43200' * 1000000)),
           40))::DOUBLE AS w
  FROM events e, eval_at a
)
SELECT event_type,
       round(sum(value * w) / sum(w), 6) AS decayed_mean,
       round(sum(w), 6) AS weight_mass,
       count(*) AS n
FROM wk GROUP BY 1
""",
    "iqr_outliers": """
WITH stats AS (
  SELECT event_type,
         round(quantile_cont(value, 0.25), 6) AS p25,
         round(quantile_cont(value, 0.75), 6) AS p75,
         count(value) AS n
  FROM events GROUP BY 1
)
SELECT e.event_type AS topic, e.event_id, e.value, s.p25, s.p75,
       round(s.p25 - 1.5 * (s.p75 - s.p25), 6) AS fence_lo,
       round(s.p75 + 1.5 * (s.p75 - s.p25), 6) AS fence_hi
FROM events e JOIN stats s USING (event_type)
WHERE s.n >= 3 AND (s.p75 - s.p25) > 0
  AND (e.value < s.p25 - 1.5 * (s.p75 - s.p25)
       OR e.value > s.p75 + 1.5 * (s.p75 - s.p25))
""",
    "latest_events": """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn FROM events
) WHERE rn = 1
""",
    "trailing_percentiles": f"""
WITH eval_at AS (SELECT max(ts) AS as_of FROM events),
wins AS (SELECT * FROM {_WINS_VALUES})
SELECT e.event_type, w.window_seconds,
       round(quantile_cont(e.value, 0.5), 6) AS p50,
       round(quantile_cont(e.value, 0.95), 6) AS p95,
       round(quantile_cont(e.value, 0.99), 6) AS p99,
       count(e.value) AS n
FROM events e, eval_at a, wins w
WHERE epoch_us(e.ts) >= epoch_us(a.as_of) - w.window_seconds * 1000000
GROUP BY 1, 2
HAVING count(e.value) >= 3
""",
    "robust_sigma": f"""
WITH eval_at AS (SELECT max(ts) AS as_of FROM events),
wins AS (SELECT * FROM {_WINS_VALUES}),
meds AS (
  SELECT e.event_type, w.window_seconds,
         round(median(e.value), 6) AS med, count(e.value) AS n
  FROM events e, eval_at a, wins w
  WHERE epoch_us(e.ts) >= epoch_us(a.as_of) - w.window_seconds * 1000000
  GROUP BY 1, 2
),
mads AS (
  SELECT e.event_type, m.window_seconds,
         round(median(abs(e.value - m.med)), 6) AS mad
  FROM events e
  CROSS JOIN eval_at a
  JOIN meds m ON m.event_type = e.event_type
  WHERE epoch_us(e.ts) >= epoch_us(a.as_of) - m.window_seconds * 1000000
  GROUP BY 1, 2
)
SELECT e.event_type AS topic, m.window_seconds, e.event_id, e.value,
       m.med AS median, d.mad,
       round((e.value - m.med) / (1.4826 * d.mad), 6) AS robust_z
FROM events e
CROSS JOIN eval_at a
JOIN meds m ON m.event_type = e.event_type
JOIN mads d ON d.event_type = e.event_type AND d.window_seconds = m.window_seconds
WHERE m.n >= 3 AND d.mad > 0
  AND epoch_us(e.ts) >= epoch_us(a.as_of) - m.window_seconds * 1000000
  AND abs((e.value - m.med) / (1.4826 * d.mad)) > 3
""",
    "path_projection": """
SELECT event_id, event_type,
       TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_value
FROM events
WHERE TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL
""",
    "sigma_store": f"""
WITH store AS ({_STORE_SQL})
SELECT topic, field_path, value, epoch_us(produced) AS produced_us, event_id
FROM store
""",
    "multi_field_sigma": f"""
WITH store AS ({_STORE_SQL}),
eval_at AS (SELECT max(produced) AS as_of FROM store),
wins AS (SELECT * FROM (VALUES (BIGINT '86400','1d'), (BIGINT '604800','1w'))
         AS w(window_seconds, human_window)),
stats AS (
  SELECT st.topic, st.field_path, w.window_seconds, w.human_window,
         avg(st.value) AS mean, stddev_pop(st.value) AS sd, count(st.value) AS n
  FROM store st, eval_at a, wins w
  WHERE epoch_us(st.produced) >= epoch_us(a.as_of) - w.window_seconds * 1000000
  GROUP BY 1, 2, 3, 4
)
SELECT st.topic,
       st.field_path AS path,
       s.window_seconds,
       s.human_window,
       st.value AS value,
       round(s.mean, 6) AS median,
       round(s.sd, 6) AS std_dev,
       round((st.value - s.mean) / (3 * s.sd), 6) AS three_sigma,
       st.event_id
FROM store st
CROSS JOIN eval_at a
JOIN stats s ON st.topic = s.topic AND st.field_path = s.field_path
WHERE s.n >= 3 AND s.sd > 0
  AND epoch_us(st.produced) >= epoch_us(a.as_of) - s.window_seconds * 1000000
  AND abs((st.value - s.mean) / (3 * s.sd)) > 1
""",
    "retention_prune": """
WITH eval_at AS (SELECT max(ts) AS as_of FROM events)
SELECT e.event_type, count(*) AS n_kept
FROM events e, eval_at a
WHERE epoch_us(e.ts) >= epoch_us(a.as_of) - BIGINT '604800' * 1000000
GROUP BY 1
""",
    "series_key_hash": f"""
WITH store AS ({_STORE_SQL})
SELECT DISTINCT topic, field_path,
       md5(topic || ':' || field_path) AS series_key
FROM store
""",
    "topic_blacklist": """
SELECT DISTINCT event_type AS topic FROM events WHERE event_type NOT IN ('error')
""",
    "topic_diff": """
WITH known(topic) AS (VALUES ('click'), ('view'), ('legacy_topic')),
cur AS (SELECT DISTINCT event_type AS topic FROM events)
SELECT topic, 'created' AS change FROM cur
WHERE topic NOT IN (SELECT topic FROM known)
UNION ALL
SELECT topic, 'deleted' AS change FROM known
WHERE topic NOT IN (SELECT topic FROM cur)
""",
    "anomaly_cooldown": """
WITH eval_at AS (SELECT max(ts) AS as_of FROM events),
stats AS (
  SELECT e.event_type,
         avg(e.value) AS mean, stddev_pop(e.value) AS sd, count(e.value) AS n
  FROM events e, eval_at a
  WHERE epoch_us(e.ts) >= epoch_us(a.as_of) - BIGINT '86400' * 1000000
  GROUP BY 1
),
anom AS (
  SELECT epoch_us(e.ts) AS event_ts_us,
         e.event_type AS topic, 'value' AS path,
         BIGINT '86400' AS window_seconds, '1d' AS human_window,
         e.value AS value,
         round(s.mean, 6) AS median, round(s.sd, 6) AS std_dev,
         round((e.value - s.mean) / (3 * s.sd), 6) AS three_sigma,
         e.event_id, e.user_id
  FROM events e CROSS JOIN eval_at a
  JOIN stats s ON e.event_type = s.event_type
  WHERE s.n >= 3 AND s.sd > 0
    AND epoch_us(e.ts) >= epoch_us(a.as_of) - BIGINT '86400' * 1000000
    AND abs((e.value - s.mean) / (3 * s.sd)) > 1
)
SELECT event_ts_us, topic, path, window_seconds, human_window, value,
       median, std_dev, three_sigma, event_id, user_id
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY topic, path, window_seconds,
                 event_ts_us - event_ts_us % (BIGINT '120' * 1000000)
    ORDER BY event_ts_us, event_id
  ) AS rn
  FROM anom
) WHERE rn = 1
""",
    "asof_join": """
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS error_ts_us,
       c.click_event_id AS r_click_event_id,
       c.click_value AS r_click_value,
       epoch_us(c.ts) AS r_click_ts_us
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
ASOF JOIN (
  SELECT user_id, ts, event_id AS click_event_id, value AS click_value
  FROM events WHERE event_type = 'click'
) c ON e.user_id = c.user_id AND c.ts <= e.ts
""",
    "rate_anomaly": """
WITH b AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(ts) % (BIGINT '3600' * 1000000) AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, avg(n) AS mean, stddev_pop(n) AS sd, count(*) AS nb
  FROM b GROUP BY 1
)
SELECT b.event_type AS topic, '__topic_frequency' AS path, b.bucket_us, b.n,
       round(s.mean, 6) AS median, round(s.sd, 6) AS std_dev,
       round((b.n - s.mean) / (3 * s.sd), 6) AS three_sigma
FROM b JOIN s USING (event_type)
WHERE s.nb >= 3 AND s.sd > 0 AND abs((b.n - s.mean) / (3 * s.sd)) > 1
""",
    "anomaly_payload": """
WITH eval_at AS (SELECT max(ts) AS as_of FROM events),
stats AS (
  SELECT e.event_type,
         avg(e.value) AS mean, stddev_pop(e.value) AS sd, count(e.value) AS n
  FROM events e, eval_at a
  WHERE epoch_us(e.ts) >= epoch_us(a.as_of) - BIGINT '86400' * 1000000
  GROUP BY 1
),
anom AS (
  SELECT e.event_type AS topic, 'value' AS path, BIGINT '86400' AS window_seconds,
         e.value AS value, epoch_us(e.ts) AS event_ts_us
  FROM events e CROSS JOIN eval_at a
  JOIN stats s ON e.event_type = s.event_type
  WHERE s.n >= 3 AND s.sd > 0
    AND epoch_us(e.ts) >= epoch_us(a.as_of) - BIGINT '86400' * 1000000
    AND abs((e.value - s.mean) / (3 * s.sd)) > 1
)
SELECT md5(topic || ':' || path || ':' || window_seconds::varchar) AS key,
       '{"id":"' || md5(topic || ':' || path || ':' || window_seconds::varchar
                        || ':' || event_ts_us::varchar)
       || '","topic":"' || topic || '","path":"' || path
       || '","window":' || window_seconds::varchar
       || ',"value":' || CAST(round(value, 2) AS DECIMAL(18,2))::varchar
       || '}' AS value
FROM anom
""",
}

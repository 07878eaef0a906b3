"""General relational queries over the events/documents tables —
sessionization, range joins, pivot/rollup/cube, time-series windows,
funnels, and skew diagnostics. The TPC-H-shape star-schema queries live
in ``relational_tpch.py`` (round-9 size split); this module
star-imports them and owns the MERGED driver-facing QUERIES/ORACLE
dicts, so ``sarkac_spark.queries`` sees one unchanged registry surface.

The reference has no joins/sorts/window functions (SURVEY §2.6) — these
exist to show the rebuild is a complete analytics engine on the same
tables, with the plan shapes that matter at 100 TB.

Float policy: monetary sums rounded to 2 (absolute summation-order error
~1e-5 at sf0.1 — far from the 0.005 boundary), averages to 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from sarkac_spark.queries.relational_tpch import *  # noqa: F401,F403
from sarkac_spark.queries import relational_tpch as _tpch
from sarkac_spark.sources.tables import load_table


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) of the event stream per user —
    lag+cumsum window construction (operators/sessions.py)."""
    from sarkac_spark.operators.sessions import session_stats

    ev = load_table(spark, sf_dir, "events")
    return session_stats(
        ev, ["user_id"], "ts", gap_seconds=1800, order_tiebreak=["event_id"]
    )

def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment: events joined into [-30m, +90m] windows
    around high-value 'incident' events of the same type — bucketized
    equi-join (operators/range_join.py), aggregated per incident."""
    from sarkac_spark.operators.range_join import range_join

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    incidents = ev.filter(F.col("value") > 300).select(
        "event_type",
        F.col("event_id").alias("incident_event_id"),
        F.timestamp_micros(us - 1800 * 1_000_000).cast("timestamp_ntz").alias("start_ts"),
        F.timestamp_micros(us + 5400 * 1_000_000).cast("timestamp_ntz").alias("end_ts"),
    )
    points = ev.select("event_type", "ts", "event_id")
    joined = range_join(points, incidents, on=["event_type"], bucket_seconds=3600)
    return joined.groupBy("event_type", "incident_event_id").agg(
        F.count(F.lit(1)).alias("n_in_window")
    )

def q_doc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (lang, source): subtotal and grand-total rows with the
    standard NULL group markers — matching DuckDB's GROUP BY ROLLUP."""
    d = load_table(spark, sf_dir, "documents")
    return d.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )

def q_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily counts pivoted to one column per event type (fixed pivot
    values so the schema is static — the requirement for any pivot at
    scale); missing combinations are 0, matching FILTER-count."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    day_us = us - us % (86400 * 1_000_000)
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy(day_us.alias("day_us"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )

def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over events: users reaching view -> click ->
    purchase with each step strictly after the previous one."""
    from sarkac_spark.operators.sessions import funnel

    return funnel(
        load_table(spark, sf_dir, "events"),
        user_col="user_id",
        ts_col="ts",
        type_col="event_type",
        steps=("view", "click", "purchase"),
        id_tiebreak="event_id",
    )

def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize the event stream: per-type hourly buckets, empty
    buckets synthesized and forward-filled with the last observed
    bucket total (exact integer cents — same tie-free contract as
    rolling_hourly_stats) (operators/timeseries.py)."""
    from sarkac_spark.operators.timeseries import gap_fill

    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return gap_fill(
        ev,
        ["event_type"],
        "ts",
        "value",
        bucket_seconds=3600,
        agg_expr=F.sum(cents).cast("long"),
    )

def q_rolling_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-hour moving average over the hourly per-type series —
    RANGE window frame over the *aggregated* relation (|types|×|hours|
    rows), so the frame scan never touches the raw fact table."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bucket_us = (us - us % (3600 * 1_000_000)).alias("bucket_us")
    # exact integer cents end-to-end (values are 2-decimal by contract):
    # round(avg, 6) emits doubles that sit a hair from a 6-decimal tie
    # whenever cents*10^4/count is half-integer, and there the engines'
    # round() implementations legitimately disagree (Spark rounds the
    # double's exact decimal expansion, DuckDB rounds a scaled multiply
    # that can cross the tie — bit us at sf0.1). Integer sums have no
    # rounding step at all, so the hash is stable at any scale factor;
    # consumers derive means as v_cents / (100 * n_obs).
    cents = F.round(F.col("value") * 100).cast("long")
    hourly = ev.groupBy("event_type", bucket_us).agg(
        F.sum(cents).alias("v_cents"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rangeBetween(-2 * 3600 * 1_000_000, 0)
    )
    return hourly.select(
        "event_type",
        "bucket_us",
        "v_cents",
        "n_obs",
        F.sum("v_cents").over(w).alias("v_cents_3h"),
        F.count(F.lit(1)).over(w).alias("n_hours_in_frame"),
    )

def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (bin = floor(value/25)) —
    map-side binning then a |bins|-row shuffle; the building block for
    distribution drift checks over 100 TB (bin ids are exact integers,
    so partial aggregation loses nothing)."""
    ev = load_table(spark, sf_dir, "events")
    bin_id = F.floor(F.col("value") / F.lit(25.0)).cast("long").alias("bin_id")
    return ev.groupBy(bin_id).agg(
        F.count(F.lit(1)).alias("n_values"),
        F.round(F.min("value"), 6).alias("bin_min"),
        F.round(F.max("value"), 6).alias("bin_max"),
    )

def q_doc_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (lang, source): all four grouping-set combinations in
    one pass (Expand + single aggregation — not four scans). Integer
    aggregates only, so cross-engine comparison is exact."""
    d = load_table(spark, sf_dir, "documents")
    return d.cube("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )

def q_top_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (top-3 longest docs per language): rank window
    partitioned by lang — each partition sorts only its own slice, no
    global sort, no single-partition collapse."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .withColumn("rk", F.col("rk").cast("long"))
    )

def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnosis on the lineitem->orders join key: the report
    run before committing a 100 TB shuffle to a key (skew >> 1 on head
    keys => salting / AQE skew handling needed)."""
    from sarkac_spark.operators.profiling import skew_report

    return skew_report(load_table(spark, sf_dir, "lineitem"), ["l_orderkey"])

def q_series_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between the per-type hourly series —
    which metrics move together (correlated-failure diagnosis /
    redundant-series audit). Tie-free cents means feed the kernel."""
    from sarkac_spark.operators.timeseries import series_correlation

    return series_correlation(load_table(spark, sf_dir, "events"))


# Merged registry: the TPC-H family (relational_tpch.QUERIES, in that
# module's order) leads, then the local events/documents queries below.
QUERIES = {
    # the whole TPC-H shape family rides the spread (same as ORACLE
    # below) — an itemized relay list silently dropped newly added
    # shapes from the registry once (round 9, Q5/Q6/Q18)
    **_tpch.QUERIES,
    "series_correlation": q_series_correlation,
    "rolling_hourly_stats": q_rolling_hourly_stats,
    "value_histogram": q_value_histogram,
    "doc_cube": q_doc_cube,
    "top_docs_per_lang": q_top_docs_per_lang,
    "skew_report": q_skew_report,
    "conversion_funnel": q_conversion_funnel,
    "sessionize": q_sessionize,
    "range_join": q_range_join,
    "doc_rollup": q_doc_rollup,
    "event_pivot": q_event_pivot,
    "gap_fill": q_gap_fill,
}

ORACLE = {
    **_tpch.ORACLE,
    "series_correlation": """
WITH hourly AS (
  SELECT event_type AS s,
         epoch_us(ts) - epoch_us(ts) % (BIGINT '3600' * 1000000) AS bucket_us,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_cents,
         count(*) AS n_obs
  FROM events GROUP BY 1, 2
),
m AS (SELECT s, bucket_us, v_cents / (100.0 * n_obs) AS m FROM hourly),
p AS (
  SELECT a.s AS series_a, b.s AS series_b, count(*) AS n_buckets,
         sum(a.m) AS sa, sum(b.m) AS sb, sum(a.m * b.m) AS sab,
         sum(a.m * a.m) AS saa, sum(b.m * b.m) AS sbb
  FROM m a JOIN m b USING (bucket_us)
  WHERE a.s < b.s
  GROUP BY 1, 2
)
SELECT series_a, series_b, n_buckets,
       round((n_buckets * sab - sa * sb)
             / (sqrt(n_buckets * saa - sa * sa)
                * sqrt(n_buckets * sbb - sb * sb)), 6) AS corr
FROM p
WHERE n_buckets >= 3
  AND (n_buckets * saa - sa * sa) > 0
  AND (n_buckets * sbb - sb * sb) > 0
""",
    "rolling_hourly_stats": """
WITH hourly AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(ts) % (BIGINT '3600' * 1000000) AS bucket_us,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_cents,
         count(*) AS n_obs
  FROM events GROUP BY 1, 2
)
SELECT event_type, bucket_us, v_cents, n_obs,
       CAST(sum(v_cents) OVER w AS BIGINT) AS v_cents_3h,
       count(*) OVER w AS n_hours_in_frame
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
             RANGE BETWEEN BIGINT '7200000000' PRECEDING AND CURRENT ROW)
""",
    "value_histogram": """
SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin_id,
       count(*) AS n_values,
       round(min(value), 6) AS bin_min,
       round(max(value), 6) AS bin_max
FROM events GROUP BY 1
""",
    "doc_cube": """
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY CUBE (lang, source)
""",
    "top_docs_per_lang": """
SELECT lang, doc_id, n_chars, rk FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
) WHERE rk <= 3
""",
    "skew_report": """
WITH c AS (
  SELECT l_orderkey::VARCHAR AS key_value, count(*) AS n_rows
  FROM lineitem GROUP BY 1
),
s AS (SELECT sum(n_rows) AS total, count(*) AS n_keys FROM c)
SELECT key_value, n_rows, frac, skew, rank FROM (
  SELECT c.key_value, c.n_rows,
         round(c.n_rows / s.total, 6) AS frac,
         round(c.n_rows * s.n_keys / s.total, 6) AS skew,
         row_number() OVER (ORDER BY c.n_rows DESC, c.key_value) AS rank
  FROM c, s
) WHERE rank <= 10
""",
    "conversion_funnel": """
WITH st AS (
  SELECT user_id AS u, epoch_us(ts) AS us, event_type AS t, event_id
  FROM events
),
s0 AS (SELECT *, CASE WHEN t = 'view' THEN us END AS v0 FROM st),
s1 AS (
  SELECT *, CASE WHEN t = 'click' AND min(v0) OVER w < us THEN us END AS v1
  FROM s0
  WINDOW w AS (PARTITION BY u ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s2 AS (
  SELECT *, CASE WHEN t = 'purchase' AND min(v1) OVER w < us THEN us END AS v2
  FROM s1
  WINDOW w AS (PARTITION BY u ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT count(f0)::BIGINT AS n_view, count(f1)::BIGINT AS n_click,
       count(f2)::BIGINT AS n_purchase
FROM (SELECT u, min(v0) AS f0, min(v1) AS f1, min(v2) AS f2 FROM s2 GROUP BY u)
""",
    "sessionize": """
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > BIGINT '1800' * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
s2 AS (
  SELECT user_id, us,
         CAST(SUM(new_s) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS session_seq
  FROM s
)
SELECT user_id, session_seq,
       min(us) AS session_start_us,
       max(us) AS session_end_us,
       count(*) AS n_events,
       max(us) - min(us) AS duration_us
FROM s2 GROUP BY 1, 2
""",
    "range_join": """
WITH inc AS (
  SELECT event_type, event_id AS incident_event_id,
         epoch_us(ts) - BIGINT '1800' * 1000000 AS start_us,
         epoch_us(ts) + BIGINT '5400' * 1000000 AS end_us
  FROM events WHERE value > 300
)
SELECT i.event_type, i.incident_event_id, count(*) AS n_in_window
FROM events e
JOIN inc i ON e.event_type = i.event_type
          AND epoch_us(e.ts) BETWEEN i.start_us AND i.end_us
GROUP BY 1, 2
""",
    "doc_rollup": """
SELECT lang, source, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY ROLLUP (lang, source)
""",
    "event_pivot": """
SELECT epoch_us(ts) - epoch_us(ts) % (BIGINT '86400' * 1000000) AS day_us,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY 1
""",
    "gap_fill": """
WITH obs AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(ts) % (BIGINT '3600' * 1000000) AS bucket_us,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_obs,
         count(*) AS n_obs
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi FROM obs GROUP BY 1
),
grid AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, BIGINT '3600' * 1000000)) AS bucket_us
  FROM spans
),
j AS (
  SELECT g.event_type, g.bucket_us,
         coalesce(o.n_obs, 0) AS n_obs, o.v_obs,
         o.n_obs IS NULL AS filled
  FROM grid g LEFT JOIN obs o USING (event_type, bucket_us)
)
SELECT event_type, bucket_us, n_obs,
       last_value(v_obs IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket_us
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS v_fill,
       filled
FROM j
""",
}

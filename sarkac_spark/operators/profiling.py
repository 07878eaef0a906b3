"""Column profiling — the first thing a training-data pipeline runs
against a new corpus drop: per-column null counts, cardinality, and
value bounds, as one relation per table.

Scale shape: ONE aggregation over one scan for every column at once.
With ``exact_distinct=True`` the multi-column COUNT(DISTINCT) makes
Catalyst plan an Expand (input duplicated once per distinct aggregate
before the shuffle) — exact, oracle-checkable, and fine while
#cols x input fits the cluster. At 100 TB profile runs, flip to
``exact_distinct=False``: HyperLogLog sketches (``approx_count_distinct``)
keep the plan expand-free and fixed-memory at ~2% relative error (that
variant is rows-only for the oracle gate — sketch estimates aren't
SQL-reproducible).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from sarkac_spark.functions.ranking import rank_topk


def skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top_k: int = 10,
) -> DataFrame:
    """Hot-key diagnosis for a prospective join/agg key: the top-k keys
    by row count with their share of the table and their skew ratio
    (rows-at-key / rows-under-uniformity). This is the report you run
    BEFORE shuffling 100 TB on a key — skew >> 1 on the head keys means
    that shuffle needs salting, AQE skew-join handling, or a broadcast
    rethink; skew ~ 1 means hash partitioning will balance.

    Plan: one grouped count on the key (the same shuffle the real join
    would do, but emitting only |distinct keys| rows), a 1-row total
    broadcast back over it, and a driver-merged per-partition top-k
    (``orderBy().limit()`` -> TakeOrderedAndProject — never a global
    sort). Keys are stringified so composite/any-typed keys share one
    report schema, and the count relation is reused for total + top-k
    (self-reused exchange, not two scans of the fact table).

    Output: (key_value, n_rows, frac, skew, rank).
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    counts = df.select(key.alias("key_value")).groupBy("key_value").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    stats = counts.agg(
        F.sum("n_rows").alias("__total"), F.count(F.lit(1)).alias("__n_keys")
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key_value")).limit(top_k)
    enriched = top.crossJoin(F.broadcast(stats)).select(
        "key_value",
        "n_rows",
        F.round(F.col("n_rows") / F.col("__total"), 6).alias("frac"),
        F.round(
            F.col("n_rows") * F.col("__n_keys") / F.col("__total"), 6
        ).alias("skew"),
    )
    return rank_topk(enriched, "n_rows", "key_value")


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: all) in one pass. Output long format:
    (column_name, n_rows, n_null, n_distinct, min_value, max_value) —
    min/max computed on the native type, then cast to string so mixed
    column types share one result schema."""
    cols = list(cols) if cols is not None else list(df.columns)
    n_distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(F.col(c))).alias(f"__null_{c}"))
        aggs.append(n_distinct(c).alias(f"__dist_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_rows, __null_{c}, __dist_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_rows, n_null, n_distinct, min_value, max_value)"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_col: str | Column = "text",
) -> DataFrame:
    """Corpus-snapshot diff — the data-versioning audit run between two
    drops of the same corpus (crawl N vs crawl N+1, pre- vs post-filter
    rebuild): per id, whether the document was ``added``, ``removed``,
    ``changed`` (same id, different content fingerprint) or
    ``unchanged``. The status relation is what retraining-impact
    analysis consumes (how much of the corpus actually moved?) and what
    incremental pipelines use to process only the delta instead of
    re-curating 100 TB.

    ``content_col`` may be a column name or an expression; content is
    compared by md5 fingerprint, so wide text never crosses the
    shuffle — each side is projected to (id, 32-byte digest) before the
    join.

    Output: (id, status, old_fp, new_fp) — fingerprints NULL on the
    missing side.

    Scale shape: two narrow projections (map-only digest) and ONE
    full-outer equi-join on the id key — ids are unique per side, so
    the join is skew-free by construction and AQE sizes the partitions;
    there is no other shuffle. Roll up with a grouped count on
    ``status`` for the 4-row churn summary.
    """
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    o = old.select(F.col(id_col), F.md5(c.cast("string")).alias("old_fp"))
    n = new.select(F.col(id_col), F.md5(c.cast("string")).alias("new_fp"))
    return (
        o.join(n, id_col, "full_outer")
        .select(
            id_col,
            F.when(F.col("old_fp").isNull(), F.lit("added"))
            .when(F.col("new_fp").isNull(), F.lit("removed"))
            .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
            "old_fp",
            "new_fp",
        )
    )


def quantile_bucket_stats(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """Equal-frequency bucketing by value without a global sort: exact
    quantile boundaries from one tree-aggregated ``percentile`` pass, a
    broadcast of the 1-row boundary array, then a MAP-ONLY bucket
    assignment and one grouped agg. The NTILE alternative would shuffle
    the whole relation to a single partition — this shape is O(1) extra
    memory per executor at any corpus size.

    Returns per-bucket (bucket 1..n, n_rows, lo, hi, avg_value). Rows
    equal to a boundary fall in the lower bucket (<=), matching
    ``quantile_cont`` interpolation on the oracle side.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.percentile(F.col(value_col), F.lit(probs)).alias("__bs")
    )
    bucket = F.lit(1).cast("long") + F.aggregate(
        F.col("__bs"),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(F.col(value_col) > b, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    return (
        df.select(value_col)
        .crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
            F.round(F.avg(value_col), round_digits).alias("avg_value"),
        )
    )

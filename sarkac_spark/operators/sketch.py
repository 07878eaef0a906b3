"""Count-min sketch: bounded-memory frequency estimation.

The scale problem it solves: exact token/key counts over 100 TB need a
vocab-sized shuffle and vocab-sized state, and the vocabulary of a web
corpus is unbounded. A count-min sketch is ``depth x width`` counters —
a few KB, FIXED regardless of corpus size — with a one-sided error
guarantee: estimates never undercount, and overcount by at most
``2N/width`` with probability ``1 - (1/2)^depth`` (Cormode & Muthu-
krishnan 2005). That makes it the right primitive for hot-key / heavy-
hitter detection feeding skew mitigation (salting decisions) and for
cheap pre-aggregation health checks, where exact counts are overkill.

Spark shape: building the sketch is ONE grouped aggregation whose key
space is the (depth, bucket) grid — map-side partial aggregation
collapses the corpus to at most ``depth x width`` rows per task before
the exchange, so the shuffle is sketch-sized, not data-sized. Estimation
is an equi-join of the probed items against the sketch plus a min-
aggregate per item. Hashing is md5-derived (the engine-portability
contract shared with operators/dedup), so every result is bit-identical
in DuckDB and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HASH_HEX_LEN = 15  # 60-bit prefix fits a signed 64-bit long in both engines


def _row_hash(col: Column, d: int, width: int) -> Column:
    """Row d's bucket for a value: md5-derived 60-bit hash of the
    d-salted value, mod width. Independent rows come from the salt."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{d}:"), col)), 1, _HASH_HEX_LEN),
        16,
        10,
    ).cast("long")
    return (h % width).cast("long")


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) — at most ``depth x width``
    rows whatever the input size. Each input row lands in one bucket
    per sketch row; ``weight_col`` makes it a weighted sketch (e.g.
    bytes per key instead of occurrences).

    One scan, one sketch-sized shuffle (the explode factor is
    ``depth``, collapsed by map-side combine before the exchange).
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                _row_hash(F.col(col), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"), w.alias("__w"))
        .groupBy(F.col("rb.d").alias("d"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated count per item: min over the sketch rows of the item's
    bucket counter. ``depth`` and ``width`` must match the build call
    (they are the sketch's identity — a deployment stores them with it).

    Scale shape: items explode by ``depth`` (probe side, usually tiny),
    equi-join the sketch on (d, bucket) — the sketch side is at most
    depth x width rows, so AQE broadcasts it — then one min-aggregate
    per item. Missing buckets are true zero counts.

    Output: (<col>, est_count) with the one-sided guarantee
    est_count >= true count.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                _row_hash(F.col(col), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    probes = items.select(F.col(col), F.explode(rows).alias("rb")).select(
        col, F.col("rb.d").alias("d"), F.col("rb.bucket").alias("bucket")
    )
    return (
        probes.join(sketch, ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count"))
    )

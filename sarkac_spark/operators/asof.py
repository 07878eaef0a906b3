"""As-of (most-recent-prior) join — an operator Spark lacks natively.

``asof_join(left, right)``: for every left row, attach the single right
row with the greatest ``right.ts <= left.ts`` within the same key — the
time-series point-in-time lookup (DuckDB/kdb ``ASOF JOIN``; pandas
``merge_asof``).

Spark-first implementation — the union+window trick, no Python:

    tag right rows side=0, left rows side=1
    union -> window PARTITION BY key ORDER BY (ts, side)
    carry = last(right-payload struct, ignorenulls) over rows
            UNBOUNDED PRECEDING .. CURRENT ROW
    keep left rows; explode the carried struct

One shuffle (the window partition), linear state, no range explosion —
this is the scalable shape; ``applyInPandas`` + ``merge_asof`` per key is
the alternative when per-key data fits in memory but pays Arrow transfer
for the full fact stream. Ties (equal ts): right side sorts first, so a
same-timestamp right row IS visible to the left row, matching DuckDB's
``ON right.ts <= left.ts`` inclusive semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Most-recent-prior join. Output: every ``left`` column plus each
    right payload column prefixed with ``right_prefix``. ``how="left"``
    keeps left rows with no prior right row (nulls); ``"inner"`` drops
    them (DuckDB ASOF JOIN default)."""
    on = list(on)
    r_payload = [c for c in right.columns if c not in (*on, right_ts)]

    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    rows = carried.filter(F.col("__side") == 1)
    if how == "inner":
        # the carried struct is null iff no right row preceded
        rows = rows.filter(F.col("__match").isNotNull())
    return rows.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__match").getField(c).alias(f"{right_prefix}{c}") for c in r_payload],
    )

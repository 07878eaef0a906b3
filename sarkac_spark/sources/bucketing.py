"""Bucketed-table storage: pre-shuffled layout for co-located joins.

The single biggest repeated cost in a 100 TB star schema is re-shuffling
the fact table on the same join key query after query. Bucketing pays
that shuffle ONCE at write time: both sides stored hash-partitioned
(and sorted) on the key into the same bucket count, so a later
fact ⋈ fact join compiles to a SortMergeJoin with NO Exchange on either
side — each task reads bucket i of both tables locally.

Spark only honors bucket metadata through the catalog (`saveAsTable`),
not bare parquet paths — that is the one place this engine uses managed
tables. Bucket count is a real tuning knob: it fixes max join
parallelism and per-bucket file size (aim ~128-512 MB per bucket at
target scale; 100 TB / 512 MB ≈ 200k would exceed sane file counts, so
large facts use 4-16k buckets and rely on in-bucket splitting).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from sarkac_spark.sources.tables import ensure_confs


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str] | str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and sorted)
    by ``bucket_cols``. Overwrites any existing table of that name."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *cols)
        .sortBy(*cols)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key. When both sides carry
    matching bucket specs the plan has no Exchange — the join runs
    bucket-aligned (verified by ``tests/test_plans.py``)."""
    ensure_confs(spark)
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on, how)

"""Batch table loading for the driver's parquet test data.

One quirk: ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader
rejects; with ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in
``session.get_spark``) it arrives as a nanosecond long, converted here to
``timestamp_ntz`` by truncating to microseconds — identical to how DuckDB
coerces ns -> its native us timestamps, so oracle comparisons line up.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_confs(spark: SparkSession) -> None:
    """Runtime confs the engine depends on, set defensively so entry points
    also work under an externally-created session (the driver's).

    The perf block matters for the driver's correctness sweep: a default
    session shuffles every groupBy/join into 200 partitions, which at
    sf<=0.1 turns each query into mostly task-scheduling overhead (and in
    round 1 the sweep ran out of budget 50 queries in). Only Spark's
    untouched defaults are overridden — an explicitly configured session
    is left alone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
            spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    except Exception:  # pragma: no cover - read-only conf in odd harnesses
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # ns long -> us timestamp_ntz; integer `div` truncates like DuckDB.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (matches the DuckDB oracle
    environment, where the same names are pre-registered)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

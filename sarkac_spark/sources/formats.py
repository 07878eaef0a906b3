"""Ingestion / egress formats beyond parquet: JSONL, CSV, ORC, and
size-controlled dataset writes.

The 100 TB concerns these wrap:

- **Schema is declared, never inferred, on big reads.** Inference scans
  the data once before the real job (2x the ingest cost) and silently
  widens types on dirty data. Both readers here take an explicit
  schema; pass ``sample_path`` to infer from a small sample file
  instead when bootstrapping.
- **Corrupt records are data, not exceptions.** A multi-TB JSONL crawl
  always contains broken lines; failing the job on line 3 billion is
  not an option, and silently dropping is worse. PERMISSIVE mode
  routes failures into a corrupt-record column; ``corrupt_records``
  is the audit view (count it, sample it, THEN decide).
- **Output file sizing.** A 100 TB write with default settings can
  produce millions of tiny files (the "small files problem" — every
  downstream scan pays per-file open cost, and object stores throttle
  listings). ``write_dataset`` exposes ``max_records_per_file``
  (Spark splits large tasks' output) and partitioning in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    sample_path: str | None = None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Newline-delimited JSON with declared schema and corrupt-record
    capture. The returned frame carries ``_corrupt_record`` (null for
    clean rows); project it away after auditing.
    """
    reader = spark.read.option("mode", mode).option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if schema is not None:
        reader = reader.schema(f"{schema}, {CORRUPT_COL} string")
    elif sample_path is not None:
        from pyspark.sql.types import StringType, StructField

        inferred = spark.read.json(sample_path).schema
        reader = reader.schema(inferred.add(StructField(CORRUPT_COL, StringType())))
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    mode: str = "PERMISSIVE",
    **options: str,
) -> DataFrame:
    """CSV with declared schema and corrupt-record capture (same
    contract as ``read_jsonl``)."""
    return (
        spark.read.option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .schema(f"{schema}, {CORRUPT_COL} string")
        .csv(path)
    )


def corrupt_records(df: DataFrame) -> DataFrame:
    """The audit view: rows the reader could not parse under the
    declared schema. Count/sample this BEFORE dropping it.

    Caches the source frame: Spark refuses a query that reads ONLY the
    corrupt-record column from raw JSON/CSV
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — after column pruning the parser
    would have nothing to fail on), and caching is the
    documented-by-Spark escape. The audit runs once per ingest and the
    cache is what the subsequent ``clean_records`` read wants anyway.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"frame has no {CORRUPT_COL} column")
    return df.cache().filter(F.col(CORRUPT_COL).isNotNull())


def clean_records(df: DataFrame) -> DataFrame:
    """Parsed rows with the corrupt-record column projected away.

    Shares ``corrupt_records``' cache escape: an action over this frame
    that reads no data column (e.g. ``count()``) would otherwise prune
    to the corrupt column alone and trip
    QUERY_ONLY_CORRUPT_RECORD_COLUMN. The intended ingest pattern —
    read once, audit counts, write the clean rows — reuses the one
    cached pass; for a read too large to cache, filter inline next to
    real column references instead of using these helpers.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"frame has no {CORRUPT_COL} column")
    return df.cache().filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Size-controlled dataset write. ``max_records_per_file`` bounds
    the LARGE end (Spark splits any task's output at the cap);
    too-many-small-files is bounded by writing from a sensible
    partition count upstream (``df.repartition(n)`` or AQE coalescing),
    not here — a blind coalesce would serialize the write."""
    w = df.write.format(fmt).mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)

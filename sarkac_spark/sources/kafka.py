"""Kafka source/sink builders (reference lib/Stream.js).

The reference consumes a topic list with a native consumer (batch 500,
manual commit per batch => at-least-once, Stream.js:29-30,123-142 +
example/kafkaConfig.js:15,32-36) and produces anomalies to an output
topic (Stream.js:67-121,157-170). Spark equivalents:

- source: ``spark.readStream.format("kafka")`` — ``maxOffsetsPerTrigger``
  plays the batch-size role; checkpointing replaces manual commits
  (still at-least-once into an idempotent sink, exactly-once with
  foreachBatch + transactional target).
- dynamic topic sets (Stream.js:145-152 re-subscribe on discovery) map to
  ``subscribePattern`` — Spark picks up new matching topics without a
  restart; explicit-list changes need a query restart, which the
  discovery loop performs.
- sink: ``to_json`` projection -> ``writeStream.format("kafka")``.

The spark-sql-kafka connector jar is not bundled with plain pyspark;
builders raise a clear error at *call* time when the package is missing
so the rest of the engine stays importable and testable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# Spark's Kafka source row schema — matches the reference message envelope
# {topic, key, value, timestamp} (example/example.js:50-54) exactly.
KAFKA_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


@dataclass
class KafkaSourceConfig:
    bootstrap_servers: str
    topics: list[str] = field(default_factory=list)
    subscribe_pattern: str | None = None  # preferred: survives topic churn
    starting_offsets: str = "latest"
    max_offsets_per_trigger: int | None = 500  # reference batchSize analogue
    fail_on_data_loss: bool = False

    def options(self) -> dict[str, str]:
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "startingOffsets": self.starting_offsets,
            "failOnDataLoss": str(self.fail_on_data_loss).lower(),
        }
        if self.subscribe_pattern:
            opts["subscribePattern"] = self.subscribe_pattern
        elif self.topics:
            opts["subscribe"] = ",".join(self.topics)
        else:
            raise ValueError("either topics or subscribe_pattern is required")
        if self.max_offsets_per_trigger is not None:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        return opts


def kafka_stream(spark: SparkSession, cfg: KafkaSourceConfig) -> DataFrame:
    """``readStream`` over Kafka. Raises a clear error when the connector
    jar (org.apache.spark:spark-sql-kafka-0-10) is absent."""
    reader = spark.readStream.format("kafka")
    for k, v in cfg.options().items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "Kafka source unavailable — add the spark-sql-kafka-0-10 package "
            "(spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>)"
        ) from e


def envelope(df: DataFrame) -> DataFrame:
    """Kafka bytes -> typed envelope (the reference's mandatory
    ``beforeMessageProcessing`` hook, Stream.js:43-65): key/value to
    string, event-time timestamp passthrough. JSON payload parsing happens
    per-topic downstream (``from_json`` needs the topic's schema)."""
    return df.select(
        F.col("topic"),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("ts"),
    )


def anomaly_sink_frame(anomalies: DataFrame, key_cols: list[str]) -> DataFrame:
    """Project an anomaly DataFrame to the Kafka sink shape
    (key string, value json-string) — S3, Stream.js:157-170."""
    return anomalies.select(
        F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols]).alias("key"),
        F.to_json(F.struct(*anomalies.columns)).alias("value"),
    )


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    trigger_seconds: int = 15,
):
    """Anomaly producer (S3). At-least-once like the reference
    (kafkaConfig.js:15,32-36); the checkpoint replaces manual commits."""
    try:
        return (
            df.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start()
        )
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "Kafka sink unavailable — add the spark-sql-kafka-0-10 package"
        ) from e

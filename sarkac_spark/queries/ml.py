"""MLlib anomaly-model queries (BASELINE.json north star: "MLlib anomaly
detection"). Iterative training isn't ANSI-SQL-expressible, so these have
NO oracle entries — the driver records rows-only checks (the documented
weaker path). Determinism: fixed seeds, deterministic thresholds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sarkac_spark.operators.mllib_anomaly import (
    kmeans_anomaly,
    lsh_neighbor_anomaly,
    mllib_minhash_pairs,
)
from sarkac_spark.sources.tables import load_table


def q_kmeans_anomaly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = kmeans_anomaly(ev.select("event_id", "value"), ["value"], k=4)
    return out.filter("is_anomaly").select(
        "event_id", F.round("dist", 6).alias("dist"), "cluster"
    )


def q_lsh_isolation(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_neighbor_anomaly(emb).filter("is_anomaly").select(
        "vec_id", F.round("mean_bucket_size", 6).alias("mean_bucket_size")
    )


def q_mllib_minhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return mllib_minhash_pairs(docs, threshold=0.5)


QUERIES = {
    "kmeans_anomaly": q_kmeans_anomaly,
    "lsh_isolation": q_lsh_isolation,
    "mllib_minhash": q_mllib_minhash,
}

ORACLE: dict[str, str] = {}  # rows-only: iterative MLlib training

"""MLlib-based anomaly models — the BASELINE.json north-star alternates
to the 3-sigma rule ("Structured Streaming + Kafka source + MLlib anomaly
detection").

Models:

- ``kmeans_anomaly``: KMeans over (feature columns); anomaly score =
  distance to the assigned cluster center, flagged beyond the p99-ish
  quantile. The classic distance-based detector.
- ``lsh_neighbor_anomaly``: BucketedRandomProjectionLSH density proxy —
  points whose LSH bucket is near-empty are isolated (an
  IsolationForest-flavored signal without tree models, which MLlib
  lacks).
- MLlib ``MinHashLSH`` is also exposed (``mllib_minhash_pairs``) as a
  cross-check of the hand-rolled LCG minhash in operators/dedup.

These are not SQL-expressible (iterative training), so the driver records
rows-only checks for their queries; determinism comes from fixed seeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.linalg import VectorUDT  # noqa: F401  (schema docs)


def kmeans_anomaly(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 4,
    quantile: float = 0.99,
    seed: int = 42,
    max_iter: int = 10,
    max_train_rows: int = 100_000,
) -> DataFrame:
    """Distance-to-centroid anomaly detection.

    Returns the input plus (cluster, dist, threshold, is_anomaly). The
    quantile threshold is computed per-model (approxQuantile on the
    distance distribution). Scoring is a map-only transform over ALL
    rows; *training* is capped at ``max_train_rows`` via a seeded
    sample — k centroids over billions of rows are statistically
    identical to k centroids over 100k, so iterating the full corpus
    ``max_iter`` times is pure waste at scale (below the cap the full
    data trains, so small-SF results are unchanged).
    """
    vec = df.withColumn(
        "__features", array_to_vector(F.array(*[F.col(c).cast("double") for c in feature_cols]))
    )
    n_rows = vec.count()
    train = (
        vec.sample(fraction=max_train_rows / n_rows, seed=seed)
        if max_train_rows and n_rows > max_train_rows
        else vec
    )
    # cache for the duration of the fit (KMeans re-evaluates its input
    # lineage per iteration) and coalesce: the capped training set is
    # small, so fit cost is per-iteration task-scheduling overhead —
    # 10 iterations x 32 near-empty tasks; 8 partitions is plenty for
    # <=100k rows and cuts the fit ~3x. Scoring still runs at full
    # parallelism over the uncoalesced data.
    train = train.coalesce(8).persist()
    try:
        model = KMeans(
            k=k,
            seed=seed,
            maxIter=max_iter,
            featuresCol="__features",
            predictionCol="cluster",
        ).fit(train)
    finally:
        train.unpersist()
    centers = model.clusterCenters()
    centers_df = vec.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cluster int, center array<double>",
    )
    scored = (
        model.transform(vec)
        .join(F.broadcast(centers_df), "cluster")
        .withColumn(
            "dist",
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        vector_to_array("__features"),
                        F.col("center"),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ),
        )
        .drop("__features", "center")
    )
    thr = scored.approxQuantile("dist", [quantile], 0.001)[0]
    return scored.withColumn("threshold", F.lit(thr)).withColumn(
        "is_anomaly", F.col("dist") > F.lit(thr)
    )


def lsh_neighbor_anomaly(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Isolation-by-density: hash vectors with random-projection LSH and
    count bucket occupancy across tables; low mean occupancy = isolated
    point. Returns (id, mean_bucket_size, is_anomaly) where anomalies are
    the bottom decile. All relational after the transform: explode hash
    tables -> count per bucket -> join back -> avg."""
    vec = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("__v")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="__v",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=seed,
    ).fit(vec)
    hashed = lsh.transform(vec).select(
        F.col(id_col),
        F.posexplode("__hashes").alias("table_idx", "h"),
    ).withColumn("bucket", F.concat_ws(":", "table_idx", vector_to_array("h")[0].cast("string")))
    occupancy = hashed.groupBy("bucket").agg(F.count(F.lit(1)).alias("bucket_n"))
    per_id = (
        hashed.join(occupancy, "bucket")
        .groupBy(id_col)
        .agg(F.avg("bucket_n").alias("mean_bucket_size"))
    )
    thr = per_id.approxQuantile("mean_bucket_size", [0.1], 0.001)[0]
    return per_id.withColumn("is_anomaly", F.col("mean_bucket_size") <= F.lit(thr))


def mllib_minhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """MLlib MinHashLSH near-dup join — the library cross-check for the
    hand-rolled LCG minhash (operators/dedup.py). Vectorizes the SAME
    3-gram shingle sets (bare word sets over a small vocabulary are
    non-discriminative — nearly every pair shares half the vocab);
    approxSimilarityJoin prunes via LSH buckets exactly like our banding,
    then computes exact Jaccard distance on survivors."""
    from pyspark.ml.feature import CountVectorizer

    from sarkac_spark.operators.dedup import shingles

    tokens = (
        shingles(df, id_col, text_col, n=3)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("__words"))
    )
    cv = CountVectorizer(
        inputCol="__words", outputCol="__tf", binary=True, minDF=1.0
    ).fit(tokens)
    # persist: the vectors are read three times (MinHashLSH.fit plus both
    # legs of the self-similarity join), and each re-read would otherwise
    # re-run the shingle explode + collect_set + vectorize lineage —
    # measured ~30% of query wall. Size is |docs| x nnz(shingle) ids,
    # MEMORY_AND_DISK default spills rather than OOMs at scale.
    vecs = cv.transform(tokens).select(id_col, "__tf").persist()
    mh = MinHashLSH(
        inputCol="__tf", outputCol="__hashes", numHashTables=num_tables, seed=seed
    ).fit(vecs)
    joined = mh.approxSimilarityJoin(vecs, vecs, 1.0 - threshold, distCol="jaccard_dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard_sim"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )

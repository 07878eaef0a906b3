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

Scoring-only twins (oracle-checkable): the *fits* are iterative, but
once the fit parameters exist the scoring stage of each model is pure
relational arithmetic a DuckDB oracle can verify — distance-to-center
(KMeans), floor(dot/bucketLength) occupancy (random-projection LSH),
per-table min-hash signature match + exact Jaccard (MinHashLSH's
approxSimilarityJoin). ``kmeans_score_1d`` / ``projection_density_score``
/ ``minhash_table_pairs`` below take the parameters as explicit values
(materialized literals), so the driver's hash gate covers the scoring
arithmetic while the fit itself stays rows-only checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.linalg import VectorUDT  # noqa: F401  (schema docs)
from sarkac_spark.plans.audit import lazy_checkpoint


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
    # localCheckpoint (not persist): the vectors are read three times
    # (MinHashLSH.fit plus both legs of the self-similarity join), and
    # each re-read would otherwise re-run the shingle explode +
    # collect_set + vectorize lineage — measured ~30% of query wall.
    # An explicit .persist() here leaked for the session (the returned
    # DataFrame's lineage pins the cache, so there is no safe place to
    # unpersist before the caller's action, and CacheManager never
    # auto-evicts); localCheckpoint materializes the same bounded
    # relation (|docs| x nnz(shingle) ids) but its RDD blocks are
    # reclaimed by the ContextCleaner once the result is unreferenced.
    # Fault-tolerance trade-off: localCheckpoint TRUNCATES lineage and
    # stores non-replicated executor-local blocks — an executor loss
    # between here and the caller's action makes the similarity join
    # unrecoverable (persist would recompute from lineage; this raises).
    # Acceptable for an interactive audit query whose caller just
    # re-runs; for a long pipeline stage, prefer persist + unpersist
    # after YOUR action, accepting the recompute-on-re-read cost.
    vecs = cv.transform(tokens).select(id_col, "__tf").localCheckpoint()
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


# --- scoring-only twins (oracle-checkable; fit params as literals) ----------

# Canonical 1-D centers: the seeded sf0.01 fit of the kmeans_anomaly
# query (KMeans k=4 seed=42 maxIter=10 over events.value), rounded to 6
# decimals. Scoring correctness is independent of where centers come
# from — these literals let DuckDB verify the exact same arithmetic.
KMEANS_SCORING_CENTERS = [16.411155, 211.961906, 116.319178, 58.371968]


def kmeans_score_1d(
    df: DataFrame,
    value_col: str,
    centers: list[float],
    quantile: float = 0.99,
) -> DataFrame:
    """KMeans SCORING stage over a 1-D feature with given centers: assign
    each row to its nearest center (ties to the lowest cluster id),
    distance = |value - center| rounded to 6, threshold = the EXACT
    interpolated ``quantile`` of the distance distribution (Spark
    ``percentile`` == DuckDB ``quantile_cont``, both (n-1)*q linear
    interpolation — unlike ``approxQuantile``'s engine-private sketch).
    Returns input + (cluster, dist, threshold, is_anomaly).

    Scale shape: scoring is map-only over the corpus (the centers ride
    as an array literal); the only aggregate is the quantile, a single
    exact percentile over the scored relation — replace with the
    histogram sketch at 100 TB if the distance sort becomes the
    bottleneck (operators/sketch.histogram_quantiles).
    """
    v = F.col(value_col).cast("double")
    dists = F.array(*[F.round(F.abs(v - F.lit(float(c))), 6) for c in centers])
    mind = F.array_min(dists)
    scored = (
        df.withColumn("dist", mind)
        .withColumn(
            "cluster", (F.array_position(dists, F.col("dist")) - 1).cast("int")
        )
    )
    thr = scored.agg(
        F.round(F.expr(f"percentile(dist, {quantile})"), 6).alias("threshold")
    )
    return scored.crossJoin(F.broadcast(thr)).withColumn(
        "is_anomaly", F.col("dist") > F.col("threshold")
    )


def projection_density_score(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 3,
    bucket_length: float = 0.5,
    salt: str = "mllsh",
    quantile: float = 0.1,
) -> DataFrame:
    """Random-projection LSH density SCORING with deterministic planes:
    bucket_t = floor(round(dot(v, plane_t), 6) / bucket_length) — exactly
    BucketedRandomProjectionLSH's hash algebra, with md5-derived
    Rademacher planes instead of the fit's private Gaussians (Charikar'02:
    symmetric independent coordinates suffice), so any engine rebuilds
    the same buckets. Occupancy per (table, bucket), mean over tables per
    id; anomalies = mean occupancy <= the EXACT ``quantile`` (bottom
    decile by default). Returns (id, mean_bucket_size, is_anomaly).

    Shape: one corpus scan for assignment (planes are one array literal,
    dots one higher-order transform), one bucket-sized aggregation, one
    equi-join back — the n_tables explode factor is map-side combined.
    """
    from sarkac_spark.operators.similarity import _as_double, _dot
    from sarkac_spark.operators.similarity import _rademacher_hyperplanes

    planes = _rademacher_hyperplanes(n_tables, dim, salt)
    planes_lit = F.array(*[F.array(*[F.lit(s) for s in hv]) for hv in planes])
    vec = _as_double(vec_col)
    dots = F.transform(planes_lit, lambda hv: F.round(_dot(vec, hv), 6))
    with_dots = df.select(F.col(id_col), dots.alias("__dots"))
    tables = F.array(
        *[
            F.struct(
                F.lit(t).cast("int").alias("t"),
                F.floor(
                    F.element_at(F.col("__dots"), t + 1) / F.lit(bucket_length)
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    # two barriers (r12): ``assigned`` feeds the occupancy agg AND the
    # join-back (partial-agg vs raw exchanges never collapse), and
    # ``per_id`` feeds the threshold agg AND the final projection —
    # without them the corpus dots pass ran 4x at runtime.
    assigned = (
        with_dots.select(F.col(id_col), F.explode(tables).alias("tb"))
        .select(id_col, F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))
        .transform(lazy_checkpoint)
    )
    occ = assigned.groupBy("t", "bucket").agg(F.count(F.lit(1)).alias("bucket_n"))
    per_id = (
        assigned.join(occ, ["t", "bucket"])
        .groupBy(id_col)
        .agg(F.round(F.avg("bucket_n"), 6).alias("mean_bucket_size"))
        .transform(lazy_checkpoint)
    )
    thr = per_id.agg(
        F.round(
            F.expr(f"percentile(mean_bucket_size, {quantile})"), 6
        ).alias("__thr")
    )
    return (
        per_id.crossJoin(F.broadcast(thr))
        .withColumn("is_anomaly", F.col("mean_bucket_size") <= F.col("__thr"))
        .drop("__thr")
    )


def minhash_table_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tables: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 3,
    lcg_offset: int = 16,
) -> DataFrame:
    """MinHashLSH approxSimilarityJoin SCORING algebra with deterministic
    coefficients: ``n_tables`` independent single-hash tables (signature
    = min over shingle hashes of the table's LCG variant — MLlib's
    numHashTables banding is exactly this OR-amplification), candidate
    pairs match on ANY table's signature, survivors get their EXACT
    Jaccard from the shingle-hash sets (approxSimilarityJoin's distCol
    recompute). Returns (id_a, id_b, jaccard_sim >= threshold), id_a <
    id_b. ``lcg_offset`` picks table coefficients disjoint from
    ``dedup_minhash``'s signature family (indices 0..k-1).

    Shape: the pair join is banded (per-table signature equi-join), the
    Jaccard recompute touches candidate pairs only — the same
    never-all-pairs discipline as operators/dedup.
    """
    from sarkac_spark.operators.dedup import (
        MINHASH_P,
        _LCG_A,
        _LCG_B,
        _hashed_shingles,
    )

    # the hashed-shingle relation feeds FOUR legs (signatures, set side
    # a, set side b, sizes) under different downstream keys — without a
    # barrier the shingle explode + md5 re-ran per leg (r12: 10 runtime
    # corpus scans for minhash_scoring). Materialize it once, lazily.
    hashed = _hashed_shingles(df, id_col, text_col, shingle_n).localCheckpoint(
        eager=False
    )
    sig_aggs = [
        F.min(
            (
                F.lit(_LCG_A[lcg_offset + t] % MINHASH_P) * F.col("h")
                + F.lit(_LCG_B[lcg_offset + t] % MINHASH_P)
            )
            % MINHASH_P
        ).alias(f"sig_{t}")
        for t in range(n_tables)
    ]
    sigs = hashed.groupBy(id_col).agg(*sig_aggs)
    tables = F.array(
        *[
            F.struct(F.lit(t).cast("int").alias("t"), F.col(f"sig_{t}").alias("sig"))
            for t in range(n_tables)
        ]
    )
    banded = sigs.select(F.col(id_col), F.explode(tables).alias("tb")).select(
        id_col, F.col("tb.t").alias("t"), F.col("tb.sig").alias("sig")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(b, ["t", "sig"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    ha = hashed.select(F.col(id_col).alias("id_a"), "h")
    hb = hashed.select(F.col(id_col).alias("id_b"), "h")
    inter = (
        cands.join(ha, "id_a")
        .join(hb, ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(F.count_distinct("h").alias("__inter"))
    )
    sizes = hashed.groupBy(id_col).agg(F.count_distinct("h").alias("__n"))
    jac = F.round(
        F.col("__inter")
        / (F.col("__na") + F.col("__nb") - F.col("__inter")),
        6,
    )
    # no broadcast hint: ``sizes`` is corpus-sized; AQE broadcasts the
    # (small) surviving-pair side instead when it fits
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb")),
            "id_b",
        )
        .withColumn("jaccard_sim", jac)
        .filter(F.col("jaccard_sim") >= float(threshold))
        .select("id_a", "id_b", "jaccard_sim")
    )


# --- deterministic Lloyd fit (the oracle-able iterative fit) ------------------


def lloyd_kmeans_1d(
    df: DataFrame,
    value_col: str,
    k: int = 4,
    n_iter: int = 4,
) -> DataFrame:
    """1-D k-means fit with FULLY deterministic, engine-independent
    semantics — the iterative-training member of the registry that a
    SQL oracle can verify value-by-value (the MLlib fits stay in the
    pytest-only ``fit_queries()`` surface: k-means|| init and Scala RNG
    hash functions are implementation-specific, so no oracle can
    recompute them).

    Semantics (mirrored 1:1 by the unrolled-CTE oracle):

    - init: centers = exact percentiles (2i+1)/2k of ``value_col``
      (linear interpolation — Spark ``percentile`` == DuckDB
      ``quantile_cont``), rounded to 6.
    - ``n_iter`` Lloyd steps: assign each row to the nearest center
      (ties -> lowest cluster id), then center_i = round(mean, 6) of
      its rows; an empty cluster keeps its old center. Rounding the
      centers each step is what makes the fit reproducible across
      engines: both sides feed IDENTICAL center values into the next
      assignment, so float summation-order drift never compounds.
    - output: one row per cluster under the FINAL centers —
      (cluster, center, n_pts, max_dist).

    100 TB shape: each iteration is one scan + one k-row aggregate
    (classic distributed Lloyd — the per-iteration collect is k rows,
    never data); the percentile init is one exact-percentile aggregate
    (swap for approx_percentile at extreme scale; kept exact here for
    the oracle gate). k and n_iter are constants, so the whole fit is
    k*n_iter bounded driver-side state.
    """
    spark = df.sparkSession
    quantiles = [(2 * i + 1) / (2 * k) for i in range(k)]
    qcsv = ", ".join(f"{q}D" for q in quantiles)
    init = df.select(
        F.expr(f"percentile({value_col}, array({qcsv}))").alias("qs")
    ).first()["qs"]
    centers = [round(float(c), 6) for c in init]

    def assign(frame: DataFrame, cents: list[float]) -> DataFrame:
        best = F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.abs(F.col(value_col) - F.lit(c)).alias("dist"),
                        F.lit(i).alias("cluster"),
                    )
                    for i, c in enumerate(cents)
                ]
            )
        )[0]
        return frame.withColumn("cluster", best["cluster"]).withColumn(
            "dist", best["dist"]
        )

    for _ in range(n_iter):
        means = {
            r["cluster"]: r["m"]
            for r in assign(df, centers)
            .groupBy("cluster")
            .agg(F.avg(value_col).alias("m"))
            .collect()
        }
        centers = [
            round(float(means[i]), 6) if means.get(i) is not None else centers[i]
            for i in range(k)
        ]

    cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], "cluster int, center double"
    )
    final = (
        assign(df, centers)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.round(F.max("dist"), 6).alias("max_dist"),
        )
    )
    # k-row left side keeps empty clusters (n_pts = 0); the k-row agg
    # side broadcasts (BuildRight — the only legal build side of a left
    # outer join)
    return (
        cents.join(F.broadcast(final), "cluster", "left")
        .select(
            "cluster",
            "center",
            F.coalesce(F.col("n_pts"), F.lit(0)).cast("long").alias("n_pts"),
            F.coalesce(F.col("max_dist"), F.lit(0.0)).alias("max_dist"),
        )
    )

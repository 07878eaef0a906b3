"""Streaming IVF top-k twin: stream ≡ batch, state bounded, resumable."""

from __future__ import annotations

import pytest

# e2e tier: real streaming queries / subprocess sessions — minutes each.
# Excluded from the default (driver-verify) fast run; the builder's
# once-per-round full run includes them (pytest -m "slow or not slow").
pytestmark = pytest.mark.slow


from pyspark.sql import functions as F

from sarkac_spark.operators.similarity import ivf_topk
from sarkac_spark.sources.tables import load_table
from sarkac_spark.streaming.stateful_ivf import streaming_ivf_topk

K, NPROBE, N_QUERIES, N_CENTROIDS = 3, 2, 6, 4


def _fixture(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return e, queries, centroids


def _final_snapshots(spark, out_dir):
    """Latest emitted snapshot per query = rows at that query's max n_seen."""
    res = spark.read.parquet(out_dir)
    last = res.groupBy("query_id").agg(F.max("n_seen").alias("n_seen"))
    return res.join(last, ["query_id", "n_seen"]).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


def test_streaming_ivf_topk_equals_batch(spark, sf_dir, tmp_path):
    """Drain the corpus through the stream in two chunks: the final
    per-query snapshot equals batch ivf_topk over the full corpus
    row-for-row (same rounding, same tiebreak), with a mid-stream STOP
    and RESUME from the checkpoint between the chunks — state (each
    query's retained top-k) survives restart by the same contract as
    the sigma engine."""
    e, queries, centroids = _fixture(spark, sf_dir)
    corpus = e.select("vec_id", "embedding").collect()
    schema = "vec_id long, embedding array<float>"
    # plant a zero-norm vector: its cosine is NULL on both arms; batch
    # sorts nulls last (never top-k while >= k finite candidates exist),
    # the stream drops it pre-state — equality must still hold and no
    # NaN may reach a snapshot
    zero_id = 10_000
    corpus = [(r.vec_id, r.embedding) for r in corpus]
    corpus.append((zero_id, [0.0] * 64))
    e = e.unionByName(
        spark.createDataFrame([(zero_id, [0.0] * 64, 0)],
                              "vec_id long, embedding array<float>, label int")
        .select(*e.columns)
    )
    src = tmp_path / "src"
    half = len(corpus) // 2
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = (
            streaming_ivf_topk(
                stream, queries, centroids, k=K, nprobe=NPROBE
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    spark.createDataFrame(corpus[:half], schema).coalesce(1).write.parquet(
        str(src / "b0")
    )
    run()
    mid = _final_snapshots(spark, out_dir).collect()
    assert mid  # first chunk already produced snapshots

    spark.createDataFrame(corpus[half:], schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    run()  # fresh query object, same checkpoint: top-k state resumes

    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in _final_snapshots(spark, out_dir).collect()
    )
    expect = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in ivf_topk(e, queries, centroids, k=K, nprobe=NPROBE).collect()
    )
    assert expect and got == expect


def test_streaming_ivf_state_bounded(spark, sf_dir, tmp_path):
    """State rows = |queries| regardless of how many vectors streamed
    through, each holding <= k entries — bounded by construction (the
    recall audit companion: snapshots monotonically improve, n_seen
    strictly grows with delivered candidates)."""
    e, queries, centroids = _fixture(spark, sf_dir)
    schema = "vec_id long, embedding array<float>"
    src = tmp_path / "src"
    e.select("vec_id", "embedding").coalesce(1).write.parquet(str(src / "b0"))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        streaming_ivf_topk(
            spark.readStream.schema(schema).parquet(str(src / "*")),
            queries,
            centroids,
            k=K,
            nprobe=NPROBE,
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    snaps = _final_snapshots(spark, out_dir)
    per_q = snaps.groupBy("query_id").count().collect()
    assert 0 < len(per_q) <= N_QUERIES
    assert all(r["count"] <= K for r in per_q)
    # within a query's snapshot: ranks contiguous, scores non-increasing
    for qid in [r.query_id for r in per_q]:
        rows = sorted(
            snaps.filter(F.col("query_id") == qid).collect(),
            key=lambda r: r.rank,
        )
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert all(
            rows[i].cos_sim >= rows[i + 1].cos_sim for i in range(len(rows) - 1)
        )

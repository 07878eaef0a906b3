"""Deterministic property checks for the MLlib anomaly models.

These queries are rows-only under the driver (iterative training has no
closed-form SQL oracle), so the regression guarantees live here instead:
planted structure must be recovered exactly — outliers flagged, planted
clusters kept together, near-dup pairs matching the exact Jaccard the
hand-rolled operator computes. Seeds are fixed; every assertion below is
deterministic.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sarkac_spark.operators.mllib_anomaly import (
    kmeans_anomaly,
    lsh_neighbor_anomaly,
    mllib_minhash_pairs,
)


def test_kmeans_recovers_planted_clusters_and_outliers(spark):
    """3 tight planted clusters + 2 far outliers: the outliers must be
    the flagged rows and each planted cluster must map to one label."""
    rows = []
    rid = 0
    centers = [(0.0, 0.0), (10.0, 10.0), (-10.0, 5.0)]
    for cx, cy in centers:
        for i in range(30):
            dx = 0.1 * ((i % 5) - 2)
            dy = 0.1 * ((i // 5) - 2)
            rows.append((rid, cx + dx, cy + dy))
            rid += 1
    # moderate outliers: far enough to flag (dist ~7 vs in-cluster ~0.3),
    # close enough that k-means++ D^2 seeding doesn't promote them to
    # centroids (which would merge two planted clusters instead)
    outlier_ids = [rid, rid + 1]
    rows.append((rid, 15.0, 15.0))
    rows.append((rid + 1, -15.0, 9.0))
    df = spark.createDataFrame(rows, "row_id long, x double, y double")

    out = kmeans_anomaly(df, ["x", "y"], k=3, quantile=0.97, seed=7)
    flagged = {r.row_id for r in out.filter("is_anomaly").collect()}
    assert set(outlier_ids) <= flagged
    # nothing inside the planted clusters may be flagged
    assert flagged <= set(outlier_ids) | set()

    # each planted cluster lands in exactly one k-means cluster
    labels = out.filter(~F.col("row_id").isin(outlier_ids)).collect()
    by_planted = {}
    for r in labels:
        by_planted.setdefault(r.row_id // 30, set()).add(r.cluster)
    assert all(len(s) == 1 for s in by_planted.values())
    # and the three planted clusters get three distinct labels
    assert len({s.pop() for s in by_planted.values()}) == 3


def test_lsh_isolation_flags_isolated_points(spark):
    """A dense grid shares buckets; far-away isolated points occupy
    near-empty buckets and must score the lowest occupancy."""
    rows = []
    rid = 0
    for i in range(10):
        for j in range(10):
            rows.append((rid, [float(i) * 0.2, float(j) * 0.2]))
            rid += 1
    isolated = [(rid, [500.0, 500.0]), (rid + 1, [-500.0, -400.0])]
    rows += isolated
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = lsh_neighbor_anomaly(df, bucket_length=1.0, num_tables=3, seed=7)
    scores = {r.vec_id: r.mean_bucket_size for r in out.collect()}
    iso_ids = {i for i, _ in isolated}
    dense_min = min(v for k, v in scores.items() if k not in iso_ids)
    assert all(scores[i] < dense_min for i in iso_ids)
    flagged = {r.vec_id for r in out.filter("is_anomaly").collect()}
    assert iso_ids <= flagged


def test_mllib_minhash_agrees_with_exact_jaccard(spark):
    """MLlib's approxSimilarityJoin computes EXACT Jaccard on LSH
    survivors, so every pair it returns must carry the same similarity
    as the hand-rolled exact operator (uncapped), and the planted
    near-dup pair must be found."""
    from sarkac_spark.operators.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    other = "completely different content with no overlap whatsoever here"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)], "doc_id long, text string"
    )

    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in mllib_minhash_pairs(df, threshold=0.3, seed=7).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got

    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.3, max_df=None
        ).collect()
    }
    for pair, sim in got.items():
        assert sim == pytest.approx(exact[pair], abs=1e-6)
    assert not any(4 in p for p in got)

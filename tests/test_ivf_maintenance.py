"""IVF maintenance loop (round-6 ask #4): a drifted corpus skews bucket
occupancy AND degrades nprobe=1 recall; `ivf_refit_decision` detects it,
`refit_ivf_centroids` repairs it, and recall@k recovers — measured with
the same `ann_recall` machinery the audit queries use."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from sarkac_spark.operators.similarity import (
    ann_recall,
    cosine_topk,
    ivf_bucket_stats,
    ivf_maintenance,
    ivf_refit_decision,
    ivf_topk,
    refit_ivf_centroids,
)

DIM = 8
K = 3


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _axis(i):
    v = [0.0] * DIM
    v[i] = 1.0
    return v


def _lcg_noise(seed, n):
    """Deterministic tiny jitter stream in [-0.15, 0.15] (no RNG import
    drama, reproducible across runs)."""
    x = seed
    out = []
    for _ in range(n):
        x = (1103515245 * x + 12345) % (2**31)
        out.append((x / 2**31 - 0.5) * 0.3)
    return out


def _drifted_corpus():
    """OLD world: centroids on the first 4 axes. NEW world: three
    clusters centered on the DIAGONALS between axis pairs (e0+e1,
    e0+e2, e0+e3) — every member is a coin-flip between the e0 bucket
    and its partner axis bucket under the stale centroids, so (a) the
    e0 bucket runs hot and (b) same-cluster neighbors split across
    buckets: skew AND recall loss at once, the classic drift shape."""
    rows = []
    vid = 0
    for ci, partner in enumerate([1, 2, 3]):
        center = [0.0] * DIM
        center[0] = 1.0
        center[partner] = 1.0
        for j in range(20):
            noise = _lcg_noise(ci * 1000 + j, DIM)
            vec = _unit([c + n for c, n in zip(center, noise)])
            rows.append((vid, ci, vec))
            vid += 1
    return rows


def _frames(spark):
    corpus = spark.createDataFrame(
        _drifted_corpus(), "vec_id long, cluster long, embedding array<double>"
    )
    stale = spark.createDataFrame(
        [(i, _axis(i)) for i in range(4)],
        "centroid_id long, embedding array<double>",
    )
    queries = corpus.filter(F.col("vec_id") % 5 == 0)
    return corpus, stale, queries


def _mean_recall(spark, corpus, centroids, queries):
    exact = cosine_topk(corpus, queries, k=K)
    approx = ivf_topk(corpus, queries, centroids, k=K, nprobe=1)
    rec = ann_recall(exact, approx, "ivf", K)
    return rec.agg(F.avg("recall")).collect()[0][0]


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_drift_skews_buckets_and_decision_fires(spark):
    corpus, stale, _ = _frames(spark)
    stats = {r.bucket: r.share for r in ivf_bucket_stats(corpus, stale).collect()}
    # every drifted cluster leans on e0: its bucket is hot
    assert stats[0] == max(stats.values())
    assert stats[0] > 2.0 / 4  # >2x the uniform share
    d = ivf_refit_decision(corpus, stale).collect()[0]
    assert d.needs_refit
    assert d.n_buckets == 4
    assert float(d.max_share) == stats[0]


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_refit_recovers_recall_after_drift(spark):
    corpus, stale, queries = _frames(spark)
    before = _mean_recall(spark, corpus, stale, queries)
    assert before < 0.9  # the drift genuinely hurt nprobe=1 recall

    new_cents, refitted, decision = ivf_maintenance(corpus, stale)
    assert refitted and decision["needs_refit"]
    after = _mean_recall(spark, corpus, new_cents, queries)
    assert after > before + 0.1
    assert after > 0.9  # same-cluster-same-bucket restored

    # and the repaired index is healthy: the decision no longer fires
    # under the same skew threshold (4 centroids over 3 clusters leaves
    # no >2x-uniform bucket once centers sit on the clusters)
    cents2, refitted2, decision2 = ivf_maintenance(corpus, new_cents)
    assert not refitted2 and not decision2["needs_refit"]
    assert cents2 is new_cents  # healthy => input relation untouched


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_refit_is_deterministic_and_capped(spark):
    corpus, _, _ = _frames(spark)
    a = refit_ivf_centroids(corpus, 4, max_train_rows=30).collect()
    b = refit_ivf_centroids(corpus, 4, max_train_rows=30).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))  # hash-sample + seed
    assert len(a) == 4

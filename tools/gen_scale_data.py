"""Deterministic scale-sweep corpus generator (documents + embeddings).

The driver's /root/testdata is read-only and stops at sf0.1, so every
scale claim in this repo (band caps, one-shuffle budgets) was
plan-asserted but never *measured* across a decade. This generator
produces corpora with the SAME shape as the driver's sf0.1 documents /
embeddings tables (vocab, words/doc, dup rates, cluster structure —
measured from the real sf0.1 files and hard-coded below) at any row
multiplier, so `tools/bench_scale_decade.py` can compare e.g. 1x vs 10x
runs of the dedup/ANN/sketch headliners where both corpora come from
the SAME process — scaling is isolated from distribution drift.

Shape measured from /root/testdata/sf0.1 (seed-42 driver data):
- documents: 5000 rows, 31-word vocabulary, ~54 words/doc,
  8 exact-duplicate pairs per 5000 docs, langs en(41%)/zh/es/fr/de,
  sources src0..src19, n_chars = len(text).
- embeddings: 2000 rows, 64-dim unit-norm float vectors in 10
  label clusters (centroid + noise, renormalized).

Everything is numpy + pyarrow (no Spark) and fully determined by
(multiplier, seed): re-running overwrites the same bytes.

Usage:
    python tools/gen_scale_data.py <out_dir> <multiplier>
    # e.g. python tools/gen_scale_data.py scale_data/x10 10
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_DOCS = 5000
BASE_EMBS = 2000
WORDS_PER_DOC = 54
DIM = 64
N_LABELS = 10
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
N_SOURCES = 20
# per 5000 docs: 8 exact-dup copies, 12 near-dup copies (a perturbed
# clone of an earlier doc — keeps minhash/ngram selectivity constant
# across multipliers so pair counts scale linearly, never quadratically)
EXACT_DUPS_PER_BASE = 8
NEAR_DUPS_PER_BASE = 12
VOCAB = [
    "agg", "batch", "big", "column", "data", "fast", "filter", "group",
    "hash", "join", "key", "line", "merge", "order", "part", "plan",
    "query", "row", "scan", "shuffle", "slow", "small", "sort", "spark",
    "stream", "table", "value", "window", "a", "the", "of",
]


def _vocab_for(n_docs: int) -> np.ndarray:
    """Heaps'-law vocabulary: V grows ~ sqrt(corpus size), anchored at
    the driver fixture's 31 words for the base 5000 docs. A FIXED vocab
    would densify the shingle space as the corpus grows — random
    cross-doc collisions (shared n-grams, close simhash fingerprints)
    then grow quadratically and swamp the planted duplicates, making
    every pair-producing operator look quadratic when the operator is
    fine and the corpus is just unrealistically repetitive. Real corpora
    grow vocabulary with size (Heaps exponent ~0.4-0.6); with V ~ m^0.5
    random-collision pairs grow ~ m^0.5 (sublinear) while planted dups
    grow ~ m, so the planted signal dominates the measurement."""
    mult = max(1.0, n_docs / BASE_DOCS)
    v = int(len(VOCAB) * mult**0.5)
    base = list(VOCAB)
    i = 0
    while len(base) < v:
        base.append(f"{VOCAB[i % len(VOCAB)]}{i // len(VOCAB)}x")
        i += 1
    return np.array(base)


def gen_documents(n_docs: int, rng: np.random.Generator) -> pa.Table:
    vocab = _vocab_for(n_docs)
    words = vocab[rng.integers(0, len(vocab), size=(n_docs, WORDS_PER_DOC))]
    texts = [" ".join(row) for row in words]

    # plant exact + near duplicates of earlier docs (clone target always
    # below the clone id, mirroring the fixture's min-id-canonical shape)
    n_exact = n_docs * EXACT_DUPS_PER_BASE // BASE_DOCS
    n_near = n_docs * NEAR_DUPS_PER_BASE // BASE_DOCS
    clone_ids = rng.choice(
        np.arange(n_docs // 2, n_docs), size=n_exact + n_near, replace=False
    )
    for j, cid in enumerate(clone_ids):
        src = int(rng.integers(0, n_docs // 2))
        t = texts[src].split(" ")
        if j >= n_exact:  # near dup: swap 3 words
            for pos in rng.integers(0, len(t), size=3):
                t[pos] = str(vocab[rng.integers(0, len(vocab))])
        texts[int(cid)] = " ".join(t)

    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources = np.array([f"src{i}" for i in rng.integers(0, N_SOURCES, n_docs)])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(
    n_vecs: int,
    rng: np.random.Generator,
    anisotropy: float | None = None,
) -> pa.Table:
    """``anisotropy`` (r11 ask #4): target eigenvalue spread of the
    covariance. None keeps the near-isotropic default (measured spread
    ~4x — the regime where PCA-before-PQ is a wash). A value like 100
    or 1000 shapes the spectrum geometrically (var_j proportional to
    anisotropy^(-j/(DIM-1))) and then hides the axes behind a fixed
    random orthogonal mix — the documented clip/text-encoder regime,
    where the principal directions do NOT align with PQ's fixed
    subspace split. Unit-norm is preserved either way (the cosine
    contract of the table); report the MEASURED spread, which the
    normalization compresses somewhat."""
    centroids = rng.normal(size=(N_LABELS, DIM))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=n_vecs)
    vecs = centroids[labels] + 0.6 * rng.normal(size=(n_vecs, DIM))
    if anisotropy is not None and anisotropy > 1:
        scales = np.power(
            float(anisotropy), -np.arange(DIM) / (DIM - 1)
        ) ** 0.5
        q, _ = np.linalg.qr(rng.normal(size=(DIM, DIM)))
        vecs = (vecs * scales) @ q.T
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


BASE_EVENTS = 100_000
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
EVENT_BASE_VALUE = {"click": 10.0, "error": 50.0, "purchase": 120.0,
                    "signup": 5.0, "view": 2.0}


def gen_events(
    n_events: int, rng: np.random.Generator, skew: float | None = None
) -> pa.Table:
    """Driver-shaped events table (event_id, ts µs over 30 days,
    user_id, event_type, value, props). ``skew`` is the hot-key knob
    (VERDICT r7 #5): None gives the driver's uniform 5-type split;
    0.9 routes 90% of rows to ONE event_type ('view') — the "one
    topic/series is 90% of the stream" shape that breaks a grouped agg
    whose partial aggregation doesn't hold (a full shuffle on the
    skewed key funnels 90% of rows through one reducer)."""
    if skew is None:
        p = np.full(len(EVENT_TYPES), 1.0 / len(EVENT_TYPES))
    else:
        rest = (1.0 - skew) / (len(EVENT_TYPES) - 1)
        p = np.array([rest, rest, rest, rest, skew])  # 'view' is hot
    types = rng.choice(EVENT_TYPES, size=n_events, p=p)
    base = np.vectorize(EVENT_BASE_VALUE.get)(types)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = t0 + rng.integers(0, span_us, size=n_events).astype("timedelta64[us]")
    n_users = max(10, int(1500 * max(1.0, n_events / BASE_EVENTS) ** 0.5))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n_events), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n_events), pa.int64()
            ),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(
                np.round(base + rng.normal(0, 3.0, size=n_events), 2),
                pa.float64(),
            ),
            "props": pa.array(
                [f'{{"region": "r{int(u) % 7}"}}'
                 for u in rng.integers(0, 7, size=n_events)],
                pa.string(),
            ),
        }
    )


def generate(
    out_dir: str,
    multiplier: float,
    seed: int = 42,
    event_skew: float | None = None,
) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    n_docs = int(BASE_DOCS * multiplier)
    n_embs = int(BASE_EMBS * multiplier)
    n_events = int(BASE_EVENTS * multiplier)
    rng = np.random.default_rng(seed)
    pq.write_table(gen_documents(n_docs, rng), os.path.join(out_dir, "documents.parquet"))
    pq.write_table(gen_embeddings(n_embs, rng), os.path.join(out_dir, "embeddings.parquet"))
    pq.write_table(
        gen_events(n_events, rng, skew=event_skew),
        os.path.join(out_dir, "events.parquet"),
    )
    meta = {"multiplier": multiplier, "seed": seed, "n_docs": n_docs,
            "n_embs": n_embs, "n_events": n_events, "event_skew": event_skew}
    with open(os.path.join(out_dir, "META.json"), "w") as f:
        json.dump(meta, f)
    return meta


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "scale_data/x1"
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    print(json.dumps(generate(out, mult)))

"""LLM-training-data pipeline queries (beyond-reference mandate,
BASELINE.json): dedup family, similarity search, text analysis — all over
the driver's ``documents`` / ``embeddings`` tables, each with a DuckDB
oracle built from the same md5-derived hash machinery so results match
bit-for-bit.

The verbose oracle SQL (60 simhash bit sums, banded minhash) is
*generated* by the same Python loops that build the Spark plans —
one source of truth for constants like k/bands/thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sarkac_spark.operators.dedup import (
    _LCG_A,
    _LCG_B,
    MINHASH_MAX_BAND_DF,
    MINHASH_P,
    SIMHASH_BITS,
    dedup_exact,
    dedup_minhash,
    dedup_simhash,
    ngram_jaccard_pairs,
)
from sarkac_spark.operators.bpe import bpe_apply_sql
from sarkac_spark.operators.similarity import cosine, cosine_topk, ivf_topk, lsh_topk
from sarkac_spark.operators.text import (
    STOPWORDS,
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from sarkac_spark.sources.tables import load_table

MINHASH_K = 16
MINHASH_BANDS = 4
JACCARD_THRESHOLD = 0.5
SIMHASH_MAX_HAMMING = 3
# the synthetic embeddings have no true near-dups (max pairwise cosine
# ~0.51); 0.45 exercises the operator with a non-trivial result set
EMB_NEARDUP_THRESHOLD = 0.45
TOPK = 3
N_QUERIES = 10  # vec_id < 10 are the query vectors
N_CENTROIDS = 8  # vec_id < 8 double as IVF centroids
# 4 bits/table: on this corpus (near-random embeddings, top neighbors at
# cos~0.5) recall is ~0.3 at ~5x candidate pruning; real near-dup corpora
# sit far right of this operating point. More bits => more pruning.
LSH_BITS = 4
LSH_TABLES = 3  # multi-table union lifts recall
EMB_DIM = 64  # driver embeddings are 64-dim (TESTDATA.md)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --- queries -----------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return dedup_exact(_docs(spark, sf_dir), "doc_id", "text")


def q_dedup_signatures(spark, sf_dir):
    """The materialized dedup-signature relation itself, as an
    oracle-checked witness (round-7: the store
    IncrementalDedupPipeline persists per epoch and dedups against
    instead of re-reading corpus text): one row per (doc, LSH band key)
    with the exact-dedup fingerprint and the shingle-set size. Docs
    shorter than the shingle width keep a NULL band key - present for
    exact dedup, invisible to banding, exactly the operator contract."""
    from sarkac_spark.operators.dedup import dedup_signatures

    sig = dedup_signatures(
        _docs(spark, sf_dir), "doc_id", "text", k=MINHASH_K,
        bands=MINHASH_BANDS,
    )
    return sig.select(
        "doc_id",
        "text_hash",
        F.explode_outer("band_keys").alias("band_key"),
        F.size("sh_set").cast("long").alias("n_shingles"),
    )


def _dedup_signatures_sql() -> str:
    rows = MINHASH_K // MINHASH_BANDS
    mh_aggs = ",\n    ".join(
        f"min(({_LCG_A[i] % MINHASH_P} * h + {_LCG_B[i] % MINHASH_P}) % {MINHASH_P})"
        f" AS mh_{i}"
        for i in range(MINHASH_K)
    )
    band_exprs = ",\n      ".join(
        "'{b}|' || {cols}".format(
            b=b,
            cols=" || '|' || ".join(
                f"mh_{b * rows + r}::varchar" for r in range(rows)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::bigint % {MINHASH_P} AS h
  FROM sh
),
sigs AS (
  SELECT doc_id, {mh_aggs}
  FROM hashed GROUP BY doc_id
),
bands AS (
  SELECT doc_id, UNNEST([
      {band_exprs}
  ]) AS band_key FROM sigs
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1)
SELECT d.doc_id, md5(d.text) AS text_hash, b.band_key,
       coalesce(sz.n_sh, 0) AS n_shingles
FROM documents d
LEFT JOIN bands b ON b.doc_id = d.doc_id
LEFT JOIN sizes sz ON sz.doc_id = d.doc_id
"""


def q_dedup_minhash(spark, sf_dir):
    return dedup_minhash(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=JACCARD_THRESHOLD,
    )


def q_dedup_simhash(spark, sf_dir):
    return dedup_simhash(
        _docs(spark, sf_dir), "doc_id", "text", max_hamming=SIMHASH_MAX_HAMMING
    )


# hot-shingle cap: bounds per-shingle join fanout at NGRAM_MAX_DF^2/2
# (mirrored in the oracle; see operators/dedup.ngram_jaccard_pairs)
NGRAM_MAX_DF = 256

# span dedup: fixed word-window segmentation (the synthetic corpus has no
# newline/sentence structure); temperature mixing: sqrt tempering
SPAN_WORDS = 10
TEMP_ALPHA = 0.5
VOCAB_TOP_K = 40
PACK_BUDGET = 200  # tokens/sequence; docs are ~30-40 words
PACK_GROUPS = 8


def q_doc_lm_score(spark, sf_dir):
    """LM-based quality score per document: mean negative log-prob of
    its bigrams under the corpus's add-one-smoothed bigram model."""
    from sarkac_spark.operators.text import doc_lm_score

    return doc_lm_score(_docs(spark, sf_dir))


def q_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve over the corpus: cumulative token share
    covered by a vocab truncated at each of the top-40 terms."""
    from sarkac_spark.operators.text import vocab_coverage

    return vocab_coverage(_docs(spark, sf_dir), "text", top_k=VOCAB_TOP_K)


def q_pack_sequences(spark, sf_dir):
    """Deterministic sequence packing: documents dealt into hash groups
    and cut into ~200-token training sequences (stable across re-runs)."""
    from sarkac_spark.operators.sampling import pack_sequences
    from sarkac_spark.operators.text import token_count

    d = _docs(spark, sf_dir)
    return pack_sequences(
        d,
        "doc_id",
        token_count("text"),
        budget=PACK_BUDGET,
        n_groups=PACK_GROUPS,
    ).select("doc_id", "pack_group", "seq_id", "seq_pos")


HOT_SPANS_TOP_K = 20


def q_hot_spans(spark, sf_dir):
    """Boilerplate audit: the most-duplicated spans (exactly the units
    span_dedup deduplicates) — the pre-commit evidence of WHAT a span
    pass will remove."""
    from sarkac_spark.operators.dedup import hot_spans

    return hot_spans(
        _docs(spark, sf_dir), "doc_id", "text",
        span_words=SPAN_WORDS, top_k=HOT_SPANS_TOP_K,
    )


def q_span_dedup(spark, sf_dir):
    """C4-style cross-corpus span dedup: later occurrences of a repeated
    10-word span are dropped, documents reassembled from survivors."""
    from sarkac_spark.operators.dedup import span_dedup

    return span_dedup(_docs(spark, sf_dir), "doc_id", "text", span_words=SPAN_WORDS)


def q_temperature_sample(spark, sf_dir):
    """Temperature-balanced corpus sample (p_l ∝ count_l^0.5): head
    languages thinned toward the tempered mixture, deterministic
    hash-Bernoulli, rate table broadcast."""
    from sarkac_spark.operators.sampling import temperature_sample

    return temperature_sample(
        _docs(spark, sf_dir), "doc_id", "lang", alpha=TEMP_ALPHA
    ).select("doc_id", "lang")


def q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        threshold=JACCARD_THRESHOLD,
        max_df=NGRAM_MAX_DF,
    )


def q_embedding_neardup(spark, sf_dir):
    from sarkac_spark.operators.similarity import cosine_all_pairs

    return cosine_all_pairs(
        _embs(spark, sf_dir), threshold=EMB_NEARDUP_THRESHOLD
    )


def q_cosine_topk(spark, sf_dir):
    e = _embs(spark, sf_dir)
    return cosine_topk(e, e.filter(F.col("vec_id") < N_QUERIES), k=TOPK)


def q_ivf_topk(spark, sf_dir):
    e = _embs(spark, sf_dir)
    centroids = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return ivf_topk(e, e.filter(F.col("vec_id") < N_QUERIES), centroids, k=TOPK)


def q_ivf_bucket_stats(spark, sf_dir):
    """IVF index-health audit: bucket occupancy + corpus share for the
    same centroid set ivf_topk serves from — probe cost follows bucket
    size, so this is the imbalance evidence a re-fit decision needs."""
    from sarkac_spark.operators.similarity import ivf_bucket_stats

    e = _embs(spark, sf_dir)
    centroids = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return ivf_bucket_stats(e, centroids)


def _ivf_bucket_stats_sql() -> str:
    cent_cos = _COS.format(a="v.v", b="c.v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS bucket, v FROM e WHERE vec_id < {N_CENTROIDS}),
ranked AS (
  SELECT v.vec_id, c.bucket, row_number() OVER (
    PARTITION BY v.vec_id ORDER BY {cent_cos} DESC, c.bucket
  ) AS rn
  FROM e v CROSS JOIN cents c
),
counts AS (
  SELECT bucket, count(*) AS n_vecs FROM ranked WHERE rn = 1 GROUP BY bucket
)
SELECT bucket, n_vecs,
       round(n_vecs / (SELECT sum(n_vecs) FROM counts), 6) AS share
FROM counts
"""


def q_pq_distortion(spark, sf_dir):
    """PQ codebook-health audit: per-subspace summed quantization error
    in integer micro-units - the k-means-cost trend that tells a
    maintenance cron when fit_pq_codebooks should re-run (the PQ
    counterpart of ivf_refit_decision)."""
    from sarkac_spark.operators.pq import PQ_CODEBOOKS, pq_distortion

    return pq_distortion(_embs(spark, sf_dir), PQ_CODEBOOKS)


def _pq_distortion_sql() -> str:
    return f"""
WITH {_pq_codes_cte()}
SELECT m, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CAST(round(d * 1000000) AS BIGINT)) AS BIGINT)
         AS total_sqdist_micro
FROM (SELECT vec_id, m, min(d) AS d FROM sub GROUP BY 1, 2)
GROUP BY m
"""


def q_ivf_refit_decision(spark, sf_dir):
    """The IVF maintenance GATE (round-6 ask #4): bucket-occupancy
    evidence reduced to one row — (n_buckets, n_occupied, max_share,
    needs_refit). `needs_refit` drives `ivf_maintenance` (seeded KMeans
    re-fit on a hash-sample + re-assign; drift-recovery proven in
    tests/test_ivf_maintenance.py). The decision itself is pure
    relational work, so unlike the fit it is oracle-checked."""
    from sarkac_spark.operators.similarity import ivf_refit_decision

    e = _embs(spark, sf_dir)
    centroids = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return ivf_refit_decision(e, centroids)


def _ivf_refit_decision_sql() -> str:
    cent_cos = _COS.format(a="v.v", b="c.v")
    threshold = round(2.0 / N_CENTROIDS, 6)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS bucket, v FROM e WHERE vec_id < {N_CENTROIDS}),
ranked AS (
  SELECT v.vec_id, c.bucket, row_number() OVER (
    PARTITION BY v.vec_id ORDER BY {cent_cos} DESC, c.bucket
  ) AS rn
  FROM e v CROSS JOIN cents c
),
counts AS (
  SELECT bucket, count(*) AS n_vecs FROM ranked WHERE rn = 1 GROUP BY bucket
),
shares AS (
  SELECT bucket,
         round(n_vecs / (SELECT sum(n_vecs) FROM counts), 6) AS share
  FROM counts
)
SELECT CAST({N_CENTROIDS} AS BIGINT) AS n_buckets,
       CAST(count(*) AS BIGINT) AS n_occupied,
       max(share) AS max_share,
       (max(share) > {threshold} OR count(*) < {N_CENTROIDS}) AS needs_refit
FROM shares
"""


def q_text_ivfpq(spark, sf_dir):
    """Raw-text retrieval END-TO-END (round-6 ask #5): documents →
    hash_embed (deterministic, no encoder) → fit-free IVF coarse
    buckets (the first N docs' vectors as centroids, the vec_id<8
    precedent) → IVF-PQ ADC ranking against the shipped
    TEXT_PQ_CODEBOOKS literal. The whole no-model retrieval stack at
    the query level, over the `documents` table only — the query never
    touches a raw float vector outside its own distance tables.
    Recall floor vs exact cosine on the same vectors pinned in
    tests/test_pq.py."""
    from sarkac_spark.operators.pq import TEXT_PQ_CODEBOOKS, ivfpq_topk
    from sarkac_spark.operators.text import hash_embed

    # lazy checkpoint: ivfpq_topk derives corpus buckets, PQ codes and
    # queries from the SAME relation, and the centroid dim filters it
    # too — without a barrier each leg re-runs the full hash_embed
    # (explode + two shuffles). One materialization serves all four.
    emb = hash_embed(
        _docs(spark, sf_dir), "doc_id", "text", dim=EMB_DIM
    ).localCheckpoint(eager=False)
    centroids = emb.filter(F.col("doc_id") < N_CENTROIDS).select(
        F.col("doc_id").alias("centroid_id"), "embedding"
    )
    return ivfpq_topk(
        emb,
        TEXT_PQ_CODEBOOKS,
        centroids,
        id_col="doc_id",
        n_queries=N_QUERIES,
        k=TOPK,
        nprobe=2,
    )


def _hash_vec_cte(dim: int = EMB_DIM) -> str:
    """CTE chain ending in e(vec_id, v DOUBLE[]) — the hash_embed
    relation assembled into per-doc vectors, shared by the raw-text
    retrieval oracles. Mirrors _hash_embed_sql exactly."""
    return f"""w AS (
  SELECT doc_id, lower(u.t) AS t FROM documents, UNNEST({_WORDS}) AS u(t)
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS hv FROM w
),
sb AS (
  SELECT doc_id, hv % {dim} AS b,
         CASE WHEN hv % {2 * dim} >= {dim} THEN -1 ELSE 1 END AS s
  FROM h
),
pb AS (SELECT doc_id, b, CAST(sum(s) AS BIGINT) AS v FROM sb GROUP BY 1, 2),
grid AS (
  SELECT d.doc_id, r.j
  FROM (SELECT DISTINCT doc_id FROM pb) d, range(0, {dim}) r(j)
),
dense AS (
  SELECT g.doc_id, g.j, coalesce(pb.v, 0) AS v
  FROM grid g LEFT JOIN pb ON pb.doc_id = g.doc_id AND pb.b = g.j
),
nrm AS (
  SELECT doc_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS n FROM dense GROUP BY 1
),
hv AS (
  SELECT d.doc_id, d.j,
         CASE WHEN n.n > 0 THEN round(d.v / n.n, 6) ELSE 0.0 END AS v
  FROM dense d JOIN nrm n USING (doc_id)
),
e AS (
  SELECT doc_id AS vec_id, list(v ORDER BY j) AS v FROM hv GROUP BY doc_id
)"""


def _text_ivfpq_sql(nprobe: int = 2) -> str:
    from sarkac_spark.operators.pq import TEXT_PQ_CODEBOOKS

    cent_cos = _COS.format(a="v.v", b="c.v")
    return f"""
WITH {_hash_vec_cte()},
cb(m, c, cent) AS (VALUES
  {_pq_cb_values(TEXT_PQ_CODEBOOKS)}),
sub AS (
  SELECT e.vec_id, cb.m, cb.c,
         round(list_sum(list_transform(range(1, 9),
               j -> (v[cb.m * 8 + j] - cent[j]) * (v[cb.m * 8 + j] - cent[j])
         )), 6) AS d
  FROM e CROSS JOIN cb
),
best AS (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rn
    FROM sub
  ) WHERE rn = 1
),
cents AS (SELECT vec_id AS bucket, v FROM e WHERE vec_id < {N_CENTROIDS}),
ivfranked AS (
  SELECT v.vec_id, c.bucket, row_number() OVER (
    PARTITION BY v.vec_id ORDER BY {cent_cos} DESC, c.bucket
  ) AS rn
  FROM e v CROSS JOIN cents c
),
assign_all AS (SELECT vec_id, bucket FROM ivfranked WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, bucket FROM ivfranked
  WHERE rn <= {nprobe} AND vec_id < {N_QUERIES}
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
tab AS (
  SELECT q.query_id, cb.m, cb.c AS code,
         round(list_sum(list_transform(range(1, 9),
               j -> (qv[cb.m * 8 + j] - cent[j]) * (qv[cb.m * 8 + j] - cent[j])
         )), 6) AS d
  FROM q CROSS JOIN cb
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assign_all a
    ON a.bucket = p.bucket AND a.vec_id != p.query_id
),
adist AS (
  SELECT c.query_id, c.vec_id,
         CAST(sum(CAST(round(t.d * 1000000) AS BIGINT)) AS BIGINT)
           AS adist_micro
  FROM cand c
  JOIN best b ON b.vec_id = c.vec_id
  JOIN tab t ON t.query_id = c.query_id AND t.m = b.m AND t.code = b.c
  GROUP BY 1, 2
)
SELECT query_id, vec_id AS neighbor_id, adist_micro, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adist_micro, vec_id
  ) AS rank FROM adist
) WHERE rank <= {TOPK}
"""


IVF_NPROBE = 2  # the multi-probe recall lever, oracle-mirrored


def q_ivf_probe2(spark, sf_dir):
    """Multi-probe IVF: same index, nprobe=2 — the recall/latency dial
    demonstrated as a first-class parameter (candidates from the two
    nearest centroid buckets per query)."""
    e = _embs(spark, sf_dir)
    centroids = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return ivf_topk(
        e, e.filter(F.col("vec_id") < N_QUERIES), centroids, k=TOPK,
        nprobe=IVF_NPROBE,
    )


def q_lsh_topk(spark, sf_dir):
    """Sign-LSH bucketed ANN (training-free scale path: md5-derived
    Rademacher hyperplanes, multi-table candidate union, exact cosine
    on candidates only)."""
    e = _embs(spark, sf_dir)
    return lsh_topk(
        e,
        e.filter(F.col("vec_id") < N_QUERIES),
        dim=EMB_DIM,
        k=TOPK,
        n_bits=LSH_BITS,
        n_tables=LSH_TABLES,
    )


def q_ann_recall(spark, sf_dir):
    """Recall@k of both approximate ANN paths (IVF, sign-LSH) against
    the exact brute-force baseline, per query vector — the tuning
    report to run before trusting approximate parameters at scale.

    The three top-k relations are k·|queries| rows — result sets, not
    corpora — but each is referenced by multiple joins, and Spark
    re-derives lineage per reference (the exact baseline would run its
    corpus scan three times). ``localCheckpoint(eager=False)``
    materializes each once AT FIRST ACTION — lazily, so that merely
    *building* this DataFrame (the plan sweep, plan_report) runs no
    jobs; at scale you'd persist tuning inputs before evaluation for
    exactly the same reason."""
    from sarkac_spark.operators.similarity import ann_recall

    exact = q_cosine_topk(spark, sf_dir).localCheckpoint(eager=False)
    ivf = q_ivf_topk(spark, sf_dir).localCheckpoint(eager=False)
    lsh = q_lsh_topk(spark, sf_dir).localCheckpoint(eager=False)
    return ann_recall(exact, ivf, "ivf", k=TOPK).unionByName(
        ann_recall(exact, lsh, "lsh", k=TOPK)
    )


def q_token_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
        doc_fingerprint("text").alias("fingerprint"),
    )


def q_quality_score(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return quality_score(d, "text").select(
        "doc_id",
        "n_words",
        "unique_ratio",
        "mean_word_len",
        "punct_ratio",
        "digit_ratio",
        "quality_score",
    )


def q_lang_id(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir), "doc_id", "text")


def q_multimodal_payload(spark, sf_dir):
    """Multimodal binary plumbing on oracle-checkable data: document text
    bytes stand in for opaque media payloads (no media tables ship in the
    test env); exercises operators/multimodal.payload_stats — byte-level
    stats without decoding, JVM-side only."""
    from sarkac_spark.operators.multimodal import payload_stats

    d = _docs(spark, sf_dir)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return payload_stats(media)


# stratified-sampling contract: downsample dominant en, light trim on
# the rest, half-rate for unknown strata; 10% eval split
SAMPLE_RATES = {"en": 0.3, "zh": 0.9, "es": 0.9, "de": 0.9, "fr": 0.9}
SAMPLE_DEFAULT_RATE = 0.5
EVAL_RATE = 0.1
QUALITY_CUTOFF = 0.65  # ~median of the synthetic corpus — non-trivial


def q_stratified_sample(spark, sf_dir):
    """Deterministic curation sampling: per-language Bernoulli rates
    (hash-of-id, not rand() — reproducible across runs/retries/engines)
    plus a disjoint train/eval split label."""
    from sarkac_spark.operators.sampling import stratified_sample, train_eval_split

    d = _docs(spark, sf_dir)
    sampled = stratified_sample(
        d, "doc_id", "lang", SAMPLE_RATES, default_rate=SAMPLE_DEFAULT_RATE
    )
    return train_eval_split(sampled, "doc_id", eval_rate=EVAL_RATE).select(
        "doc_id", "lang", "split"
    )


# decontamination contract: a (eval, train) pair is contaminated when it
# shares >= 3 distinct trigram shingles (1-2 shared trigrams is phrase-
# level coincidence in this corpus; the planted near-dup groups share 20+)
DECONTAM_MIN_SHARED = 3
DECONTAM_MAX_TRAIN_DF = 256  # boilerplate-shingle cap, mirrored in oracle
SPAN_MIN_RUN = 2  # contamination_spans: >= 2 consecutive matching 3-grams


def q_decontamination(spark, sf_dir):
    """Train/eval benchmark decontamination: deterministic hash split,
    then every cross-split doc pair sharing >= min_shared shingles —
    the audit relation a pipeline drops eval leaks by."""
    from sarkac_spark.operators.dedup import cross_contamination
    from sarkac_spark.operators.sampling import train_eval_split

    s = train_eval_split(_docs(spark, sf_dir), "doc_id", eval_rate=EVAL_RATE)
    return cross_contamination(
        s.filter(F.col("split") == "train"),
        s.filter(F.col("split") == "eval"),
        "doc_id",
        "text",
        min_shared=DECONTAM_MIN_SHARED,
        max_train_df=DECONTAM_MAX_TRAIN_DF,
    )


def q_tfidf_terms(spark, sf_dir):
    """Top-3 characteristic terms per doc by smoothed TF-IDF."""
    from sarkac_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k=3)


def q_quantize_audit(spark, sf_dir):
    """Per-vector int8 quantization scale + worst reconstruction error."""
    from sarkac_spark.operators.similarity import quantize_int8_error

    return quantize_int8_error(_embs(spark, sf_dir))


def q_embedding_health(spark, sf_dir):
    """Per-label embedding health gate (dims/zeros/NaN) — integer-exact."""
    from sarkac_spark.operators.similarity import embedding_health

    return embedding_health(_embs(spark, sf_dir))


def q_inverted_index(spark, sf_dir):
    """Shingle -> sorted posting lists for discriminating shingles
    (df in [2, 10]); the containment-lookup / candidate-gen index.

    The driver's pandas canonicalizer cannot sort array cells
    (round-1 red row), so the posting list is emitted as a
    comma-joined string; the operator itself keeps the typed array.
    """
    from sarkac_spark.operators.dedup import inverted_index

    idx = inverted_index(_docs(spark, sf_dir), n=3, min_df=2, max_df=10)
    return idx.withColumn(
        "postings",
        F.array_join(F.col("postings").cast("array<string>"), ","),
    )


def q_length_deciles(spark, sf_dir):
    """Equal-frequency length deciles of the corpus (exact percentile
    boundaries broadcast; no global sort)."""
    from sarkac_spark.operators.profiling import quantile_bucket_stats

    return quantile_bucket_stats(_docs(spark, sf_dir), "n_chars", n_buckets=10)


def q_top_terms(spark, sf_dir):
    """Top-50 corpus heavy-hitter terms with document frequency."""
    from sarkac_spark.operators.text import top_terms

    return top_terms(_docs(spark, sf_dir), k=50)


BIGRAM_MIN_HEAD = 20


def q_bigram_lm(spark, sf_dir):
    """Top-3 next-word transitions per frequent head word."""
    from sarkac_spark.operators.text import bigram_transitions

    return bigram_transitions(
        _docs(spark, sf_dir), min_head_count=BIGRAM_MIN_HEAD, k=3
    )


PER_LANG_BUDGET = 30


def q_per_lang_sample(spark, sf_dir):
    """Fixed per-group budget: exactly min(30, |lang|) docs per language
    by deterministic hash rank — reservoir sampling without rand()."""
    from sarkac_spark.operators.sampling import sample_per_group

    return sample_per_group(
        _docs(spark, sf_dir), "doc_id", "lang", PER_LANG_BUDGET
    ).select("doc_id", "lang")


DOMAIN_CAP = 10


def q_domain_cap(spark, sf_dir):
    """Per-source quota, quality-ordered: keep the 10 longest docs per
    source (ties to smallest id) — the per-domain cap that stops one
    site dominating the corpus while keeping its best pages."""
    from sarkac_spark.operators.sampling import domain_cap

    return domain_cap(
        _docs(spark, sf_dir), "source", DOMAIN_CAP, "n_chars", "doc_id"
    ).select("doc_id", "source", "n_chars", "domain_rank")


def q_lang_jaccard(spark, sf_dir):
    """Corpus-pair lexical overlap: Jaccard of distinct-unigram
    vocabularies for every language pair — the cross-lingual
    contamination / source-merge audit view."""
    from sarkac_spark.operators.text import group_vocab_jaccard

    return group_vocab_jaccard(_docs(spark, sf_dir), "lang", "text")


CHUNK_WORDS = 40
CHUNK_OVERLAP = 8


def q_chunk_documents(spark, sf_dir):
    """Context-window prep: fixed word-budget chunks with overlap,
    map-only (sequence + slice + one explode)."""
    from sarkac_spark.operators.text import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir),
        chunk_words=CHUNK_WORDS,
        overlap=CHUNK_OVERLAP,
    )


# repetition contract, tuned to the synthetic small-vocab corpus (median
# distinct_word_frac ~0.46): flags ~22% at sf0.01
REP_TOP_BIGRAM_FRAC = 0.1
REP_MIN_DISTINCT_WORD_FRAC = 0.35


def q_repetition_filter(spark, sf_dir):
    """Gopher-style repetition gate: dominant-bigram fraction +
    collapsed-vocabulary fraction per doc, with the combined flag."""
    from sarkac_spark.operators.text import repetition_features

    return repetition_features(
        _docs(spark, sf_dir),
        max_top_bigram_frac=REP_TOP_BIGRAM_FRAC,
        min_distinct_word_frac=REP_MIN_DISTINCT_WORD_FRAC,
    )


def q_profile_documents(spark, sf_dir):
    """Corpus intake profiling: nulls/cardinality/bounds for every
    documents column, one aggregation pass."""
    from sarkac_spark.operators.profiling import profile_columns

    return profile_columns(_docs(spark, sf_dir))


def q_pii_redaction(spark, sf_dir):
    """PII scrubbing end-to-end: the synthetic corpus has no PII, so the
    query first PLANTS deterministic doc_id-derived PII spans (identical
    construction in the oracle), then counts and redacts them — the
    regex machinery is what's under test, not the fixture."""
    from sarkac_spark.operators.text import redact_pii

    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    planted = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(F.lit(" contact user"), s(did), F.lit("@example.com now")),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(F.lit(" ssn 123-45-"), F.lpad(s(did % 10000), 4, "0")),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad(s(did % 1000), 3, "0"),
                    F.lit("-"),
                    F.lpad(s(did % 10000), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 11 == 0,
                F.concat(
                    F.lit(" host 10.0."), s(did % 256), F.lit("."), s(did * 7 % 256)
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = redact_pii(planted)
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ssn").cast("long").alias("n_ssn"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("n_ip").cast("long").alias("n_ip"),
        F.md5(F.col("redacted")).alias("redacted_hash"),
    )


# SemDeDup bucketing: 4 hyperplane bits => 16 deterministic "clusters" at
# test scale (real corpora run 14+ bits). The synthetic embeddings have no
# true near-dups (max within-bucket cosine ~0.45 at sf0.01), so tau sits at
# the ~99th percentile of the within-bucket pair distribution to exercise
# the drop path with a non-trivial kept/dropped split.
SEMDEDUP_BITS = 4
SEMDEDUP_TAU = 0.3


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup: deterministic sign-LSH buckets as
    clusters, keep-lowest-id within each cosine>tau duplicate pair."""
    from sarkac_spark.operators.similarity import semantic_dedup

    return semantic_dedup(
        _embs(spark, sf_dir),
        "vec_id",
        "embedding",
        dim=EMB_DIM,
        n_bits=SEMDEDUP_BITS,
        tau=SEMDEDUP_TAU,
    )


def q_gopher_rules(spark, sf_dir):
    """Gopher-rules quality gate: word-count / mean-word-length /
    symbol-ratio / stopword-presence flags per document."""
    from sarkac_spark.operators.text import gopher_rules

    return gopher_rules(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "stop_hits",
        "ok_word_count",
        "ok_mean_word_len",
        "ok_symbol_ratio",
        "ok_stopwords",
        "passes",
    )


def q_unigram_kl(spark, sf_dir):
    """Per-source unigram-distribution drift vs the corpus mixture:
    KL(P_source || P_corpus) from exact token counts."""
    from sarkac_spark.operators.text import unigram_kl

    return unigram_kl(_docs(spark, sf_dir), "source", "text")


CMS_DEPTH, CMS_WIDTH, CMS_TOP = 4, 1024, 20


def q_cms_term_counts(spark, sf_dir):
    """Count-min-sketch audit: estimate the corpus's top-20 term counts
    from a 4x1024 sketch and report the one-sided error against the
    exact counts — the bounded-memory heavy-hitter primitive (sketch
    size is fixed whatever the corpus size; the exact side exists here
    as the audit baseline)."""
    from sarkac_spark.operators.dedup import words_col
    from sarkac_spark.operators.sketch import cms_estimate, count_min_sketch

    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(words_col("text")).alias("term"))
        .select(F.lower(F.col("term")).alias("term"))
    )
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    top = exact.orderBy(F.col("true_count").desc(), "term").limit(CMS_TOP)
    sk = count_min_sketch(toks, "term", depth=CMS_DEPTH, width=CMS_WIDTH)
    est = cms_estimate(
        sk, top.select("term"), "term", depth=CMS_DEPTH, width=CMS_WIDTH
    )
    return top.join(est, "term").select(
        "term",
        "true_count",
        "est_count",
        (F.col("est_count") - F.col("true_count")).alias("overestimate"),
    )


def _cms_term_counts_sql() -> str:
    rows = " UNION ALL ".join(f"SELECT {d} AS d" for d in range(CMS_DEPTH))
    return f"""
WITH toks AS (
  SELECT lower(u.t) AS term FROM documents, UNNEST({_WORDS}) AS u(t)
),
exact AS (SELECT term, count(*) AS true_count FROM toks GROUP BY term),
top AS (SELECT term, true_count FROM exact
        ORDER BY true_count DESC, term LIMIT {CMS_TOP}),
ds AS ({rows}),
sketch AS (
  SELECT d,
         ('0x' || substr(md5('cms' || d || ':' || term), 1, 15))::BIGINT
           % {CMS_WIDTH} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM toks CROSS JOIN ds GROUP BY 1, 2
),
probes AS (
  SELECT term,
         d,
         ('0x' || substr(md5('cms' || d || ':' || term), 1, 15))::BIGINT
           % {CMS_WIDTH} AS bucket
  FROM top CROSS JOIN ds
),
est AS (
  SELECT p.term, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est_count
  FROM probes p LEFT JOIN sketch s USING (d, bucket)
  GROUP BY p.term
)
SELECT top.term, top.true_count, est.est_count,
       est.est_count - top.true_count AS overestimate
FROM top JOIN est USING (term)
"""


def q_incremental_dedup(spark, sf_dir):
    """Ingest-time exact dedup: today's batch (doc_id % 5 == 0) against
    the stored corpus fingerprints — kept rows are corpus-unseen AND
    batch-first; cost scales with the batch, not the corpus."""
    from sarkac_spark.operators.dedup import dedup_exact, incremental_exact_dedup

    d = _docs(spark, sf_dir)
    seen = dedup_exact(d.filter(F.col("doc_id") % 5 != 0), "doc_id", "text")
    new = d.filter(F.col("doc_id") % 5 == 0)
    return incremental_exact_dedup(new, seen, "doc_id", "text").select(
        "doc_id", "text_hash"
    )


def q_incremental_minhash(spark, sf_dir):
    """Ingest-time near-dup pairs: band keys of the new batch join the
    corpus's band keys — old-old pairs never generated, per-ingest
    candidate work O(|batch| x bucket occupancy)."""
    from sarkac_spark.operators.dedup import dedup_minhash_incremental

    d = _docs(spark, sf_dir).withColumn("is_new", F.col("doc_id") % 5 == 0)
    return dedup_minhash_incremental(
        d,
        "doc_id",
        "text",
        "is_new",
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=JACCARD_THRESHOLD,
    )


def _incremental_dedup_sql() -> str:
    return """
WITH seen AS (
  SELECT DISTINCT md5(text) AS text_hash FROM documents WHERE doc_id % 5 != 0
),
new AS (
  SELECT doc_id, md5(text) AS text_hash FROM documents WHERE doc_id % 5 = 0
),
unseen AS (
  SELECT * FROM new WHERE text_hash NOT IN (SELECT text_hash FROM seen)
)
SELECT doc_id, text_hash FROM (
  SELECT doc_id, text_hash,
         row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn
  FROM unseen
) WHERE rn = 1
"""


def _capped_bands_cte(band_exprs: str) -> str:
    """``bands`` CTE with the MINHASH_MAX_BAND_DF hot-band cap — mirrors
    operators.dedup._cap_band_df exactly, so Spark and oracle stay
    hash-identical on ANY corpus (even one with bands above the cap)."""
    return f"""bands0 AS (
  SELECT doc_id, UNNEST([
      {band_exprs}
  ]) AS band_key FROM sigs
),
bands AS (
  SELECT doc_id, band_key FROM (
    SELECT doc_id, band_key,
           count(*) OVER (PARTITION BY band_key) AS bdf
    FROM bands0
  ) WHERE bdf <= {MINHASH_MAX_BAND_DF}
)"""


def _incremental_minhash_sql() -> str:
    rows = MINHASH_K // MINHASH_BANDS
    mh_aggs = ",\n    ".join(
        f"min(({_LCG_A[i] % MINHASH_P} * h + {_LCG_B[i] % MINHASH_P}) % {MINHASH_P})"
        f" AS mh_{i}"
        for i in range(MINHASH_K)
    )
    band_exprs = ",\n      ".join(
        "'{b}|' || {cols}".format(
            b=b,
            cols=" || '|' || ".join(
                f"mh_{b * rows + r}::varchar" for r in range(rows)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::bigint % {MINHASH_P} AS h
  FROM sh
),
sigs AS (SELECT doc_id, {mh_aggs} FROM hashed GROUP BY doc_id),
{_capped_bands_cte(band_exprs)},
cand AS (
  SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
                  greatest(a.doc_id, b.doc_id) AS id_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id != b.doc_id
  WHERE b.doc_id % 5 = 0
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       round(n_common / (na.n_sh + nb.n_sh - n_common), 6) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE round(n_common / (na.n_sh + nb.n_sh - n_common), 6) >= {JACCARD_THRESHOLD}
"""


def q_minhash_hot_bands(spark, sf_dir):
    """Hot-band audit relation (the other half of the max_band_df guard):
    every LSH band bucket above the df cap, with its occupancy and the
    min-id canonical for per-bucket clustering. Queried at cap=1 so the
    fixture's duplicate pairs make the audit non-empty; production runs
    it at MINHASH_MAX_BAND_DF to see exactly what the capped band join
    excluded. One grouped count — no self-join, map-side combined."""
    from sarkac_spark.operators.dedup import (
        _hashed_shingles,
        _minhash_aggs,
        minhash_hot_bands,
    )

    d = _docs(spark, sf_dir)
    sigs = (
        _hashed_shingles(d, "doc_id", "text", 3)
        .groupBy("doc_id")
        .agg(*_minhash_aggs(MINHASH_K))
    )
    return minhash_hot_bands(
        sigs, "doc_id", k=MINHASH_K, bands=MINHASH_BANDS, max_band_df=1
    )


def _minhash_hot_bands_sql() -> str:
    rows = MINHASH_K // MINHASH_BANDS
    mh_aggs = ",\n    ".join(
        f"min(({_LCG_A[i] % MINHASH_P} * h + {_LCG_B[i] % MINHASH_P}) % {MINHASH_P})"
        f" AS mh_{i}"
        for i in range(MINHASH_K)
    )
    band_exprs = ",\n      ".join(
        "'{b}|' || {cols}".format(
            b=b,
            cols=" || '|' || ".join(
                f"mh_{b * rows + r}::varchar" for r in range(rows)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::bigint % {MINHASH_P} AS h
  FROM sh
),
sigs AS (SELECT doc_id, {mh_aggs} FROM hashed GROUP BY doc_id),
bands0 AS (
  SELECT doc_id, UNNEST([
      {band_exprs}
  ]) AS band_key FROM sigs
)
SELECT band_key, count(*) AS band_df, min(doc_id) AS canonical_id
FROM bands0 GROUP BY band_key HAVING count(*) > 1
"""


def q_minhash_recall(spark, sf_dir):
    """LSH-banding recall audit (the dedup twin of ann_recall): of the
    true near-dup pairs (exact capped n-gram Jaccard >= threshold), how
    many does minhash banding surface as candidates at the configured
    (k, bands) operating point — 'measure the sketch, don't trust it'."""
    from sarkac_spark.operators.dedup import (
        _hashed_shingles,
        _minhash_aggs,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _docs(spark, sf_dir)
    truth = ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=JACCARD_THRESHOLD, max_df=NGRAM_MAX_DF
    ).select("id_a", "id_b")
    sigs = (
        _hashed_shingles(d, "doc_id", "text", 3)
        .groupBy("doc_id")
        .agg(*_minhash_aggs(MINHASH_K))
    )
    cands = minhash_lsh_candidates(
        sigs, "doc_id", k=MINHASH_K, bands=MINHASH_BANDS
    )
    found = truth.join(cands, ["id_a", "id_b"], "left_semi")
    nt = truth.agg(F.count(F.lit(1)).alias("n_true"))
    nf = found.agg(F.count(F.lit(1)).alias("n_found"))
    return nt.crossJoin(F.broadcast(nf)).select(
        "n_true",
        "n_found",
        F.round(F.col("n_found") / F.col("n_true"), 6).alias("recall"),
    )


def _minhash_recall_sql() -> str:
    rows = MINHASH_K // MINHASH_BANDS
    mh_aggs = ",\n    ".join(
        f"min(({_LCG_A[i] % MINHASH_P} * h + {_LCG_B[i] % MINHASH_P}) % {MINHASH_P})"
        f" AS mh_{i}"
        for i in range(MINHASH_K)
    )
    band_exprs = ",\n      ".join(
        "'{b}|' || {cols}".format(
            b=b,
            cols=" || '|' || ".join(
                f"mh_{b * rows + r}::varchar" for r in range(rows)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
WITH {_SHINGLES_CTE},
shc AS (
  SELECT * FROM sh WHERE shingle NOT IN (
    SELECT shingle FROM sh GROUP BY 1 HAVING count(*) > {NGRAM_MAX_DF}
  )
),
tcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
csizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY 1),
cinter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM tcand c
  JOIN shc sa ON sa.doc_id = c.id_a
  JOIN shc sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
),
truth AS (
  SELECT i.id_a, i.id_b
  FROM cinter i
  JOIN csizes na ON na.doc_id = i.id_a
  JOIN csizes nb ON nb.doc_id = i.id_b
  WHERE round(n_common / (na.n_sh + nb.n_sh - n_common), 6)
        >= {JACCARD_THRESHOLD}
),
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::bigint % {MINHASH_P} AS h
  FROM sh
),
sigs AS (SELECT doc_id, {mh_aggs} FROM hashed GROUP BY doc_id),
{_capped_bands_cte(band_exprs)},
bcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
found AS (SELECT t.id_a, t.id_b FROM truth t JOIN bcand USING (id_a, id_b))
SELECT (SELECT count(*) FROM truth) AS n_true,
       (SELECT count(*) FROM found) AS n_found,
       round((SELECT count(*) FROM found)
             / (SELECT count(*) FROM truth), 6) AS recall
"""


HARDNEG_K = 5
HARDNEG_LO, HARDNEG_HI = 0.2, 0.45  # hi = the near-dup/positive threshold


def q_hard_negatives(spark, sf_dir):
    """Semi-hard negative mining (triplet-loss practice): per query
    vector the 5 most similar candidates inside the [0.2, 0.45) cosine
    band — informative but below the positive threshold."""
    from sarkac_spark.operators.similarity import hard_negatives

    e = _embs(spark, sf_dir)
    return hard_negatives(
        e,
        e.filter(F.col("vec_id") < N_QUERIES),
        k=HARDNEG_K,
        lo=HARDNEG_LO,
        hi=HARDNEG_HI,
    )


def _hard_negatives_sql() -> str:
    cos = _COS.format(a="q.v", b="c.v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM e q JOIN e c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
banded AS (
  SELECT * FROM scored
  WHERE cos_sim >= {HARDNEG_LO} AND cos_sim < {HARDNEG_HI}
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
  ) AS rank FROM banded
) WHERE rank <= {HARDNEG_K}
"""


WSAMPLE_N = 15


def q_weighted_sample(spark, sf_dir):
    """Efraimidis-Spirakis weighted sampling without replacement: 15
    docs per source with inclusion probability proportional to length —
    the 'favor high-quality docs' draw, deterministic via the hash
    variate (no rand())."""
    from sarkac_spark.operators.sampling import weighted_sample

    return weighted_sample(
        _docs(spark, sf_dir), "doc_id", "n_chars", WSAMPLE_N, stratum_col="source"
    ).select("doc_id", "source", "n_chars", "sample_rank")


def _weighted_sample_sql() -> str:
    return f"""
SELECT doc_id, source, n_chars, sample_rank FROM (
  SELECT doc_id, source, n_chars, row_number() OVER (
    PARTITION BY source
    ORDER BY ln(({_sample_hash_sql("wsample")} + 1) / 1000001.0) / n_chars DESC,
             doc_id
  ) AS sample_rank
  FROM documents WHERE n_chars > 0
) WHERE sample_rank <= {WSAMPLE_N}
"""


WINNOW_K = 3   # word k-grams
WINNOW_W = 4   # winnowing window (hashes) — catches shared runs >= 6 words
WINNOW_MIN_SHARED = 2


def q_winnow_pairs(spark, sf_dir):
    """Winnowing (MOSS) local-overlap pairs: docs sharing >= 2 selected
    k-gram fingerprints — fires on one long shared passage even when
    whole-doc similarity is too low for MinHash banding."""
    from sarkac_spark.operators.dedup import winnow_pairs

    return winnow_pairs(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=WINNOW_K,
        w=WINNOW_W,
        min_shared=WINNOW_MIN_SHARED,
    ).select("id_a", "id_b", "n_shared")


def _winnow_pairs_sql() -> str:
    k, w, ms, max_df = WINNOW_K, WINNOW_W, WINNOW_MIN_SHARED, 256
    return f"""
WITH ws AS (SELECT doc_id, {_WORDS} AS w FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {k} THEN
           list_transform(range(1, len(w) - {k} + 2),
                          i -> array_to_string(list_slice(w, i, i + {k - 1}), ' '))
         ELSE [] END AS grams
  FROM ws
),
h AS (
  SELECT doc_id,
         list_transform(grams,
                        s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs
  FROM g
),
fp0 AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= {w} THEN
           list_distinct(list_transform(range(1, len(hs) - {w} + 2),
                                        j -> list_min(list_slice(hs, j, j + {w - 1}))))
         WHEN len(hs) > 0 THEN [list_min(hs)]
         ELSE [] END AS fps
  FROM h
),
fp AS (SELECT doc_id, u.f AS fp FROM fp0, UNNEST(fps) AS u(f)),
capped AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS dfc FROM fp
  ) WHERE dfc <= {max_df}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM capped a JOIN capped b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {ms}
"""


HLL_B = 10  # 2^10 = 1024 registers => ~3.2% relative error


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog cardinality audit: md5-HLL distinct-words-per-language
    estimate vs the exact count, with relative error — the bounded-memory
    distinct primitive (1024 registers whatever the corpus; the exact
    side exists here as the audit baseline)."""
    from sarkac_spark.operators.dedup import words_col
    from sarkac_spark.operators.sketch import hll_distinct

    toks = (
        _docs(spark, sf_dir)
        .select("lang", F.explode(words_col("text")).alias("w"))
        .select("lang", F.lower(F.col("w")).alias("term"))
    )
    exact = toks.groupBy("lang").agg(
        F.countDistinct("term").alias("true_distinct")
    )
    est = hll_distinct(toks, "term", ["lang"], b=HLL_B)
    return exact.join(est, "lang").select(
        "lang",
        "true_distinct",
        "est_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("true_distinct"))
            / F.col("true_distinct"),
            6,
        ).alias("rel_error"),
    )


def _hll_distinct_sql() -> str:
    from sarkac_spark.operators.sketch import _hll_alpha

    b = HLL_B
    m = 1 << b
    rho_max = 60 - b + 1
    scale = 1 << rho_max
    numer = _hll_alpha(m) * (m * m) * scale
    return f"""
WITH toks AS (
  SELECT lang, lower(u.t) AS term FROM documents, UNNEST({_WORDS}) AS u(t)
),
h AS (
  SELECT lang, ('0x' || substr(md5('hll:' || term), 1, 15))::BIGINT AS hv
  FROM toks
),
regs AS (
  SELECT lang, hv & {m - 1} AS idx,
         max(CASE WHEN (hv >> {b}) = 0 THEN {rho_max}
             ELSE {rho_max} - length(bin(hv >> {b})) END) AS M
  FROM h GROUP BY 1, 2
),
agg AS (
  SELECT lang, sum(CAST(pow(2, {rho_max} - M) AS BIGINT)) AS s, count(*) AS n
  FROM regs GROUP BY 1
),
est AS (
  SELECT lang,
         {numer!r} / (s + ({m} - n) * {scale}) AS est_raw,
         {m} - n AS zeros
  FROM agg
),
fin AS (
  SELECT lang,
         CAST(round(CASE WHEN est_raw <= {2.5 * m} AND zeros > 0
              THEN {float(m)!r} * ln({float(m)!r} / zeros)
              ELSE est_raw END) AS BIGINT) AS est_distinct
  FROM est
),
exact AS (SELECT lang, count(DISTINCT term) AS true_distinct FROM toks GROUP BY 1)
SELECT exact.lang, true_distinct, est_distinct,
       round(abs(est_distinct - true_distinct) / true_distinct, 6) AS rel_error
FROM exact JOIN fin USING (lang)
"""


def _bloom_vocab_sql() -> str:
    return f"""
WITH {_LANG_SHINGLES_CTE},
corpus AS (SELECT DISTINCT shingle FROM lsh WHERE lang != 'en'),
probes AS (SELECT DISTINCT shingle FROM lsh WHERE lang = 'en'),
bloom AS (
  SELECT DISTINCT
    ('0x' || substr(md5('bloom' || i || ':' || shingle), 1, 15))::BIGINT
      % {BLOOM_M} AS pos
  FROM corpus CROSS JOIN range({BLOOM_K}) t(i)
),
pp AS (
  SELECT DISTINCT shingle,
    ('0x' || substr(md5('bloom' || i || ':' || shingle), 1, 15))::BIGINT
      % {BLOOM_M} AS pos
  FROM probes CROSS JOIN range({BLOOM_K}) t(i)
),
need AS (SELECT shingle, count(*) AS need FROM pp GROUP BY 1),
got AS (
  SELECT pp.shingle, count(*) AS got FROM pp JOIN bloom USING (pos) GROUP BY 1
)
SELECT n.shingle,
       (CASE WHEN coalesce(g.got, 0) = n.need THEN 1 ELSE 0 END)::BIGINT
         AS maybe_seen,
       (CASE WHEN n.shingle IN (SELECT shingle FROM corpus) THEN 1 ELSE 0 END)::BIGINT
         AS true_seen
FROM need n LEFT JOIN got g USING (shingle)
"""


def _hll_est_cte(src: str, tag: str, b: int) -> str:
    """The md5-HLL estimator over a one-column (term) CTE ``src`` —
    the same construction _hll_distinct_sql mirrors, emitted once per
    operand so _corpus_overlap_sql can estimate A, B, and A∪B."""
    from sarkac_spark.operators.sketch import _hll_alpha

    m = 1 << b
    rho_max = 60 - b + 1
    scale = 1 << rho_max
    numer = _hll_alpha(m) * (m * m) * scale
    return f"""
h_{tag} AS (
  SELECT ('0x' || substr(md5('hll:' || term), 1, 15))::BIGINT AS hv FROM {src}
),
regs_{tag} AS (
  SELECT hv & {m - 1} AS idx,
         max(CASE WHEN (hv >> {b}) = 0 THEN {rho_max}
             ELSE {rho_max} - length(bin(hv >> {b})) END) AS M
  FROM h_{tag} GROUP BY 1
),
agg_{tag} AS (
  SELECT sum(CAST(pow(2, {rho_max} - M) AS BIGINT)) AS s, count(*) AS n
  FROM regs_{tag}
),
fin_{tag} AS (
  SELECT CAST(round(CASE
    WHEN {numer!r} / (s + ({m} - n) * {scale}) <= {2.5 * m} AND ({m} - n) > 0
      THEN {float(m)!r} * ln({float(m)!r} / ({m} - n))
    ELSE {numer!r} / (s + ({m} - n) * {scale}) END) AS BIGINT) AS est
  FROM agg_{tag}
)"""


def _corpus_overlap_sql() -> str:
    b = OVERLAP_B
    return f"""
WITH {_LANG_SHINGLES_CTE},
a AS (SELECT shingle AS term FROM lsh WHERE lang = 'en'),
bb AS (SELECT shingle AS term FROM lsh WHERE lang != 'en'),
uu AS (SELECT term FROM a UNION ALL SELECT term FROM bb),
{_hll_est_cte('a', 'a', b)},
{_hll_est_cte('bb', 'b', b)},
{_hll_est_cte('uu', 'u', b)},
tru AS (
  SELECT count(*) AS true_overlap
  FROM (SELECT DISTINCT term FROM a) ta
  JOIN (SELECT DISTINCT term FROM bb) tb USING (term)
)
SELECT fa.est AS est_a, fb.est AS est_b, fu.est AS est_union,
       greatest(fa.est + fb.est - fu.est, 0) AS est_overlap,
       tru.true_overlap
FROM fin_a fa, fin_b fb, fin_u fu, tru
"""


HIST_K = 64  # bins — error bound is one bin width = (max-min)/64


def q_hist_quantiles(spark, sf_dir):
    """Histogram-quantile audit: bounded-memory (64-bin) doc-length
    p50/p95/p99 per language vs the exact interpolated quantiles — the
    quantile member of the sketch family (CMS=frequency, HLL=distinct).
    Error is bounded by one bin width; exact side is the audit
    baseline."""
    from sarkac_spark.operators.sketch import histogram_quantiles

    d = _docs(spark, sf_dir)
    est = histogram_quantiles(d, "n_chars", ["lang"], qs=(0.5, 0.95, 0.99), k=HIST_K)
    exact = d.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50_exact"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 6).alias("p95_exact"),
        F.round(F.expr("percentile(n_chars, 0.99)"), 6).alias("p99_exact"),
    )
    return est.join(exact, "lang").select(
        "lang", "n", "p50_est", "p95_est", "p99_est",
        "p50_exact", "p95_exact", "p99_exact",
    )


def _hist_quantiles_sql() -> str:
    k = HIST_K
    return f"""
WITH b AS (
  SELECT lang, CAST(min(n_chars) AS DOUBLE) AS mn,
         CAST(max(n_chars) AS DOUBLE) AS mx, count(*) AS n
  FROM documents GROUP BY 1
),
binned AS (
  SELECT d.lang,
         CASE WHEN b.mx = b.mn THEN 0
              ELSE least(CAST(floor((CAST(d.n_chars AS DOUBLE) - b.mn) * {k}
                                    / (b.mx - b.mn)) AS BIGINT), {k - 1})
         END AS bin
  FROM documents d JOIN b USING (lang)
),
hist AS (SELECT lang, bin, count(*) AS c FROM binned GROUP BY 1, 2),
cum AS (
  SELECT lang, bin, sum(c) OVER (
    PARTITION BY lang ORDER BY bin
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
qb AS (
  SELECT c.lang,
         min(CASE WHEN c.cum >= 0.5 * b.n THEN c.bin END) AS qb5,
         min(CASE WHEN c.cum >= 0.95 * b.n THEN c.bin END) AS qb95,
         min(CASE WHEN c.cum >= 0.99 * b.n THEN c.bin END) AS qb99
  FROM cum c JOIN b USING (lang) GROUP BY 1
),
est AS (
  SELECT qb.lang, b.n,
         round(least(b.mn + (qb5 + 1) * (b.mx - b.mn) / {float(k)!r}, b.mx), 6) AS p50_est,
         round(least(b.mn + (qb95 + 1) * (b.mx - b.mn) / {float(k)!r}, b.mx), 6) AS p95_est,
         round(least(b.mn + (qb99 + 1) * (b.mx - b.mn) / {float(k)!r}, b.mx), 6) AS p99_est
  FROM qb JOIN b USING (lang)
),
exact AS (
  SELECT lang,
         round(quantile_cont(n_chars, 0.5), 6) AS p50_exact,
         round(quantile_cont(n_chars, 0.95), 6) AS p95_exact,
         round(quantile_cont(n_chars, 0.99), 6) AS p99_exact
  FROM documents GROUP BY 1
)
SELECT est.lang, n, p50_est, p95_est, p99_est, p50_exact, p95_exact, p99_exact
FROM est JOIN exact USING (lang)
"""


# corpus-mix contract: oversample src0/src1, trim src2, pass the rest
MIX_WEIGHTS = {"src0": 2.5, "src1": 2.0, "src2": 0.4}


def q_corpus_mix(spark, sf_dir):
    """Weighted epoch composition: deterministic replication/trim per
    source (floor(w) copies + hash-Bernoulli fractional copy)."""
    from sarkac_spark.operators.sampling import weighted_mix

    d = _docs(spark, sf_dir)
    return weighted_mix(d, "doc_id", "source", MIX_WEIGHTS).select(
        "doc_id", "source", "copy"
    )


def q_dedup_clusters(spark, sf_dir):
    """Pairs -> groups: transitive closure over the minhash near-dup
    pairs, labeling every involved doc with its cluster (min doc id)
    and the cluster size — the relation dedup actually deletes from
    (keep cluster_id, drop the rest)."""
    from sarkac_spark.operators.graph import connected_components

    pairs = dedup_minhash(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=JACCARD_THRESHOLD,
    )
    cc = connected_components(pairs)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
    )


def q_dedup_canonical(spark, sf_dir):
    """Keep/drop decision per doc: one representative (longest text,
    ties to smallest id) per near-dup cluster, singletons kept."""
    from sarkac_spark.operators.dedup import canonical_select

    docs = _docs(spark, sf_dir)
    pairs = dedup_minhash(
        docs,
        "doc_id",
        "text",
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=JACCARD_THRESHOLD,
    )
    return canonical_select(docs, pairs, "doc_id", "n_chars")


def q_cluster_split(spark, sf_dir):
    """Leakage-safe train/eval split: the split draw is made on the
    near-dup CLUSTER representative (transitive closure over the
    minhash pairs), so paraphrase pairs can never straddle the split —
    the contamination mode a per-doc hash split cannot prevent."""
    from sarkac_spark.operators.sampling import cluster_split

    docs = _docs(spark, sf_dir)
    pairs = dedup_minhash(
        docs,
        "doc_id",
        "text",
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=JACCARD_THRESHOLD,
    )
    return cluster_split(docs, "doc_id", pairs, eval_rate=EVAL_RATE)


DUP_NGRAM_N = 3
DUP_NGRAM_MIN_DF = 2

# snapshot-diff fixture: old/new corpus snapshots derived from the one
# documents table by hash — ~10% added (absent from old), ~10% removed
# (absent from new), ~20% edited (old text reversed). Cutoffs are over
# the shared 1e6 hash modulus.
SNAP_ADD_CUTOFF = 100_000
SNAP_DEL_CUTOFF = 100_000
SNAP_EDIT_CUTOFF = 200_000
BPE_TOPK = 50
ZIPF_TOPK = 500


def q_snapshot_diff(spark, sf_dir):
    """Corpus-version diff: added/removed/changed/unchanged status per
    doc between two snapshot views of the corpus — the delta relation
    an incremental re-curation consumes. One full-outer join on id over
    md5 fingerprints."""
    from sarkac_spark.operators.profiling import snapshot_diff

    old, new = _snapshot_pair(_docs(spark, sf_dir))
    return snapshot_diff(old, new, "doc_id", "text")


def q_dup_ngram_frac(spark, sf_dir):
    """RefinedWeb-style partial-duplication audit: per doc, the share
    of its 3-gram occurrences whose 3-gram appears in >= 2 documents —
    catches templated/boilerplate-heavy docs that doc-level dedup and
    within-doc repetition features both miss."""
    from sarkac_spark.operators.dedup import dup_ngram_fraction

    return dup_ngram_fraction(
        _docs(spark, sf_dir), "doc_id", "text", n=DUP_NGRAM_N, min_df=DUP_NGRAM_MIN_DF
    )


def q_curation_pipeline(spark, sf_dir):
    """The composed corpus-curation pass: exact-dedup to canonical docs
    -> quality gate -> per-language corpus budget (docs + BPE-ish
    tokens). One semi-join + one aggregation over the quality features;
    the dedup side reduces to (hash -> min id), always the cheapest
    full-corpus dedup."""
    d = _docs(spark, sf_dir)
    canon = dedup_exact(d, "doc_id", "text").select(
        F.col("canonical_id").alias("doc_id")
    )
    kept = d.join(canon, "doc_id", "semi")
    good = quality_score(kept, "text").filter(
        F.col("quality_score") >= QUALITY_CUTOFF
    )
    return good.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bpe_ish_token_count("text")).alias("total_bpe_tokens"),
        F.round(F.avg("quality_score"), 6).alias("avg_quality"),
    )


# The unit for the bloom / overlap audits is the 3-gram SHINGLE, not the
# bare term: the synthetic fixture shares one ~31-word vocabulary across
# languages (term-level membership would be trivially all-true), while
# shingle sets have real structure (sf0.01: 9k EN / 11k non-EN / 4k
# shared). m = 2^18 bits -> ~0.06% fp at the sf0.01 shingle count; at
# sf0.1 the same filter runs ~45% fp — deliberately kept so the audit
# SHOWS saturation (the sizing decision the fp column is for).
BLOOM_M = 262144
BLOOM_K = 4


def _lang_shingles(spark, sf_dir):
    from sarkac_spark.operators.dedup import shingles

    return shingles(_docs(spark, sf_dir), "lang", "text", n=3)


def q_bloom_vocab(spark, sf_dir):
    """Bloom-filter membership pre-gate audit: the non-English corpus
    shingle set builds the filter, English shingles probe it.
    true_seen=1 rows must ALWAYS be maybe_seen=1 (the no-false-negative
    guarantee that makes the bloom a safe ingest pre-gate: "definitely
    unseen" rows can skip the exact anti-join); maybe_seen=1 &
    true_seen=0 rows are the quantified false-positive overhead that
    still pays the exact check."""
    from sarkac_spark.operators.sketch import bloom_build, bloom_might_contain

    sh = _lang_shingles(spark, sf_dir)
    corpus = sh.filter(F.col("lang") != "en").select("shingle").distinct()
    probes = sh.filter(F.col("lang") == "en").select("shingle").distinct()
    bloom = bloom_build(corpus, "shingle", m_bits=BLOOM_M, k_hashes=BLOOM_K)
    flags = bloom_might_contain(bloom, probes, "shingle", BLOOM_M, BLOOM_K)
    seen = corpus.select(F.col("shingle"), F.lit(1).alias("__seen"))
    return flags.join(seen, "shingle", "left").select(
        "shingle",
        F.col("might_contain").cast("long").alias("maybe_seen"),
        F.coalesce(F.col("__seen"), F.lit(0)).cast("long").alias("true_seen"),
    )


OVERLAP_B = 12  # 4096 registers => ~1.6% per-estimate error


def q_corpus_overlap(spark, sf_dir):
    """Inclusion-exclusion overlap estimate over HLL registers:
    |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B) with the union estimated
    from MAX-MERGED registers (no re-scan of the union) — the cheap
    contamination pre-check before an exact decontamination pass, here
    audited against the exact overlap (EN shingle set vs non-EN
    shingle set)."""
    from sarkac_spark.operators.sketch import hll_overlap

    sh = _lang_shingles(spark, sf_dir)
    a = sh.filter(F.col("lang") == "en").select("shingle")
    b = sh.filter(F.col("lang") != "en").select("shingle")
    est = hll_overlap(a, b, "shingle", b=OVERLAP_B)
    true = a.distinct().join(b.distinct(), "shingle").agg(
        F.count(F.lit(1)).alias("true_overlap")
    )
    return est.crossJoin(F.broadcast(true))


N_SHARDS = 16  # divides 1e6 exactly -> unbiased deal (assign_shards doc)
# explicit target mixture over the corpus languages (Pile/DoReMi-style
# spec — an *input*, unlike temperature_sample's count-derived weights)
MIX_TARGETS = {"en": 0.4, "zh": 0.2, "de": 0.15, "es": 0.15, "fr": 0.1}


def q_shard_manifest(spark, sf_dir):
    """Training-shard manifest: deal documents into N_SHARDS
    deterministic hash shards and audit per-shard doc/token/char load
    vs the ideal — the output-sharding balance check a dataloader
    depends on. Map-only deal + one uniform-key groupBy."""
    from sarkac_spark.operators.sampling import shard_manifest
    from sarkac_spark.operators.text import token_count

    return shard_manifest(
        _docs(spark, sf_dir),
        "doc_id",
        N_SHARDS,
        weights={
            "n_tokens": token_count("text"),
            "n_chars": F.col("n_chars"),
        },
    )


def q_mixture_plan(spark, sf_dir):
    """Domain-reweighting plan: per-language token loads vs the
    MIX_TARGETS spec — natural share, target weight, and the epochs
    factor (>1 = target infeasible without repetition). One grouped
    sum + broadcast dims."""
    from sarkac_spark.operators.sampling import mixture_plan
    from sarkac_spark.operators.text import token_count

    return mixture_plan(
        _docs(spark, sf_dir), "lang", MIX_TARGETS, weight_col=token_count("text")
    )


def q_quality_classifier(spark, sf_dir):
    """Distilled-classifier quality gate (the fastText-filter shape of
    CCNet/LLaMA pipelines): logistic scoring over the quality features
    with the shipped literal weights. The logit is exact integer
    nano-units (BIGINT) — no float summation anywhere — so the oracle
    matches bit-for-bit; map-only, no shuffle."""
    from sarkac_spark.operators.classify import logistic_quality_score

    return logistic_quality_score(_docs(spark, sf_dir))


def q_bpe_merges(spark, sf_dir):
    """Tokenizer-fit audit: corpus-wide adjacent character-pair counts
    inside words (the first BPE merge iteration), top-k candidates."""
    from sarkac_spark.operators.text import bpe_merge_pairs

    return bpe_merge_pairs(_docs(spark, sf_dir), "text", k=BPE_TOPK)


def q_zipf_fit(spark, sf_dir):
    """One-row corpus health gate: least-squares Zipf fit (log-freq on
    log-rank) over the term-frequency head; integer-exact regression
    sums so the oracle can't drift."""
    from sarkac_spark.operators.text import zipf_fit

    return zipf_fit(_docs(spark, sf_dir), "text", top_k=ZIPF_TOPK)


def _snapshot_pair(d):
    """Two deterministic snapshot views of the corpus (drop-in fixture
    for snapshot-delta queries): 10% of ids absent from each side, 20%
    edited on the old side — all hash-derived, engine-stable."""
    from sarkac_spark.operators.sampling import sample_hash

    edited = F.when(
        sample_hash("doc_id", "snap_edit") < SNAP_EDIT_CUTOFF,
        F.reverse(F.col("text")),
    ).otherwise(F.col("text"))
    old = d.filter(sample_hash("doc_id", "snap_add") >= SNAP_ADD_CUTOFF).select(
        "doc_id", edited.alias("text")
    )
    new = d.filter(sample_hash("doc_id", "snap_del") >= SNAP_DEL_CUTOFF).select(
        "doc_id", "text"
    )
    return old, new


def q_delta_curation(spark, sf_dir):
    """Incremental re-curation: the snapshot delta drives the work list
    — only added/changed docs are (re)scored by the quality classifier;
    unchanged docs keep their prior verdict, removed docs drop. The
    100 TB point: per-drop curation cost is O(delta), not O(corpus).
    Output: per-status churn/work/keep counts (4 rows)."""
    from sarkac_spark.operators.classify import logistic_quality_score
    from sarkac_spark.operators.profiling import snapshot_diff

    old, new = _snapshot_pair(_docs(spark, sf_dir))
    diff = snapshot_diff(old, new, "doc_id", "text")
    work_ids = diff.filter(F.col("status").isin("added", "changed")).select("doc_id")
    scored = logistic_quality_score(
        new.join(work_ids, "doc_id", "left_semi"), "doc_id", "text"
    )
    return (
        diff.join(scored, "doc_id", "left")
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("logit_nano").alias("n_scored"),
            F.coalesce(
                F.sum(F.when(F.col("keep"), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("n_kept"),
        )
    )


def q_contamination_spans(spark, sf_dir):
    """Exact-substring contamination: longest run of consecutive eval
    n-gram positions contained in a train doc — catches the verbatim
    quote that scattered-shingle counting (decontamination) scores the
    same as common-trigram noise."""
    from sarkac_spark.operators.dedup import contamination_spans
    from sarkac_spark.operators.sampling import train_eval_split

    s = train_eval_split(_docs(spark, sf_dir), "doc_id", eval_rate=EVAL_RATE)
    return contamination_spans(
        s.filter(F.col("split") == "train"),
        s.filter(F.col("split") == "eval"),
        "doc_id",
        "text",
        shingle_n=3,
        min_run=SPAN_MIN_RUN,
        max_train_df=DECONTAM_MAX_TRAIN_DF,
    )


def q_classifier_confusion(spark, sf_dir):
    """Filter-launch audit: the agreement matrix between the distilled
    classifier gate and its gopher weak-label teacher — the
    precision/recall evidence reviewed before flipping a corpus-wide
    filter on. ONE scan, zero joins: both gates are map-only column
    expressions stacked on the same pass."""
    from sarkac_spark.operators.classify import quality_gate
    from sarkac_spark.operators.text import gopher_rules

    g = gopher_rules(quality_gate(_docs(spark, sf_dir)), "text").select(
        F.col("keep"), F.col("passes").alias("gopher_pass")
    )
    return g.groupBy("keep", "gopher_pass").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def q_mixture_realize(spark, sf_dir):
    """Execute the MIX_TARGETS plan: floor(epochs) copies per doc plus a
    deterministic fractional Bernoulli copy — the repetition schedule a
    dataloader actually consumes; expected per-language token load hits
    the target mixture exactly."""
    from sarkac_spark.operators.sampling import apply_mixture
    from sarkac_spark.operators.text import token_count

    return apply_mixture(
        _docs(spark, sf_dir),
        "doc_id",
        "lang",
        MIX_TARGETS,
        weight_col=token_count("text"),
    ).select("doc_id", "lang", "epoch_copy")


def q_classifier_calibration(spark, sf_dir):
    """Threshold calibration for the quality gate: per target keep rate
    (25/50/75%), the exact logit percentile realizing it and the keep
    count that threshold yields — read before setting threshold_nano on
    a shifted corpus. One scoring scan + one percentile agg + a 3-row
    broadcast back for the realized counts."""
    from sarkac_spark.operators.classify import calibration_table

    return calibration_table(_docs(spark, sf_dir))


def q_pq_assign(spark, sf_dir):
    """Product-quantization codes: every vector snapped to its nearest
    per-subspace centroid (literal codebooks from the seeded sf0.01
    fit) — the compressed 4-bit-per-subspace index relation. Map-only
    against broadcast literals."""
    from sarkac_spark.operators.pq import PQ_CODEBOOKS, pq_assign

    return pq_assign(_embs(spark, sf_dir), PQ_CODEBOOKS)


def q_pq_topk(spark, sf_dir):
    """PQ ADC top-k: quantized nearest neighbors per query (distance =
    sum of per-subspace query→assigned-centroid distances in exact
    integer micro-units) — m table lookups per candidate instead of a
    64-term dot product."""
    from sarkac_spark.operators.pq import PQ_CODEBOOKS, pq_adc_topk

    return pq_adc_topk(
        _embs(spark, sf_dir), PQ_CODEBOOKS, n_queries=N_QUERIES, k=TOPK
    )


def q_pq_recall(spark, sf_dir):
    """PQ quality gate (the ann_recall discipline for the quantized
    path): recall@k of ADC top-k against the exact L2 top-k — the
    number an operator reads before trusting 4-bit codes at 100 TB.
    On this synthetic corpus (near-random embeddings, no true
    neighbors — same caveat as LSH_BITS above) recall@3 sits ~0.2 at
    64x compression; real embedding corpora with actual near-neighbor
    structure sit far right of this operating point, and the knobs are
    m/k (code budget) exactly as in the paper."""
    from sarkac_spark.operators.pq import PQ_CODEBOOKS, _dist_expr, pq_adc_topk
    from pyspark.sql.window import Window

    e = _embs(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _dist_expr(F.col("qv"), F.col("v")).alias("d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d"), F.col("neighbor_id"))
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id")
    )
    approx = pq_adc_topk(
        _embs(spark, sf_dir), PQ_CODEBOOKS, n_queries=N_QUERIES, k=TOPK
    ).select("query_id", "neighbor_id")
    hits = approx.join(exact, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).alias("n_hits"))
    base = exact.select("query_id").distinct()
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / float(TOPK), 6).alias(
            "recall"
        ),
    )


def q_ivfpq_topk(spark, sf_dir):
    """The classic IVF-PQ layout: coarse-quantizer bucket pruning
    (nprobe=2) + in-bucket ADC ranking over 4-bit codes — the query
    path that never touches a raw float vector outside its own
    distance tables."""
    from sarkac_spark.operators.pq import PQ_CODEBOOKS, ivfpq_topk

    e = _embs(spark, sf_dir)
    centroids = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return ivfpq_topk(
        e, PQ_CODEBOOKS, centroids, n_queries=N_QUERIES, k=TOPK, nprobe=2
    )


PQ_SHORTLIST = 20


def q_pq_rerank(spark, sf_dir):
    """Two-stage retrieval: ADC shortlist (20) -> exact L2 re-rank ->
    top-3 — full-precision math touches shortlist x queries vectors,
    not the corpus; the standard PQ deployment shape."""
    from sarkac_spark.operators.pq import PQ_CODEBOOKS, pq_rerank_topk

    return pq_rerank_topk(
        _embs(spark, sf_dir),
        PQ_CODEBOOKS,
        n_queries=N_QUERIES,
        shortlist=PQ_SHORTLIST,
        k=TOPK,
    )


def q_hash_embed(spark, sf_dir):
    """Hashing-trick document embeddings, long form (doc_id, j, v):
    the deterministic text->vector bridge that feeds the embedding
    stack (semantic dedup / IVF / LSH / PQ) from raw text — no vocab,
    no model, integer bucket sums normalized once."""
    from sarkac_spark.operators.text import hash_embed

    emb = hash_embed(_docs(spark, sf_dir), "doc_id", "text", dim=EMB_DIM)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("j", "v")
    ).withColumn("j", F.col("j").cast("long"))


def q_bpe_tokenize(spark, sf_dir):
    """Per-doc token counts under a REAL learned BPE merge table (32
    merges trained on this corpus). Training is the sequential Sennrich
    merge loop over the bounded (word, count) vocabulary — iterative,
    no closed-form SQL, so this query is rows-only checked like the
    MLlib fits; the deterministic guarantees live in tests/test_bpe.py.
    Encoding applies merges once per DISTINCT word (Arrow-batched UDF
    over the vocab dim); all corpus-sized stages are JVM-side."""
    from sarkac_spark.operators.bpe import bpe_token_counts, train_bpe

    d = _docs(spark, sf_dir)
    merges = train_bpe(d, n_merges=32)
    return bpe_token_counts(d, "doc_id", "text", merges)


CURATION_FUNNEL_CONFIG = {
    "quality": {"gopher": True, "classifier": True},
    "dedup": {"exact": True, "minhash": {
        "k": MINHASH_K, "bands": MINHASH_BANDS,
        "threshold": JACCARD_THRESHOLD,
    }},
    "domain_cap": {"domain_col": "source", "cap": 10,
                   "quality_col": "n_chars"},
}


def q_curation_funnel(spark, sf_dir):
    """Curator.report() as an oracle-checked query: the per-stage
    survivor funnel of a full curation pass (gopher+classifier quality
    gate → exact+MinHash dedup → per-source quota), one row per stage
    boundary. This is the audit a pipeline operator reads before
    committing a 100 TB pass — and because it drives the REAL Curator
    stages (the same closures `apply()` composes), the oracle gate
    covers the facade's stage wiring, not a parallel reimplementation."""
    from functools import reduce

    from sarkac_spark.curator import Curator

    cur = Curator(spark, CURATION_FUNNEL_CONFIG)
    d = _docs(spark, sf_dir)
    frames = [
        d.agg(
            F.lit("0_input").alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    ]
    for i, (name, fn) in enumerate(cur.stages(), start=1):
        # LAZY localCheckpoint at each stage boundary: the funnel reads
        # every stage twice (its count row + the next stage's input), and
        # without a materialization barrier Spark re-derives the whole
        # prefix per branch — 4x the corpus scans for a 4-stage funnel
        # (41 shuffles / 30 scans in the naive plan; ~1x pipeline after).
        # Lazy (not eager) keeps query BUILD free; the driver's single
        # action evaluates each stage once through the checkpoint chain.
        d = fn(d).localCheckpoint(eager=False)
        frames.append(
            d.agg(
                F.lit(f"{i}_{name}").alias("stage"),
                F.count(F.lit(1)).cast("long").alias("n_docs"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)


def _gopher_pass_cte(src: str) -> str:
    """CTE ending in gop(doc_id) — ids passing all four Gopher rules
    over ``src``; the same expressions as _gopher_rules_sql."""
    from sarkac_spark.operators.text import _GOPHER_STOPWORDS

    stoplist = ", ".join(f"'{s}'" for s in _GOPHER_STOPWORDS)
    return f"""gstaged AS (
  SELECT doc_id, {_WORDS} AS w, length(text) AS nc,
         length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS nclean
  FROM {src}
),
gop AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_words,
           CASE WHEN len(w) > 0
                THEN round(CAST(list_sum(list_transform(w, x -> length(x)))
                                AS BIGINT) / len(w), 6)
                ELSE 0.0 END AS mean_word_len,
           CASE WHEN nc > 0 THEN round((nc - nclean) / nc, 6)
                ELSE 0.0 END AS symbol_ratio,
           CAST(len(list_filter(w, x -> list_contains([{stoplist}], lower(x))))
                AS BIGINT) AS stop_hits
    FROM gstaged)
  WHERE n_words BETWEEN 10 AND 1000 AND mean_word_len BETWEEN 2.0 AND 12.0
    AND symbol_ratio <= 0.1 AND stop_hits >= 2
)"""


def _curation_funnel_sql() -> str:
    rows = MINHASH_K // MINHASH_BANDS
    mh_aggs = ",\n    ".join(
        f"min(({_LCG_A[i] % MINHASH_P} * h + {_LCG_B[i] % MINHASH_P}) % {MINHASH_P})"
        f" AS mh_{i}"
        for i in range(MINHASH_K)
    )
    band_exprs = ",\n      ".join(
        "'{b}|' || {cols}".format(
            b=b,
            cols=" || '|' || ".join(
                f"mh_{b * rows + r}::varchar" for r in range(rows)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    cap = CURATION_FUNNEL_CONFIG["domain_cap"]["cap"]
    return f"""
WITH {_gopher_pass_cte("documents")},
q1 AS (SELECT d.* FROM documents d WHERE doc_id IN (SELECT doc_id FROM gop)),
{_quality_micro_cte("q1").strip()},
kept AS (SELECT doc_id FROM micro WHERE {_logit_nano_expr()} >= 0),
q2 AS (SELECT * FROM q1 WHERE doc_id IN (SELECT doc_id FROM kept)),
canon AS (SELECT min(doc_id) AS doc_id FROM q2 GROUP BY md5(text)),
q3 AS (SELECT * FROM q2 WHERE doc_id IN (SELECT doc_id FROM canon)),
ws AS (SELECT doc_id, {_WORDS} AS w FROM q3),
sh AS (
  SELECT DISTINCT doc_id, u.s AS shingle
  FROM ws, UNNEST(
    CASE WHEN len(w) >= 3 THEN
      list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    ELSE [] END
  ) AS u(s)
),
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::bigint % {MINHASH_P} AS h
  FROM sh
),
sigs AS (
  SELECT doc_id, {mh_aggs}
  FROM hashed GROUP BY doc_id
),
{_capped_bands_cte(band_exprs)},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
drops AS (
  SELECT DISTINCT i.id_b FROM (
    SELECT c.id_a, c.id_b, count(*) AS n_common
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
  ) i
  JOIN sizes na ON na.doc_id = i.id_a
  JOIN sizes nb ON nb.doc_id = i.id_b
  WHERE round(n_common / (na.n_sh + nb.n_sh - n_common), 6)
        >= {JACCARD_THRESHOLD}
),
q4 AS (SELECT * FROM q3 WHERE doc_id NOT IN (SELECT id_b FROM drops)),
ranked AS (
  SELECT doc_id, row_number() OVER (
    PARTITION BY source ORDER BY n_chars DESC, doc_id
  ) AS rn FROM q4
),
q5 AS (SELECT * FROM q4 WHERE doc_id IN
       (SELECT doc_id FROM ranked WHERE rn <= {cap}))
SELECT '0_input' AS stage, (SELECT count(*) FROM documents) AS n_docs
UNION ALL
SELECT '1_quality', (SELECT count(*) FROM q2)
UNION ALL
SELECT '2_dedup', (SELECT count(*) FROM q4)
UNION ALL
SELECT '3_domain_cap', (SELECT count(*) FROM q5)
"""


def q_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility audit: per-language BPE tokens-per-word under
    the shipped merge table - THE tokenizer-health number for a
    multilingual corpus (fertility creep on a language means the merge
    table no longer fits it; pairs with zipf_fit / bpe_merges in the
    audit family). Integer-exact: emits token and word SUMS, plus a
    micro-unit ratio computed from the integers, so both engines round
    the same division once."""
    from sarkac_spark.operators.bpe import bpe_apply
    from sarkac_spark.operators.text import token_count

    d = _docs(spark, sf_dir)
    per_doc = bpe_apply(d, "doc_id", "text").join(
        d.select("doc_id", "lang", token_count("text").alias("__w")), "doc_id"
    )
    # integer `div`, never `/`: long/long in Spark routes through a
    # DOUBLE, and a ratio landing near an integer can truncate one off
    # from DuckDB's exact integer floor - the cross-engine tie class
    # the verify skill warns about, avoided by staying integral
    return per_doc.groupBy("lang").agg(
        F.sum("bpe_tokens").cast("long").alias("total_tokens"),
        F.sum("__w").cast("long").alias("total_words"),
        F.expr(
            "(sum(bpe_tokens) * 1000000L) div sum(__w)"
        ).cast("long").alias("fertility_micro"),
    )


def _bpe_fertility_sql() -> str:
    from sarkac_spark.operators.bpe import bpe_apply_sql

    inner = bpe_apply_sql().strip()
    return f"""
WITH tok AS ({inner}),
words AS (
  SELECT doc_id, lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w
  FROM documents
)
SELECT w.lang,
       CAST(sum(t.bpe_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(w.w) AS BIGINT) AS total_words,
       CAST((sum(t.bpe_tokens) * 1000000) // sum(w.w) AS BIGINT)
         AS fertility_micro
FROM tok t JOIN words w USING (doc_id)
GROUP BY 1
"""


def q_bpe_apply(spark, sf_dir):
    """Per-doc token counts under the SHIPPED literal merge table
    (operators/bpe.py::BPE_MERGES, trained once on the sf0.01 corpus —
    the PQ_CODEBOOKS precedent): scoring against a fixed artifact is
    pure string algebra, so unlike `bpe_tokenize` (which re-trains, the
    rows-only iterative tier) this one is oracle-checked bit-for-bit —
    both engines replay the identical boundary-delimited replace chain.
    Zero Python: the encode inlines into whole-stage codegen and runs
    once per DISTINCT word."""
    from sarkac_spark.operators.bpe import bpe_apply

    return bpe_apply(_docs(spark, sf_dir), "doc_id", "text")


QUERIES = {
    "bloom_vocab": q_bloom_vocab,
    "bpe_apply": q_bpe_apply,
    "bpe_fertility": q_bpe_fertility,
    "curation_funnel": q_curation_funnel,
    "quality_classifier": q_quality_classifier,
    "classifier_confusion": q_classifier_confusion,
    "contamination_spans": q_contamination_spans,
    "mixture_realize": q_mixture_realize,
    "bpe_tokenize": q_bpe_tokenize,
    "classifier_calibration": q_classifier_calibration,
    "pq_assign": q_pq_assign,
    "pq_topk": q_pq_topk,
    "pq_recall": q_pq_recall,
    "ivfpq_topk": q_ivfpq_topk,
    "hash_embed": q_hash_embed,
    "pq_rerank": q_pq_rerank,
    "bpe_merges": q_bpe_merges,
    "zipf_fit": q_zipf_fit,
    "delta_curation": q_delta_curation,
    "corpus_overlap": q_corpus_overlap,
    "dedup_exact": q_dedup_exact,
    "stratified_sample": q_stratified_sample,
    "corpus_mix": q_corpus_mix,
    "decontamination": q_decontamination,
    "pii_redaction": q_pii_redaction,
    "profile_documents": q_profile_documents,
    "repetition_filter": q_repetition_filter,
    "chunk_documents": q_chunk_documents,
    "per_lang_sample": q_per_lang_sample,
    "tfidf_terms": q_tfidf_terms,
    "top_terms": q_top_terms,
    "bigram_lm": q_bigram_lm,
    "length_deciles": q_length_deciles,
    "inverted_index": q_inverted_index,
    "quantize_audit": q_quantize_audit,
    "embedding_health": q_embedding_health,
    "curation_pipeline": q_curation_pipeline,
    "dedup_minhash": q_dedup_minhash,
    "dedup_signatures": q_dedup_signatures,
    "minhash_hot_bands": q_minhash_hot_bands,
    "dedup_clusters": q_dedup_clusters,
    "cluster_split": q_cluster_split,
    "dup_ngram_frac": q_dup_ngram_frac,
    "snapshot_diff": q_snapshot_diff,
    "dedup_canonical": q_dedup_canonical,
    "dedup_simhash": q_dedup_simhash,
    "ngram_jaccard": q_ngram_jaccard,
    "embedding_neardup": q_embedding_neardup,
    "cosine_topk": q_cosine_topk,
    "ivf_topk": q_ivf_topk,
    "ivf_bucket_stats": q_ivf_bucket_stats,
    "ivf_refit_decision": q_ivf_refit_decision,
    "pq_distortion": q_pq_distortion,
    "text_ivfpq": q_text_ivfpq,
    "lsh_topk": q_lsh_topk,
    "ivf_probe2": q_ivf_probe2,
    "token_stats": q_token_stats,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "span_dedup": q_span_dedup,
    "hot_spans": q_hot_spans,
    "temperature_sample": q_temperature_sample,
    "vocab_coverage": q_vocab_coverage,
    "pack_sequences": q_pack_sequences,
    "doc_lm_score": q_doc_lm_score,
    "ann_recall": q_ann_recall,
    "multimodal_payload": q_multimodal_payload,
    "semantic_dedup": q_semantic_dedup,
    "gopher_rules": q_gopher_rules,
    "unigram_kl": q_unigram_kl,
    "cms_term_counts": q_cms_term_counts,
    "domain_cap": q_domain_cap,
    "lang_jaccard": q_lang_jaccard,
    "hll_distinct": q_hll_distinct,
    "hist_quantiles": q_hist_quantiles,
    "winnow_pairs": q_winnow_pairs,
    "weighted_sample": q_weighted_sample,
    "hard_negatives": q_hard_negatives,
    "minhash_recall": q_minhash_recall,
    "incremental_dedup": q_incremental_dedup,
    "incremental_minhash": q_incremental_minhash,
    "shard_manifest": q_shard_manifest,
    "mixture_plan": q_mixture_plan,
}


# --- oracle SQL generation ------------------------------------------------

_WORDS = "string_split_regex(trim(text), '\\s+')"

_SHINGLES_CTE = f"""
ws AS (SELECT doc_id, {_WORDS} AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, u.s AS shingle
  FROM ws, UNNEST(
    CASE WHEN len(w) >= 3 THEN
      list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    ELSE [] END
  ) AS u(s)
)
"""


# lang-tagged 3-gram shingles — mirror of operators/dedup.shingles with
# lang carried instead of doc_id (per-row distinct is immaterial here:
# every consumer takes a global DISTINCT or max-aggregated registers)
_LANG_SHINGLES_CTE = f"""
lsh AS (
  SELECT lang, u.s AS shingle
  FROM (SELECT lang, {_WORDS} AS w FROM documents) ws,
  UNNEST(
    CASE WHEN len(w) >= 3 THEN
      list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    ELSE [] END
  ) AS u(s)
)"""




def _minhash_sql() -> str:
    rows = MINHASH_K // MINHASH_BANDS
    mh_aggs = ",\n    ".join(
        f"min(({_LCG_A[i] % MINHASH_P} * h + {_LCG_B[i] % MINHASH_P}) % {MINHASH_P})"
        f" AS mh_{i}"
        for i in range(MINHASH_K)
    )
    band_exprs = ",\n      ".join(
        "'{b}|' || {cols}".format(
            b=b,
            cols=" || '|' || ".join(
                f"mh_{b * rows + r}::varchar" for r in range(rows)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::bigint % {MINHASH_P} AS h
  FROM sh
),
sigs AS (
  SELECT doc_id, {mh_aggs}
  FROM hashed GROUP BY doc_id
),
{_capped_bands_cte(band_exprs)},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       round(n_common / (na.n_sh + nb.n_sh - n_common), 6) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE round(n_common / (na.n_sh + nb.n_sh - n_common), 6) >= {JACCARD_THRESHOLD}
"""


def _ngram_jaccard_sql() -> str:
    return f"""
WITH {_SHINGLES_CTE},
shc AS (
  SELECT * FROM sh WHERE shingle NOT IN (
    SELECT shingle FROM sh GROUP BY 1 HAVING count(*) > {NGRAM_MAX_DF}
  )
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN shc sa ON sa.doc_id = c.id_a
  JOIN shc sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       round(n_common / (na.n_sh + nb.n_sh - n_common), 6) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE round(n_common / (na.n_sh + nb.n_sh - n_common), 6) >= {JACCARD_THRESHOLD}
"""


def _simhash_sql() -> str:
    chunk = SIMHASH_BITS // 4
    mask = (1 << chunk) - 1
    bit_sums = ",\n    ".join(
        f"sum(CASE WHEN (h & {1 << j}) != 0 THEN cnt ELSE -cnt END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    band_exprs = ",\n      ".join(
        f"'{b}:' || ((simhash >> {b * chunk}) & {mask})::varchar" for b in range(4)
    )
    return f"""
WITH ws AS (
  SELECT doc_id, UNNEST({_WORDS}) AS word FROM documents
),
wc AS (
  SELECT doc_id, word, count(*) AS cnt,
         ('0x' || substr(md5(word), 1, 15))::bigint AS h
  FROM ws GROUP BY doc_id, word
),
sums AS (
  SELECT doc_id,
    {bit_sums}
  FROM wc GROUP BY doc_id
),
fps AS (
  SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums
),
bands AS (
  SELECT doc_id, simhash, UNNEST([
      {band_exprs}
  ]) AS bk FROM fps
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
FROM pairs
WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_MAX_HAMMING}
"""


_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


def _cosine_topk_sql() -> str:
    cos = _COS.format(a="q.v", b="c.v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM e q JOIN e c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
  ) AS rank FROM scored
) WHERE rank <= {TOPK}
"""


def _ivf_topk_sql(nprobe: int = 1) -> str:
    cent_cos = _COS.format(a="v.v", b="c.v")
    cos = _COS.format(a="q.v", b="n.v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS bucket, v FROM e WHERE vec_id < {N_CENTROIDS}),
ranked AS (
  SELECT v.vec_id, c.bucket, row_number() OVER (
    PARTITION BY v.vec_id ORDER BY {cent_cos} DESC, c.bucket
  ) AS rn
  FROM e v CROSS JOIN cents c
),
assign_all AS (SELECT vec_id, bucket FROM ranked WHERE rn = 1),
probes AS (SELECT vec_id, bucket FROM ranked WHERE rn <= {nprobe}),
scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM e q
  JOIN probes qa ON qa.vec_id = q.vec_id
  JOIN assign_all na ON na.bucket = qa.bucket AND na.vec_id != q.vec_id
  JOIN e n ON n.vec_id = na.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
  ) AS rank FROM scored
) WHERE rank <= {TOPK}
"""


def _lsh_topk_sql() -> str:
    # mirror of operators/similarity.py::lsh_topk — hyperplane (t, bit)
    # unrolled to a global plane index j: t = j // bits, bit = j % bits.
    # list_dot_product over the ORDER BY d list matches Spark's
    # sequential zip_with/aggregate fold; dots rounded before the sign
    # test on both sides so bucket ids are order-of-summation-proof.
    cos = _COS.format(a="q.v", b="n.v")
    n_planes = LSH_BITS * LSH_TABLES
    return f"""
WITH hp AS (
  SELECT j, list(
    CASE WHEN ('0x' || substr(md5('lsh|' || j || ':' || d), 1, 15))::BIGINT % 2 = 0
         THEN 1.0 ELSE -1.0 END ORDER BY d) AS hv
  FROM range({n_planes}) t1(j) CROSS JOIN range({EMB_DIM}) t2(d)
  GROUP BY j
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (
  SELECT e.vec_id, hp.j // {LSH_BITS} AS t,
         SUM(CASE WHEN round(list_dot_product(e.v, hp.hv), 6) > 0
                  THEN (1::BIGINT << (hp.j % {LSH_BITS})) ELSE 0 END) AS bucket
  FROM e CROSS JOIN hp
  GROUP BY e.vec_id, hp.j // {LSH_BITS}
),
cand AS (
  SELECT DISTINCT qs.vec_id AS query_id, ns.vec_id AS neighbor_id
  FROM sig qs
  JOIN sig ns ON ns.t = qs.t AND ns.bucket = qs.bucket AND ns.vec_id != qs.vec_id
  WHERE qs.vec_id < {N_QUERIES}
),
scored AS (
  SELECT c.query_id, c.neighbor_id, {cos} AS cos_sim
  FROM cand c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
  ) AS rank FROM scored
) WHERE rank <= {TOPK}
"""


def _lang_id_sql() -> str:
    profile_rows = ", ".join(
        f"('{lang}', '{w}')" for lang, ws in STOPWORDS.items() for w in ws
    )
    return f"""
WITH profile(lang_cand, word) AS (VALUES {profile_rows}),
words AS (
  SELECT doc_id, lower(UNNEST({_WORDS})) AS word FROM documents
),
hits AS (
  SELECT w.doc_id, p.lang_cand, count(*) AS n_hits
  FROM words w JOIN profile p ON w.word = p.word
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang_cand AS lang_pred, n_hits FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY n_hits DESC, lang_cand
    ) AS rn FROM hits
  ) WHERE rn = 1
)
SELECT d.doc_id,
       coalesce(b.lang_pred, 'und') AS lang_pred,
       coalesce(b.n_hits, 0) AS n_hits
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id
"""


def _sample_hash_sql(salt: str) -> str:
    return (
        f"('0x' || substr(md5('{salt}|' || CAST(doc_id AS VARCHAR)), 1, 15))"
        "::BIGINT % 1000000"
    )


def _stratified_sample_sql() -> str:
    rate_rows = ", ".join(
        f"('{k}', {int(round(v * 1_000_000))})" for k, v in SAMPLE_RATES.items()
    )
    return f"""
WITH rates(lang, cutoff) AS (VALUES {rate_rows})
SELECT d.doc_id, d.lang,
       CASE WHEN {_sample_hash_sql("split")} < {int(round(EVAL_RATE * 1_000_000))}
            THEN 'eval' ELSE 'train' END AS split
FROM documents d LEFT JOIN rates r USING (lang)
WHERE {_sample_hash_sql("strata")}
      < coalesce(r.cutoff, {int(round(SAMPLE_DEFAULT_RATE * 1_000_000))})
"""


def _dedup_clusters_sql() -> str:
    # transitive closure over the minhash pairs: reach = reflexive
    # closure of the symmetric edge relation, component = min reachable
    # id. UNION (set) semantics terminates the recursion at fixpoint.
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_minhash_sql()}) mh
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM (SELECT u, v FROM edges UNION ALL SELECT u, u FROM edges)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
lbl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
SELECT l.doc_id, l.cluster_id, s.cluster_size
FROM lbl l
JOIN (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY 1) s
USING (cluster_id)
"""


def _dedup_canonical_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_minhash_sql()}) mh
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM (SELECT u, v FROM edges UNION ALL SELECT u, u FROM edges)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
lbl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY 1)
SELECT d.doc_id, l.cluster_id, s.cluster_size,
       row_number() OVER (
         PARTITION BY l.cluster_id ORDER BY d.n_chars DESC, d.doc_id
       ) = 1 AS keep
FROM documents d JOIN lbl l USING (doc_id) JOIN sizes s USING (cluster_id)
UNION ALL
SELECT doc_id, doc_id, 1, true FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM lbl)
"""


def _cluster_split_sql() -> str:
    # same transitive closure as _dedup_clusters_sql; the Bernoulli
    # draw uses the cluster representative (min reachable id) as the
    # hash key, doc_id for singletons.
    cutoff = int(round(EVAL_RATE * 1_000_000))
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_minhash_sql()}) mh
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM (SELECT u, v FROM edges UNION ALL SELECT u, u FROM edges)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
lbl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
SELECT d.doc_id,
       coalesce(l.cluster_id, d.doc_id) AS split_key,
       CASE WHEN ('0x' || substr(md5('split|' ||
                 CAST(coalesce(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 15)
            )::BIGINT % 1000000 < {cutoff}
            THEN 'eval' ELSE 'train' END AS split
FROM documents d LEFT JOIN lbl l USING (doc_id)
"""


def _decontamination_sql() -> str:
    cutoff = int(round(EVAL_RATE * 1_000_000))
    return f"""
WITH labeled AS (
  SELECT doc_id, text,
         CASE WHEN {_sample_hash_sql("split")} < {cutoff}
              THEN 'eval' ELSE 'train' END AS split
  FROM documents
),
ws AS (SELECT doc_id, split, {_WORDS} AS w FROM labeled),
sh AS (
  SELECT DISTINCT doc_id, split, u.s AS shingle
  FROM ws, UNNEST(
    CASE WHEN len(w) >= 3 THEN
      list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    ELSE [] END
  ) AS u(s)
),
h AS (
  SELECT doc_id, split,
         ('0x' || substr(md5(shingle), 1, 15))::bigint AS h
  FROM sh
),
tcap AS (
  SELECT * FROM h WHERE split = 'train' AND h NOT IN (
    SELECT h FROM h WHERE split = 'train'
    GROUP BY 1 HAVING count(*) > {DECONTAM_MAX_TRAIN_DF}
  )
)
SELECT e.doc_id AS eval_id, t.doc_id AS train_id, count(*) AS n_shared
FROM h e JOIN tcap t ON t.h = e.h
WHERE e.split = 'eval'
GROUP BY 1, 2
HAVING count(*) >= {DECONTAM_MIN_SHARED}
"""


def _tfidf_sql() -> str:
    return f"""
WITH words AS (
  SELECT doc_id, lower(UNNEST({_WORDS})) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         round(t.tf * (ln((n.n_docs + 1) / (d.df + 1)::DOUBLE) + 1.0), 6) AS tfidf
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, tfidf, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term
  ) AS rank FROM scored
) WHERE rank <= 3
"""


def _quantize_audit_sql() -> str:
    return """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS vd FROM embeddings
),
s AS (
  SELECT vec_id, vd,
         list_max(list_transform(vd, x -> abs(x))) / 127 AS sc
  FROM v
)
SELECT vec_id, round(sc, 6) AS scale,
       CASE WHEN sc = 0 THEN 0.0 ELSE
         round(list_max(list_transform(vd,
           x -> abs(floor(x / sc + 0.5) * sc - x))), 6)
       END AS max_abs_err
FROM s
"""


def _inverted_index_sql() -> str:
    return f"""
WITH ws AS (SELECT doc_id, {_WORDS} AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, u.s AS shingle
  FROM ws, UNNEST(
    CASE WHEN len(w) >= 3 THEN
      list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    ELSE [] END
  ) AS u(s)
),
p AS (
  SELECT shingle, count(*) AS n_docs,
         array_to_string(list_sort(array_agg(doc_id)), ',') AS postings
  FROM sh GROUP BY 1
)
SELECT shingle, n_docs, postings FROM p WHERE n_docs BETWEEN 2 AND 10
"""


def _length_deciles_sql() -> str:
    probs = ", ".join(str(i / 10) for i in range(1, 10))
    return f"""
WITH b AS (
  SELECT quantile_cont(n_chars, [{probs}]) AS bs FROM documents
)
SELECT 1 + len(list_filter(b.bs, x -> d.n_chars > x)) AS bucket,
       count(*) AS n_rows, min(d.n_chars) AS lo, max(d.n_chars) AS hi,
       round(avg(d.n_chars), 4) AS avg_value
FROM documents d, b
GROUP BY 1
"""


def _top_terms_sql() -> str:
    return f"""
WITH words AS (
  SELECT doc_id, lower(UNNEST({_WORDS})) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2),
per_term AS (
  SELECT term, sum(tf)::BIGINT AS n_occ, count(*) AS df_docs FROM tf GROUP BY 1
)
SELECT term, n_occ, df_docs, rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_occ DESC, term) AS rank FROM per_term
) WHERE rank <= 50
"""


def _bigram_lm_sql() -> str:
    return f"""
WITH w AS (
  SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     x -> x != '') AS wl
  FROM documents
),
bg AS (SELECT unnest(list_zip(wl, wl[2:]), recursive := true) FROM w),
pairs AS (
  SELECT element1 AS head, element2 AS nxt, count(*) AS n_ab
  FROM bg WHERE element2 IS NOT NULL GROUP BY 1, 2
),
heads AS (SELECT head, sum(n_ab)::BIGINT AS n_a FROM pairs GROUP BY 1)
SELECT head, nxt, n_ab, n_a, prob, rank FROM (
  SELECT p.head, p.nxt, p.n_ab::BIGINT AS n_ab, h.n_a,
         round(p.n_ab / h.n_a::DOUBLE, 6) AS prob,
         row_number() OVER (
           PARTITION BY p.head ORDER BY p.n_ab DESC, p.nxt
         ) AS rank
  FROM pairs p JOIN heads h USING (head)
  WHERE h.n_a >= {BIGRAM_MIN_HEAD}
) WHERE rank <= 3
"""


def _per_lang_sample_sql() -> str:
    return f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang, row_number() OVER (
    PARTITION BY lang ORDER BY {_sample_hash_sql("pergroup")}, doc_id
  ) AS rnk
  FROM documents
) WHERE rnk <= {PER_LANG_BUDGET}
"""


def _chunk_documents_sql() -> str:
    stride = CHUNK_WORDS - CHUNK_OVERLAP
    return f"""
WITH ws AS (SELECT doc_id, {_WORDS} AS w FROM documents),
starts AS (
  SELECT doc_id, w, UNNEST(
    range(0, greatest(len(w) - {CHUNK_OVERLAP}, 1), {stride})
  ) AS s
  FROM ws
)
SELECT doc_id,
       (s / {stride})::BIGINT AS chunk_id,
       array_to_string(list_slice(w, s + 1, s + {CHUNK_WORDS}), ' ') AS chunk_text,
       least({CHUNK_WORDS}, len(w) - s)::BIGINT AS n_words
FROM starts
"""


def _repetition_filter_sql() -> str:
    return f"""
WITH ws AS (SELECT doc_id, {_WORDS} AS w FROM documents),
base AS (
  SELECT doc_id, len(w)::BIGINT AS n_words,
         round(len(list_distinct(w)) / len(w)::DOUBLE, 6) AS distinct_word_frac
  FROM ws
),
grams AS (
  SELECT doc_id, u.g
  FROM ws, UNNEST(
    CASE WHEN len(w) >= 2 THEN
      list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
    ELSE [] END
  ) AS u(g)
),
gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
top AS (
  SELECT doc_id, max(c) AS max_c,
         round(max(c) / sum(c)::DOUBLE, 6) AS top_bigram_frac
  FROM gc GROUP BY 1
)
SELECT b.doc_id, b.n_words, b.distinct_word_frac, t.top_bigram_frac,
       (coalesce(t.max_c >= 2 AND t.top_bigram_frac > {REP_TOP_BIGRAM_FRAC}, FALSE)
        OR b.distinct_word_frac < {REP_MIN_DISTINCT_WORD_FRAC}) AS repetitive
FROM base b LEFT JOIN top t USING (doc_id)
"""


_DOC_COLUMNS = ("doc_id", "text", "lang", "source", "n_chars")


def _profile_documents_sql() -> str:
    legs = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name, count(*)::BIGINT AS n_rows,
       (count(*) - count({c}))::BIGINT AS n_null,
       count(DISTINCT {c})::BIGINT AS n_distinct,
       min({c})::VARCHAR AS min_value, max({c})::VARCHAR AS max_value
FROM documents"""
        for c in _DOC_COLUMNS
    )
    return legs


def _pii_redaction_sql() -> str:
    from sarkac_spark.operators.text import PII_PATTERNS

    pats = dict(PII_PATTERNS)
    counts = ",\n       ".join(
        f"len(regexp_extract_all(text, '{pats[k]}'))::BIGINT AS n_{k}"
        for k in ("email", "ssn", "phone", "ip")
    )
    red = "text"
    for kind, pat in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '[{kind.upper()}]', 'g')"
    return f"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' ssn 123-45-' || lpad((doc_id % 10000)::varchar, 4, '0') ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call 555-' || lpad((doc_id % 1000)::varchar, 3, '0')
                      || '-' || lpad((doc_id % 10000)::varchar, 4, '0') ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' host 10.0.' || (doc_id % 256) || '.' || (doc_id * 7 % 256) ELSE '' END
         AS text
  FROM documents
)
SELECT doc_id,
       {counts},
       md5({red}) AS redacted_hash
FROM planted
"""


def _corpus_mix_sql() -> str:
    w_rows = ", ".join(
        f"('{k}', {int(v)}, {int(round((v - int(v)) * 1_000_000))})"
        for k, v in MIX_WEIGHTS.items()
    )
    return f"""
WITH w(source, whole, frac_cutoff) AS (VALUES {w_rows}),
n AS (
  SELECT d.doc_id, d.source,
         coalesce(w.whole, 1)
         + CASE WHEN {_sample_hash_sql("mix")} < coalesce(w.frac_cutoff, 0)
                THEN 1 ELSE 0 END AS n_copies
  FROM documents d LEFT JOIN w USING (source)
)
SELECT doc_id, source, CAST(u.c AS INT) AS copy
FROM n, UNNEST(range(1, n_copies + 1)) AS u(c)
WHERE n_copies > 0
"""


_QUALITY_FEATS_SQL = """
feats AS (
  SELECT doc_id, lang, text,
         len(string_split_regex(trim(text), '\\s+')) AS n_words,
         round(len(list_distinct(string_split_regex(trim(text), '\\s+')))
               / len(string_split_regex(trim(text), '\\s+')), 6) AS unique_ratio,
         round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
               / length(text), 6) AS punct_ratio,
         round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
               / length(text), 6) AS digit_ratio
  FROM documents
)
"""


def _curation_pipeline_sql() -> str:
    return f"""
WITH canon AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
{_QUALITY_FEATS_SQL.strip().rstrip()},
scored AS (
  SELECT f.doc_id, f.lang, f.text,
         (35 * CAST(round(unique_ratio * 1000000) AS BIGINT)
        + 35 * least(n_words * 10000, 1000000)
        + 15 * (1000000 - CAST(round(punct_ratio * 1000000) AS BIGINT))
        + 15 * (1000000 - CAST(round(digit_ratio * 1000000) AS BIGINT))
         ) / 100000000.0 AS quality_score
  FROM feats f JOIN canon c ON f.doc_id = c.doc_id
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CAST(list_sum(list_transform(
           list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
                       p -> p != ''),
           p -> CAST(ceil(length(p) / 4.0) AS BIGINT))) AS BIGINT)) AS BIGINT)
         AS total_bpe_tokens,
       round(avg(quality_score), 6) AS avg_quality
FROM scored
WHERE quality_score >= {QUALITY_CUTOFF}
GROUP BY lang
"""


def _semantic_dedup_sql() -> str:
    # mirror of operators/similarity.py::semantic_dedup — same md5-derived
    # Rademacher planes (salt 'semdedup'), single table, keep-lowest-id
    cos = _COS.format(a="el.v", b="eh.v")
    return f"""
WITH hp AS (
  SELECT j, list(
    CASE WHEN ('0x' || substr(md5('semdedup|' || j || ':' || d), 1, 15))::BIGINT % 2 = 0
         THEN 1.0 ELSE -1.0 END ORDER BY d) AS hv
  FROM range({SEMDEDUP_BITS}) t1(j) CROSS JOIN range({EMB_DIM}) t2(d)
  GROUP BY j
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (
  SELECT e.vec_id,
         CAST(SUM(CASE WHEN round(list_dot_product(e.v, hp.hv), 6) > 0
                       THEN (1::BIGINT << hp.j) ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN hp GROUP BY e.vec_id
),
drops AS (
  SELECT DISTINCT hi.vec_id
  FROM sig lo
  JOIN sig hi ON hi.bucket = lo.bucket AND lo.vec_id < hi.vec_id
  JOIN e el ON el.vec_id = lo.vec_id
  JOIN e eh ON eh.vec_id = hi.vec_id
  WHERE {cos} > {SEMDEDUP_TAU}
)
SELECT s.vec_id, s.bucket,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM sig s LEFT JOIN drops d ON d.vec_id = s.vec_id
"""


def _gopher_rules_sql() -> str:
    from sarkac_spark.operators.text import _GOPHER_STOPWORDS

    stoplist = ", ".join(f"'{s}'" for s in _GOPHER_STOPWORDS)
    return f"""
WITH staged AS (
  SELECT doc_id, {_WORDS} AS w, length(text) AS nc,
         length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS nclean
  FROM documents
),
feats AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CASE WHEN len(w) > 0
              THEN round(CAST(list_sum(list_transform(w, x -> length(x)))
                              AS BIGINT) / len(w), 6)
              ELSE 0.0 END AS mean_word_len,
         CASE WHEN nc > 0 THEN round((nc - nclean) / nc, 6)
              ELSE 0.0 END AS symbol_ratio,
         CAST(len(list_filter(w, x -> list_contains([{stoplist}], lower(x))))
              AS BIGINT) AS stop_hits
  FROM staged
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, stop_hits,
       CAST(CASE WHEN n_words BETWEEN 10 AND 1000 THEN 1 ELSE 0 END AS BIGINT)
         AS ok_word_count,
       CAST(CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END
            AS BIGINT) AS ok_mean_word_len,
       CAST(CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS BIGINT)
         AS ok_symbol_ratio,
       CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS ok_stopwords,
       CAST(CASE WHEN n_words BETWEEN 10 AND 1000
                  AND mean_word_len BETWEEN 2.0 AND 12.0
                  AND symbol_ratio <= 0.1
                  AND stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM feats
"""


def _unigram_kl_sql() -> str:
    return f"""
WITH toks AS (
  SELECT source AS grp, lower(u.t) AS tok
  FROM documents, UNNEST({_WORDS}) AS u(t)
),
gt AS (SELECT grp, tok, count(*) AS c_gt FROM toks GROUP BY grp, tok),
gl AS (SELECT tok, CAST(sum(c_gt) AS BIGINT) AS c_t FROM gt GROUP BY tok),
gtot AS (SELECT grp, CAST(sum(c_gt) AS BIGINT) AS tot_g FROM gt GROUP BY grp),
tot AS (SELECT CAST(sum(c_gt) AS BIGINT) AS tot FROM gt)
SELECT gt.grp AS source,
       CAST(sum(c_gt) AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       round(sum((c_gt / tot_g) * ln((c_gt * tot) / (tot_g * c_t))), 6)
         AS kl_divergence
FROM gt
JOIN gl USING (tok)
JOIN gtot USING (grp)
CROSS JOIN tot
GROUP BY gt.grp
"""


def _contamination_spans_sql(n: int = 3) -> str:
    cutoff = int(round(EVAL_RATE * 1_000_000))
    gram = " || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(n))
    return f"""
WITH labeled AS (
  SELECT doc_id, text,
         CASE WHEN {_sample_hash_sql("split")} < {cutoff}
              THEN 'eval' ELSE 'train' END AS split
  FROM documents
),
ws AS (SELECT doc_id, split, {_WORDS} AS w FROM labeled),
tg AS (
  SELECT DISTINCT doc_id AS train_id,
         ('0x' || substr(md5(u.s), 1, 15))::BIGINT AS h
  FROM ws, UNNEST(
    CASE WHEN len(w) >= {n} THEN
      list_transform(range(1, len(w) - {n - 2}), i -> {gram})
    ELSE [] END
  ) AS u(s)
  WHERE split = 'train'
),
tcap AS (
  SELECT * FROM tg WHERE h NOT IN (
    SELECT h FROM tg GROUP BY 1 HAVING count(*) > {DECONTAM_MAX_TRAIN_DF}
  )
),
eg AS (
  SELECT doc_id AS eval_id, u.i - 1 AS pos,
         ('0x' || substr(md5({gram}), 1, 15))::BIGINT AS h
  FROM ws, UNNEST(
    CASE WHEN len(w) >= {n} THEN range(1, len(w) - {n - 2}) ELSE [] END
  ) AS u(i)
  WHERE split = 'eval'
),
m AS (SELECT DISTINCT e.eval_id, t.train_id, e.pos FROM eg e JOIN tcap t USING (h)),
r AS (
  SELECT eval_id, train_id,
         pos - row_number() OVER (
           PARTITION BY eval_id, train_id ORDER BY pos
         ) AS island
  FROM m
),
isl AS (
  SELECT eval_id, train_id, island, count(*) AS run FROM r GROUP BY 1, 2, 3
)
SELECT eval_id, train_id,
       CAST(max(run) AS BIGINT) AS max_run,
       CAST(sum(run) AS BIGINT) AS n_matched_pos,
       CAST(max(run) + {n - 1} AS BIGINT) AS span_words
FROM isl
GROUP BY 1, 2
HAVING max(run) >= {SPAN_MIN_RUN}
"""


def _quality_micro_cte(src: str) -> str:
    """Quality features in exact integer micro-units over ``src`` —
    shared by the classifier oracles; mirrors
    operators/classify.quality_feature_frame."""
    return f"""
feats AS (
  SELECT doc_id,
         len({_WORDS}) AS n_words,
         round(len(list_distinct({_WORDS})) / len({_WORDS}), 6) AS unique_ratio,
         round(CAST(list_sum(list_transform({_WORDS}, x -> length(x))) AS BIGINT)
               / len({_WORDS}), 6) AS mean_word_len,
         round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
               / length(text), 6) AS punct_ratio,
         round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
               / length(text), 6) AS digit_ratio
  FROM {src}
),
micro AS (
  SELECT doc_id,
         CAST(round(unique_ratio * 1000000) AS BIGINT) AS unique_ratio,
         least(n_words * 10000, 1000000) AS len_term,
         CAST(round(mean_word_len * 1000000) AS BIGINT) AS mean_word_len,
         CAST(round(punct_ratio * 1000000) AS BIGINT) AS punct_ratio,
         CAST(round(digit_ratio * 1000000) AS BIGINT) AS digit_ratio
  FROM feats
)"""


def _logit_nano_expr() -> str:
    """The shipped model's integer logit — generated from the SAME
    weight dict the Spark operator reads (one source of truth)."""
    from sarkac_spark.operators.classify import (
        DEFAULT_BIAS_MILLI,
        DEFAULT_WEIGHTS_MILLI,
    )

    terms = " + ".join(
        f"({w}) * {name}" for name, w in sorted(DEFAULT_WEIGHTS_MILLI.items())
    )
    # CAST: DuckDB integer literals are INT32 — bias*1e6 overflows them
    return f"(CAST({DEFAULT_BIAS_MILLI} AS BIGINT) * 1000000 + {terms})"


def _quality_classifier_sql() -> str:
    return f"""
WITH {_quality_micro_cte("documents")}
SELECT doc_id,
       {_logit_nano_expr()} AS logit_nano,
       ({_logit_nano_expr()} >= 0) AS keep
FROM micro
"""


def _delta_curation_sql() -> str:
    return f"""
WITH old AS (
  SELECT doc_id,
         CASE WHEN {_sample_hash_sql("snap_edit")} < {SNAP_EDIT_CUTOFF}
              THEN reverse(text) ELSE text END AS text
  FROM documents
  WHERE {_sample_hash_sql("snap_add")} >= {SNAP_ADD_CUTOFF}
),
new AS (
  SELECT doc_id, text FROM documents
  WHERE {_sample_hash_sql("snap_del")} >= {SNAP_DEL_CUTOFF}
),
o AS (SELECT doc_id, md5(text) AS old_fp FROM old),
nn AS (SELECT doc_id, md5(text) AS new_fp FROM new),
diff AS (
  SELECT doc_id,
         CASE WHEN old_fp IS NULL THEN 'added'
              WHEN new_fp IS NULL THEN 'removed'
              WHEN old_fp != new_fp THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM o FULL OUTER JOIN nn USING (doc_id)
),
work AS (SELECT doc_id FROM diff WHERE status IN ('added', 'changed')),
src AS (SELECT n.doc_id, n.text FROM new n JOIN work USING (doc_id)),
{_quality_micro_cte("src")},
scored AS (
  SELECT doc_id,
         {_logit_nano_expr()} AS logit_nano,
         ({_logit_nano_expr()} >= 0) AS keep
  FROM micro
)
SELECT d.status,
       count(*) AS n_docs,
       count(s.logit_nano) AS n_scored,
       CAST(sum(CASE WHEN s.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM diff d LEFT JOIN scored s USING (doc_id)
GROUP BY 1
"""


def _bpe_merges_sql() -> str:
    return f"""
WITH w AS (SELECT u.t AS word FROM documents, UNNEST({_WORDS}) AS u(t)),
wc AS (SELECT word, count(*) AS cnt FROM w GROUP BY 1),
p AS (
  SELECT u.s AS pair, cnt
  FROM wc, UNNEST(
    CASE WHEN length(word) >= 2 THEN
      list_transform(range(1, length(word)), i -> substr(word, i, 2))
    ELSE [] END
  ) AS u(s)
),
agg AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS occurrences FROM p GROUP BY 1),
top AS (
  SELECT pair, occurrences FROM agg ORDER BY occurrences DESC, pair LIMIT {BPE_TOPK}
)
SELECT pair, occurrences,
       (SELECT count(*) FROM top t2
        WHERE t2.occurrences > t.occurrences
           OR (t2.occurrences = t.occurrences AND t2.pair < t.pair)) + 1 AS rank
FROM top t
"""


def _zipf_fit_sql() -> str:
    return f"""
WITH w AS (SELECT u.t AS term FROM documents, UNNEST({_WORDS}) AS u(t)),
counts AS (SELECT term, CAST(count(*) AS BIGINT) AS n_occ FROM w GROUP BY 1),
top AS (SELECT term, n_occ FROM counts ORDER BY n_occ DESC, term LIMIT {ZIPF_TOPK}),
ranked AS (
  SELECT n_occ,
         (SELECT count(*) FROM top t2
          WHERE t2.n_occ > t.n_occ
             OR (t2.n_occ = t.n_occ AND t2.term < t.term)) + 1 AS rank
  FROM top t
),
pts AS (
  SELECT CAST(round(log10(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS x,
         CAST(round(log10(CAST(n_occ AS DOUBLE)) * 1000000) AS BIGINT) AS y
  FROM ranked
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_big,
         CAST(sum(x) AS BIGINT) AS sxi, CAST(sum(y) AS BIGINT) AS syi,
         CAST(sum(x * y) AS BIGINT) AS sxyi,
         CAST(sum(x * x) AS BIGINT) AS sxxi,
         CAST(sum(y * y) AS BIGINT) AS syyi
  FROM pts
),
d AS (
  SELECT n_big, CAST(n_big AS DOUBLE) AS n,
         CAST(sxi AS DOUBLE) AS sx, CAST(syi AS DOUBLE) AS sy,
         CAST(sxyi AS DOUBLE) AS sxy, CAST(sxxi AS DOUBLE) AS sxx,
         CAST(syyi AS DOUBLE) AS syy
  FROM s
)
SELECT n_big AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
             / 1000000.0, 6) AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM d
"""


def _classifier_confusion_sql() -> str:
    return f"""
WITH {_quality_micro_cte("documents")},
logits AS (
  SELECT doc_id, ({_logit_nano_expr()} >= 0) AS keep FROM micro
),
gp AS (SELECT doc_id, passes FROM ({_gopher_rules_sql()}) g)
SELECT l.keep, gp.passes AS gopher_pass, count(*) AS n_docs
FROM logits l JOIN gp USING (doc_id)
GROUP BY 1, 2
"""


def _mixture_realize_sql() -> str:
    targets = ", ".join(f"('{k}', {v})" for k, v in MIX_TARGETS.items())
    h = (
        "('0x' || substr(md5('mix_epochs|' || CAST(doc_id AS VARCHAR) || '#' "
        "|| CAST(u.c AS VARCHAR)), 1, 15))::BIGINT % 1000000"
    )
    return f"""
WITH c AS (
  SELECT lang, CAST(sum(len({_WORDS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM c),
w(lang, target_weight) AS (VALUES {targets}),
plan AS (
  SELECT c.lang,
         round(t.total * CAST(coalesce(w.target_weight, 0.0) AS DOUBLE)
               / c.n_tokens, 6) AS epochs
  FROM c LEFT JOIN w USING (lang), t
)
SELECT d.doc_id, d.lang, u.c AS epoch_copy
FROM documents d
JOIN plan p USING (lang),
UNNEST(range(0, CAST(floor(p.epochs) AS BIGINT) + 1)) AS u(c)
WHERE u.c < CAST(floor(p.epochs) AS BIGINT)
   OR {h} < CAST(round((p.epochs - floor(p.epochs)) * 1000000) AS BIGINT)
"""


def _pq_cb_values(codebooks=None) -> str:
    from sarkac_spark.operators.pq import PQ_CODEBOOKS

    rows = []
    for m, cents in enumerate(codebooks or PQ_CODEBOOKS):
        for c, cent in enumerate(cents):
            lst = ", ".join(repr(float(x)) for x in cent)
            rows.append(f"({m}, {c}, CAST([{lst}] AS DOUBLE[]))")
    return ",\n  ".join(rows)


def _pq_codes_cte() -> str:
    """cb + e + per-(vec, subspace) argmin code — shared by both PQ
    oracles; mirrors pq_assign_long (round-6 distance, index
    tie-break)."""
    return f"""cb(m, c, cent) AS (VALUES
  {_pq_cb_values()}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sub AS (
  SELECT e.vec_id, cb.m, cb.c,
         round(list_sum(list_transform(range(1, 9),
               j -> (v[cb.m * 8 + j] - cent[j]) * (v[cb.m * 8 + j] - cent[j])
         )), 6) AS d
  FROM e CROSS JOIN cb
),
best AS (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rn
    FROM sub
  ) WHERE rn = 1
)"""


def _pq_assign_sql() -> str:
    from sarkac_spark.operators.pq import PQ_M

    codes = ",\n       ".join(
        f"CAST(max(CASE WHEN m = {mi} THEN c END) AS BIGINT) AS code_{mi}"
        for mi in range(PQ_M)
    )
    return f"""
WITH {_pq_codes_cte()}
SELECT vec_id,
       {codes}
FROM best GROUP BY vec_id
"""


def _pq_topk_sql() -> str:
    return f"""
WITH {_pq_codes_cte()},
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
tab AS (
  SELECT q.query_id, cb.m, cb.c AS code,
         round(list_sum(list_transform(range(1, 9),
               j -> (qv[cb.m * 8 + j] - cent[j]) * (qv[cb.m * 8 + j] - cent[j])
         )), 6) AS d
  FROM q CROSS JOIN cb
),
adist AS (
  SELECT t.query_id, b.vec_id,
         CAST(sum(CAST(round(t.d * 1000000) AS BIGINT)) AS BIGINT)
           AS adist_micro
  FROM best b JOIN tab t ON t.m = b.m AND t.code = b.c
  WHERE b.vec_id != t.query_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id AS neighbor_id, adist_micro, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adist_micro, vec_id
  ) AS rank FROM adist
) WHERE rank <= {TOPK}
"""


def _pq_recall_sql() -> str:
    return f"""
WITH {_pq_codes_cte()},
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_sum(list_transform(range(1, 65),
                       j -> (qv[j] - c.v[j]) * (qv[j] - c.v[j]))), 6),
                      c.vec_id
           ) AS rank
    FROM q CROSS JOIN e c
    WHERE c.vec_id != q.query_id
  ) WHERE rank <= {TOPK}
),
tab AS (
  SELECT q.query_id, cb.m, cb.c AS code,
         round(list_sum(list_transform(range(1, 9),
               j -> (qv[cb.m * 8 + j] - cent[j]) * (qv[cb.m * 8 + j] - cent[j])
         )), 6) AS d
  FROM q CROSS JOIN cb
),
adist AS (
  SELECT t.query_id, b.vec_id,
         CAST(sum(CAST(round(t.d * 1000000) AS BIGINT)) AS BIGINT)
           AS adist_micro
  FROM best b JOIN tab t ON t.m = b.m AND t.code = b.c
  WHERE b.vec_id != t.query_id
  GROUP BY 1, 2
),
ap AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY adist_micro, vec_id
    ) AS rank FROM adist
  ) WHERE rank <= {TOPK}
),
hits AS (
  SELECT e2.query_id, count(*) AS n_hits
  FROM ap JOIN ex e2 USING (query_id, neighbor_id)
  GROUP BY 1
)
SELECT b.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / CAST({TOPK} AS DOUBLE), 6) AS recall
FROM (SELECT DISTINCT query_id FROM ex) b
LEFT JOIN hits h USING (query_id)
"""


def _ivfpq_topk_sql(nprobe: int = 2) -> str:
    cent_cos = _COS.format(a="v.v", b="c.v")
    return f"""
WITH {_pq_codes_cte()},
cents AS (SELECT vec_id AS bucket, v FROM e WHERE vec_id < {N_CENTROIDS}),
ivfranked AS (
  SELECT v.vec_id, c.bucket, row_number() OVER (
    PARTITION BY v.vec_id ORDER BY {cent_cos} DESC, c.bucket
  ) AS rn
  FROM e v CROSS JOIN cents c
),
assign_all AS (SELECT vec_id, bucket FROM ivfranked WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, bucket FROM ivfranked
  WHERE rn <= {nprobe} AND vec_id < {N_QUERIES}
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
tab AS (
  SELECT q.query_id, cb.m, cb.c AS code,
         round(list_sum(list_transform(range(1, 9),
               j -> (qv[cb.m * 8 + j] - cent[j]) * (qv[cb.m * 8 + j] - cent[j])
         )), 6) AS d
  FROM q CROSS JOIN cb
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assign_all a
    ON a.bucket = p.bucket AND a.vec_id != p.query_id
),
adist AS (
  SELECT c.query_id, c.vec_id,
         CAST(sum(CAST(round(t.d * 1000000) AS BIGINT)) AS BIGINT)
           AS adist_micro
  FROM cand c
  JOIN best b ON b.vec_id = c.vec_id
  JOIN tab t ON t.query_id = c.query_id AND t.m = b.m AND t.code = b.c
  GROUP BY 1, 2
)
SELECT query_id, vec_id AS neighbor_id, adist_micro, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adist_micro, vec_id
  ) AS rank FROM adist
) WHERE rank <= {TOPK}
"""


def _hash_embed_sql(dim: int = EMB_DIM) -> str:
    return f"""
WITH w AS (
  SELECT doc_id, lower(u.t) AS t FROM documents, UNNEST({_WORDS}) AS u(t)
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS hv FROM w
),
sb AS (
  SELECT doc_id, hv % {dim} AS b,
         CASE WHEN hv % {2 * dim} >= {dim} THEN -1 ELSE 1 END AS s
  FROM h
),
pb AS (SELECT doc_id, b, CAST(sum(s) AS BIGINT) AS v FROM sb GROUP BY 1, 2),
grid AS (
  SELECT d.doc_id, r.j
  FROM (SELECT DISTINCT doc_id FROM pb) d, range(0, {dim}) r(j)
),
dense AS (
  SELECT g.doc_id, g.j, coalesce(pb.v, 0) AS v
  FROM grid g LEFT JOIN pb ON pb.doc_id = g.doc_id AND pb.b = g.j
),
nrm AS (
  SELECT doc_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS n FROM dense GROUP BY 1
)
SELECT d.doc_id, d.j,
       CASE WHEN n.n > 0 THEN round(d.v / n.n, 6) ELSE 0.0 END AS v
FROM dense d JOIN nrm n USING (doc_id)
"""


def _pq_rerank_sql() -> str:
    return f"""
WITH {_pq_codes_cte()},
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
tab AS (
  SELECT q.query_id, cb.m, cb.c AS code,
         round(list_sum(list_transform(range(1, 9),
               j -> (qv[cb.m * 8 + j] - cent[j]) * (qv[cb.m * 8 + j] - cent[j])
         )), 6) AS d
  FROM q CROSS JOIN cb
),
adist AS (
  SELECT t.query_id, b.vec_id,
         CAST(sum(CAST(round(t.d * 1000000) AS BIGINT)) AS BIGINT)
           AS adist_micro
  FROM best b JOIN tab t ON t.m = b.m AND t.code = b.c
  WHERE b.vec_id != t.query_id
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY adist_micro, vec_id
    ) AS rn FROM adist
  ) WHERE rn <= {PQ_SHORTLIST}
),
rescored AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_sum(list_transform(range(1, 65),
               j -> (q.qv[j] - n.v[j]) * (q.qv[j] - n.v[j]))), 6) AS dist
  FROM short s
  JOIN q ON q.query_id = s.query_id
  JOIN e n ON n.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, dist, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY dist, neighbor_id
  ) AS rank FROM rescored
) WHERE rank <= {TOPK}
"""


def _classifier_calibration_sql(rates=(0.25, 0.5, 0.75)) -> str:
    thr_rows = "\n  UNION ALL\n".join(
        f"  SELECT CAST({r} AS DOUBLE) AS keep_rate,"
        f" round(quantile_cont(logit_nano, {1.0 - float(r)!r}), 6)"
        f" AS threshold_nano FROM logits"
        for r in rates
    )
    return f"""
WITH {_quality_micro_cte("documents")},
logits AS (SELECT {_logit_nano_expr()} AS logit_nano FROM micro),
thr AS (
{thr_rows}
)
SELECT t.keep_rate, t.threshold_nano,
       CAST(sum(CASE WHEN l.logit_nano >= t.threshold_nano THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM logits l CROSS JOIN thr t
GROUP BY 1, 2
"""


ORACLE = {
    "quality_classifier": _quality_classifier_sql(),
    "classifier_confusion": _classifier_confusion_sql(),
    "classifier_calibration": _classifier_calibration_sql(),
    "pq_assign": _pq_assign_sql(),
    "pq_topk": _pq_topk_sql(),
    "pq_recall": _pq_recall_sql(),
    "ivfpq_topk": _ivfpq_topk_sql(),
    "hash_embed": _hash_embed_sql(),
    "pq_rerank": _pq_rerank_sql(),
    "mixture_realize": _mixture_realize_sql(),
    "contamination_spans": _contamination_spans_sql(),
    "delta_curation": _delta_curation_sql(),
    "bpe_merges": _bpe_merges_sql(),
    "bpe_apply": bpe_apply_sql(),
    "bpe_fertility": _bpe_fertility_sql(),
    "curation_funnel": _curation_funnel_sql(),
    "zipf_fit": _zipf_fit_sql(),
    "dedup_exact": """
SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
""",
    "stratified_sample": _stratified_sample_sql(),
    "corpus_mix": _corpus_mix_sql(),
    "decontamination": _decontamination_sql(),
    "pii_redaction": _pii_redaction_sql(),
    "profile_documents": _profile_documents_sql(),
    "repetition_filter": _repetition_filter_sql(),
    "chunk_documents": _chunk_documents_sql(),
    "per_lang_sample": _per_lang_sample_sql(),
    "tfidf_terms": _tfidf_sql(),
    "top_terms": _top_terms_sql(),
    "bigram_lm": _bigram_lm_sql(),
    "length_deciles": _length_deciles_sql(),
    "inverted_index": _inverted_index_sql(),
    "quantize_audit": _quantize_audit_sql(),
    "embedding_health": """
SELECT label,
       count(*) AS n_vecs,
       min(len(embedding))::BIGINT AS min_dims,
       max(len(embedding))::BIGINT AS max_dims,
       count(*) FILTER (len(list_filter(embedding, x -> x <> 0)) = 0)
         AS n_zero_vecs,
       count(*) FILTER (len(list_filter(embedding, x -> isnan(x) OR isinf(x))) > 0)
         AS n_nonfinite_vecs
FROM embeddings GROUP BY label
""",
    "curation_pipeline": _curation_pipeline_sql(),
    "dedup_minhash": _minhash_sql(),
    "dedup_signatures": _dedup_signatures_sql(),
    "minhash_hot_bands": _minhash_hot_bands_sql(),
    "dedup_clusters": _dedup_clusters_sql(),
    "cluster_split": _cluster_split_sql(),
    "dup_ngram_frac": f"""
WITH ws AS (SELECT doc_id, {_WORDS} AS w FROM documents),
occ AS (
  SELECT doc_id, u.g AS g
  FROM ws, UNNEST(
    CASE WHEN len(w) >= {DUP_NGRAM_N} THEN
      list_transform(range(1, len(w) - {DUP_NGRAM_N} + 2),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    ELSE [] END
  ) AS u(g)
),
pdg AS (SELECT doc_id, g, count(*) AS cnt FROM occ GROUP BY 1, 2),
gdf AS (SELECT g, count(*) AS df FROM pdg GROUP BY 1)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_ngrams,
       CAST(sum(CASE WHEN df >= {DUP_NGRAM_MIN_DF} THEN cnt ELSE 0 END)
            AS BIGINT) AS n_dup,
       round(sum(CASE WHEN df >= {DUP_NGRAM_MIN_DF} THEN cnt ELSE 0 END)
             / sum(cnt), 6) AS dup_frac
FROM pdg JOIN gdf USING (g)
GROUP BY doc_id
""",
    "snapshot_diff": f"""
WITH old AS (
  SELECT doc_id,
         CASE WHEN {_sample_hash_sql("snap_edit")} < {SNAP_EDIT_CUTOFF}
              THEN reverse(text) ELSE text END AS text
  FROM documents
  WHERE {_sample_hash_sql("snap_add")} >= {SNAP_ADD_CUTOFF}
),
new AS (
  SELECT doc_id, text FROM documents
  WHERE {_sample_hash_sql("snap_del")} >= {SNAP_DEL_CUTOFF}
),
o AS (SELECT doc_id, md5(text) AS old_fp FROM old),
n AS (SELECT doc_id, md5(text) AS new_fp FROM new)
SELECT doc_id,
       CASE WHEN old_fp IS NULL THEN 'added'
            WHEN new_fp IS NULL THEN 'removed'
            WHEN old_fp != new_fp THEN 'changed'
            ELSE 'unchanged' END AS status,
       old_fp, new_fp
FROM o FULL OUTER JOIN n USING (doc_id)
""",
    "dedup_canonical": _dedup_canonical_sql(),
    "dedup_simhash": _simhash_sql(),
    "ngram_jaccard": _ngram_jaccard_sql(),
    "embedding_neardup": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_COS.format(a="a.v", b="b.v")} AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_COS.format(a="a.v", b="b.v")} >= {EMB_NEARDUP_THRESHOLD}
""",
    "cosine_topk": _cosine_topk_sql(),
    "lsh_topk": _lsh_topk_sql(),
    "ivf_topk": _ivf_topk_sql(),
    "ivf_bucket_stats": _ivf_bucket_stats_sql(),
    "ivf_refit_decision": _ivf_refit_decision_sql(),
    "pq_distortion": _pq_distortion_sql(),
    "text_ivfpq": _text_ivfpq_sql(),
    "ivf_probe2": _ivf_topk_sql(nprobe=IVF_NPROBE),
    "ann_recall": f"""
WITH exact AS ({_cosine_topk_sql()}),
ivf AS ({_ivf_topk_sql()}),
lsh AS ({_lsh_topk_sql()}),
base AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY 1),
hits AS (
  SELECT 'ivf' AS method, e.query_id, count(*) AS n_hits
  FROM exact e JOIN ivf a USING (query_id, neighbor_id) GROUP BY 2
  UNION ALL
  SELECT 'lsh' AS method, e.query_id, count(*) AS n_hits
  FROM exact e JOIN lsh a USING (query_id, neighbor_id) GROUP BY 2
)
SELECT m.method, b.query_id,
       coalesce(h.n_hits, 0) AS n_hits,
       round(coalesce(h.n_hits, 0)
             / CAST(least(b.n_exact, {TOPK}) AS DOUBLE), 6) AS recall
FROM (SELECT 'ivf' AS method UNION ALL SELECT 'lsh') m
CROSS JOIN base b
LEFT JOIN hits h ON h.method = m.method AND h.query_id = b.query_id
""",
    "token_stats": f"""
SELECT doc_id,
       len({_WORDS}) AS n_tokens,
       CAST(list_sum(list_transform(
           list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
                       p -> p != ''),
           p -> CAST(ceil(length(p) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
""",
    "quality_score": f"""
WITH feats AS (
  SELECT doc_id,
         len({_WORDS}) AS n_words,
         len(list_distinct({_WORDS})) AS n_uniq,
         round(len(list_distinct({_WORDS})) / len({_WORDS}), 6) AS unique_ratio,
         round(CAST(list_sum(list_transform({_WORDS}, x -> length(x))) AS BIGINT)
               / len({_WORDS}), 6) AS mean_word_len,
         round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
               / length(text), 6) AS punct_ratio,
         round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
               / length(text), 6) AS digit_ratio
  FROM documents
)
SELECT doc_id, n_words, unique_ratio, mean_word_len, punct_ratio, digit_ratio,
       (35 * CAST(round(unique_ratio * 1000000) AS BIGINT)
      + 35 * least(n_words * 10000, 1000000)
      + 15 * (1000000 - CAST(round(punct_ratio * 1000000) AS BIGINT))
      + 15 * (1000000 - CAST(round(digit_ratio * 1000000) AS BIGINT))
       ) / 100000000.0 AS quality_score
FROM feats
""",
    "lang_id": _lang_id_sql(),
    "semantic_dedup": _semantic_dedup_sql(),
    "gopher_rules": _gopher_rules_sql(),
    "unigram_kl": _unigram_kl_sql(),
    "cms_term_counts": _cms_term_counts_sql(),
    "hll_distinct": _hll_distinct_sql(),
    "bloom_vocab": _bloom_vocab_sql(),
    "corpus_overlap": _corpus_overlap_sql(),
    "hist_quantiles": _hist_quantiles_sql(),
    "winnow_pairs": _winnow_pairs_sql(),
    "weighted_sample": _weighted_sample_sql(),
    "hard_negatives": _hard_negatives_sql(),
    "minhash_recall": _minhash_recall_sql(),
    "incremental_dedup": _incremental_dedup_sql(),
    "incremental_minhash": _incremental_minhash_sql(),
    "domain_cap": f"""
SELECT doc_id, source, n_chars, domain_rank FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id
         ) AS domain_rank
  FROM documents
) WHERE domain_rank <= {DOMAIN_CAP}
""",
    "lang_jaccard": f"""
WITH vocab AS (
  SELECT DISTINCT lang AS g, lower(u.t) AS term
  FROM documents, UNNEST({_WORDS}) AS u(t)
),
sizes AS (SELECT g, count(*) AS vocab FROM vocab GROUP BY g),
inter AS (
  SELECT a.g AS ga, b.g AS gb, count(*) AS shared
  FROM vocab a JOIN vocab b USING (term)
  WHERE a.g < b.g GROUP BY 1, 2
)
SELECT sa.g AS group_a, sb.g AS group_b,
       sa.vocab AS vocab_a, sb.vocab AS vocab_b,
       coalesce(i.shared, 0) AS shared_terms,
       CAST(coalesce(i.shared, 0) AS DOUBLE)
         / (sa.vocab + sb.vocab - coalesce(i.shared, 0)) AS jaccard
FROM sizes sa JOIN sizes sb ON sa.g < sb.g
LEFT JOIN inter i ON i.ga = sa.g AND i.gb = sb.g
""",
    "hot_spans": f"""
WITH ws AS (SELECT doc_id, {_WORDS} AS w FROM documents),
spans AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(
           list_slice(w, u.i * {SPAN_WORDS} + 1, u.i * {SPAN_WORDS} + {SPAN_WORDS}),
           ' ') AS span
  FROM ws, UNNEST(range(0, CAST(ceil(len(w) / {SPAN_WORDS}.0) AS INT))) AS u(i)
),
counts AS (
  SELECT span, count(*) AS span_df, count(DISTINCT doc_id) AS n_docs
  FROM spans GROUP BY span HAVING count(*) >= 2
)
SELECT span, span_df, n_docs FROM counts
ORDER BY span_df DESC, n_docs DESC, span LIMIT {HOT_SPANS_TOP_K}
""",
    "span_dedup": f"""
WITH ws AS (SELECT doc_id, {_WORDS} AS w FROM documents),
spans AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(
           list_slice(w, u.i * {SPAN_WORDS} + 1, u.i * {SPAN_WORDS} + {SPAN_WORDS}),
           ' ') AS span
  FROM ws, UNNEST(range(0, CAST(ceil(len(w) / {SPAN_WORDS}.0) AS INT))) AS u(i)
),
first AS (
  SELECT doc_id, pos, span, row_number() OVER (
    PARTITION BY substr(md5(span), 1, 15) ORDER BY doc_id, pos) AS rn
  FROM spans
),
totals AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1),
rebuilt AS (
  SELECT doc_id, string_agg(span, ' ' ORDER BY pos) AS text_dedup,
         count(*) AS n_kept
  FROM first WHERE rn = 1 GROUP BY doc_id
)
SELECT t.doc_id, coalesce(r.text_dedup, '') AS text_dedup, t.n_spans,
       coalesce(r.n_kept, 0) AS n_kept
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
""",
    "temperature_sample": f"""
WITH c AS (SELECT lang, count(*) AS n_rows FROM documents GROUP BY 1),
t AS (SELECT sum(pow(n_rows, {TEMP_ALPHA})) AS pw_sum,
             sum(n_rows) AS n_total FROM c),
r AS (
  SELECT lang,
         round(least(1.0,
           t.n_total * round(pow(c.n_rows, {TEMP_ALPHA}) / t.pw_sum, 6)
           / c.n_rows), 6) AS rate
  FROM c, t
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r USING (lang)
WHERE {_sample_hash_sql("temp")}
      < CAST(round(rate * 1000000) AS BIGINT)
""",
    "vocab_coverage": f"""
WITH ws AS (SELECT {_WORDS} AS w FROM documents),
words AS (SELECT lower(u.s) AS term FROM ws, UNNEST(ws.w) AS u(s)),
counts AS (SELECT term, count(*) AS n_occ FROM words GROUP BY 1),
tot AS (SELECT sum(n_occ) AS total FROM counts),
top AS (
  SELECT term, n_occ,
         row_number() OVER (ORDER BY n_occ DESC, term) AS rank
  FROM counts QUALIFY rank <= {VOCAB_TOP_K}
),
cum AS (
  SELECT rank, term, n_occ,
         sum(n_occ) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS cum_occ
  FROM top
)
SELECT rank, term, n_occ,
       round(cum_occ / t.total, 6) AS cum_coverage,
       round(1 - cum_occ / t.total, 6) AS oov_rate
FROM cum, tot t
""",
    "doc_lm_score": """
WITH ws AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     x -> x != '') AS w
  FROM documents
),
bg AS (
  SELECT doc_id, w[u.i] AS head, w[u.i + 1] AS nxt
  FROM ws, UNNEST(range(1, len(w))) AS u(i)
  WHERE len(w) >= 2
),
pairs AS (SELECT head, nxt, count(*) AS n_ab FROM bg GROUP BY 1, 2),
heads AS (SELECT head, sum(n_ab) AS n_a FROM pairs GROUP BY 1),
v AS (
  SELECT count(DISTINCT wd) AS v FROM (
    SELECT head AS wd FROM bg UNION ALL SELECT nxt FROM bg
  )
),
m AS (
  SELECT p.head, p.nxt, -ln((p.n_ab + 1) / (h.n_a + v.v)) AS nlp
  FROM pairs p JOIN heads h USING (head), v
)
SELECT b.doc_id, count(*) AS n_bigrams, round(avg(m.nlp), 6) AS lm_score
FROM bg b JOIN m ON b.head = m.head AND b.nxt = m.nxt
GROUP BY 1
""",
    "pack_sequences": f"""
WITH t AS (
  SELECT doc_id,
         len({_WORDS}) AS tok,
         {_sample_hash_sql("pack")} % {PACK_GROUPS} AS pack_group,
         {_sample_hash_sql("pack|order")} AS ohash
  FROM documents
),
w AS (
  SELECT *, sum(tok) OVER (
    PARTITION BY pack_group ORDER BY ohash, doc_id
    ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, CAST(pack_group AS INT) AS pack_group,
       CAST(floor((cum - tok) / {PACK_BUDGET}) AS BIGINT) AS seq_id,
       row_number() OVER (
         PARTITION BY pack_group, floor((cum - tok) / {PACK_BUDGET})
         ORDER BY ohash, doc_id) AS seq_pos
FROM w
""",
    "multimodal_payload": """
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][(doc_id % 3 + 1)::int] AS kind,
       octet_length(encode(text)) AS n_bytes,
       lower(substring(hex(encode(text)), 1, 16)) AS head_hex
FROM documents
""",
    "shard_manifest": f"""
WITH s AS (
  SELECT {_sample_hash_sql("shard")} % {N_SHARDS} AS shard_id,
         len({_WORDS}) AS n_toks, n_chars
  FROM documents
),
g AS (
  SELECT shard_id, count(*) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM s GROUP BY 1
),
t AS (SELECT sum(n_tokens) / {N_SHARDS} AS ideal FROM g)
SELECT shard_id, n_docs, n_tokens, n_chars,
       round(n_tokens / t.ideal, 6) AS load_ratio
FROM g, t
""",
    "mixture_plan": f"""
WITH c AS (
  SELECT lang, CAST(sum(len({_WORDS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM c),
w(lang, target_weight) AS (VALUES {", ".join(
    f"('{k}', {v})" for k, v in MIX_TARGETS.items()
)})
SELECT c.lang, c.n_tokens,
       round(c.n_tokens / t.total, 6) AS natural_share,
       CAST(coalesce(w.target_weight, 0.0) AS DOUBLE) AS target_weight,
       round(t.total * CAST(coalesce(w.target_weight, 0.0) AS DOUBLE)
             / c.n_tokens, 6) AS epochs
FROM c LEFT JOIN w USING (lang), t
""",
}

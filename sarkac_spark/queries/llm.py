"""LLM-training-data pipeline queries — registry aggregator.

The 70+ query implementations live in the family modules
(llm_dedup / llm_retrieval / llm_text / llm_curation, sharing
llm_common); this module star-imports them all — preserving the
pre-split import surface ``from sarkac_spark.queries.llm import
<anything>`` — and holds the driver-facing QUERIES / ORACLE dicts,
kept in their original registration order (the sweep-order
tiebreak)."""

from __future__ import annotations

from sarkac_spark.queries.llm_common import *  # noqa: F401,F403
from sarkac_spark.queries.llm_dedup import *  # noqa: F401,F403
from sarkac_spark.queries.llm_retrieval import *  # noqa: F401,F403
from sarkac_spark.queries.llm_text import *  # noqa: F401,F403
from sarkac_spark.queries.llm_curation import *  # noqa: F401,F403

QUERIES = {
    "dedup_phash": q_dedup_phash,
    "ivf_drift_trend": q_ivf_drift_trend,
    "dedup_audio": q_dedup_audio,
    "dedup_video": q_dedup_video,
    "bloom_vocab": q_bloom_vocab,
    "bpe_apply": q_bpe_apply,
    "bpe_fertility": q_bpe_fertility,
    "curation_funnel": q_curation_funnel,
    "quality_classifier": q_quality_classifier,
    "classifier_confusion": q_classifier_confusion,
    "contamination_spans": q_contamination_spans,
    "mixture_realize": q_mixture_realize,
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
    "embedding_covariance": q_embedding_covariance,
    "curation_pipeline": q_curation_pipeline,
    "dedup_minhash": q_dedup_minhash,
    "dedup_signatures": q_dedup_signatures,
    "minhash_hot_bands": q_minhash_hot_bands,
    "dedup_clusters": q_dedup_clusters,
    "cluster_split": q_cluster_split,
    "dup_ngram_frac": q_dup_ngram_frac,
    "duplicate_spans": q_duplicate_spans,
    "remove_duplicate_spans": q_remove_duplicate_spans,
    "remove_duplicate_spans_fp": q_remove_duplicate_spans_fp,
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
    "paragraph_dedup": q_paragraph_dedup,
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


# Shared by the duplicate_spans oracle and its removal consumers — ONE
# definition of "qualifying span" so they can never silently diverge
# on min_doc_df / run-merge / min-length semantics. Parameterized by
# source relation + CTE suffix so the fixed-point oracle can chain
# passes (pass 1 over documents, pass 2 over pass 1's output).


def _span_ctes(src: str, x: str = "") -> str:
    """Evidence CTEs over ``src(doc_id, text)`` ending in
    ``spans{x}(doc_id, span_start, span_words)``."""
    return f"""ws{x} AS (SELECT doc_id, {_WORDS} AS w FROM {src}),
grams{x} AS (
  SELECT doc_id, CAST(u.i AS INT) AS pos,
         substr(md5(array_to_string(
           list_slice(w, u.i + 1, u.i + {REPEAT_K}), ' ')), 1, 15) AS gh
  FROM ws{x}, UNNEST(range(0, greatest(len(w) - {REPEAT_K} + 1, 0))) AS u(i)
),
dup{x} AS (
  SELECT gh FROM grams{x} GROUP BY gh HAVING count(DISTINCT doc_id) >= 2
),
hits{x} AS (SELECT doc_id, pos FROM grams{x} JOIN dup{x} USING (gh)),
runs{x} AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits{x}
),
spans{x} AS (
  SELECT doc_id, min(pos) AS span_start,
         max(pos) - min(pos) + {REPEAT_K} AS span_words
  FROM runs{x} GROUP BY doc_id, grp
  HAVING max(pos) - min(pos) + {REPEAT_K} >= {REPEAT_MIN_WORDS}
)"""


def _span_removal_pass(src: str, x: str) -> str:
    """One full excision pass over ``src(doc_id, text)``: evidence CTEs
    plus the rebuild, ending in ``cleaned{x}(doc_id, text, n_removed)``.
    Mirrors the Spark pass-through: only spanned docs are rebuilt."""
    return f"""{_span_ctes(src, x)},
sp_docs{x} AS (SELECT DISTINCT doc_id FROM spans{x}),
covered{x} AS (
  SELECT DISTINCT doc_id, CAST(u.p AS INT) AS pos
  FROM spans{x},
       UNNEST(range(span_start, span_start + span_words)) AS u(p)
),
sel{x} AS (
  SELECT ws{x}.doc_id, CAST(u.i AS INT) AS i,
         w[CAST(u.i AS INT) + 1] AS word
  FROM ws{x} JOIN sp_docs{x} USING (doc_id),
       UNNEST(range(0, len(w))) AS u(i)
),
keep{x} AS (
  SELECT s.doc_id, s.i, s.word
  FROM sel{x} s
  LEFT JOIN covered{x} c ON s.doc_id = c.doc_id AND s.i = c.pos
  WHERE c.pos IS NULL
),
agg{x} AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS text_clean,
         count(*) AS n_kept
  FROM keep{x} GROUP BY doc_id
),
cleaned{x} AS (
  SELECT d.doc_id,
         CASE WHEN sd.doc_id IS NULL THEN d.text
              ELSE coalesce(a.text_clean, '') END AS text,
         CASE WHEN sd.doc_id IS NULL THEN 0
              ELSE len(wx.w) - coalesce(a.n_kept, 0)
         END::BIGINT AS n_removed
  FROM {src} d
  LEFT JOIN sp_docs{x} sd USING (doc_id)
  LEFT JOIN ws{x} wx USING (doc_id)
  LEFT JOIN agg{x} a USING (doc_id)
)"""


ORACLE = {
    "dedup_phash": _dedup_phash_sql(),
    "ivf_drift_trend": _ivf_drift_trend_sql(),
    "dedup_audio": _dedup_audio_sql(),
    "dedup_video": _dedup_video_sql(),
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
    "embedding_covariance": """
WITH sv AS (SELECT embedding AS s FROM embeddings ORDER BY vec_id LIMIT 1),
vs AS (SELECT embedding AS v FROM embeddings),
pairs AS (
  SELECT CAST(u.i AS INT) AS i, CAST(u2.j AS INT) AS j,
         CAST(v[CAST(u.i AS INT) + 1] AS DOUBLE)
           - CAST(s[CAST(u.i AS INT) + 1] AS DOUBLE) AS xi,
         CAST(v[CAST(u2.j AS INT) + 1] AS DOUBLE)
           - CAST(s[CAST(u2.j AS INT) + 1] AS DOUBLE) AS xj
  FROM vs, sv,
       UNNEST(range(0, len(v))) AS u(i),
       UNNEST(range(0, len(v))) AS u2(j)
  WHERE u2.j >= u.i
)
SELECT i, j,
       round((sum(xi * xj) - sum(xi) * sum(xj) / count(*)) / count(*), 6)
         + 0 AS cov
FROM pairs GROUP BY i, j
""",
    "duplicate_spans": f"""
WITH {_span_ctes("documents")}
SELECT doc_id, span_start, CAST(span_words AS INT) AS span_words
FROM spans
""",
    "remove_duplicate_spans": f"""
WITH {_span_removal_pass("documents", "0")}
SELECT doc_id, text AS text_clean, n_removed FROM cleaned0
""",
    # chained passes are exact: a pass over an already-fixed corpus
    # removes nothing, so SQL unrolled to max_iters always equals the
    # early-breaking Spark loop at the same max_iters
    "remove_duplicate_spans_fp": f"""
WITH {_span_removal_pass("documents", "0")},
{_span_removal_pass("cleaned0", "1")}
SELECT c1.doc_id, c1.text AS text_clean,
       (c0.n_removed + c1.n_removed)::BIGINT AS n_removed
FROM cleaned1 c1 JOIN cleaned0 c0 USING (doc_id)
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
    # structural-boundary variant of span_dedup: RE2's '\\n{{2,}}'
    # pattern-escape matches Java's on the Spark side; the joiner is
    # built from chr(10) because a DuckDB plain string literal does
    # NOT interpret backslash escapes
    "paragraph_dedup": """
WITH segs AS (
  SELECT doc_id,
         CASE WHEN len(psf) = 0 THEN [''] ELSE psf END AS ps
  FROM (
    SELECT doc_id,
           list_filter(
             list_transform(string_split_regex(text, '\\n{2,}'),
                            s -> trim(s)),
             s -> s <> '') AS psf
    FROM documents
  )
),
spans AS (
  SELECT doc_id, CAST(u.i AS INT) AS pos, ps[CAST(u.i AS INT) + 1] AS span
  FROM segs, UNNEST(range(0, len(ps))) AS u(i)
),
first AS (
  SELECT doc_id, pos, span, row_number() OVER (
    PARTITION BY substr(md5(span), 1, 15) ORDER BY doc_id, pos) AS rn
  FROM spans
),
totals AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1),
rebuilt AS (
  SELECT doc_id,
         string_agg(span, chr(10) || chr(10) ORDER BY pos) AS text_dedup,
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

# Pytest-only iterative-fit surface (see sarkac_spark.queries.fit_queries):
# the BPE merge-training loop is a driver-side vocab-capped iteration with
# no SQL-expressible oracle; its apply/fertility/merge stages ARE
# registered with oracles (bpe_apply / bpe_fertility / bpe_merges).
FIT_QUERIES = {
    "bpe_tokenize": q_bpe_tokenize,
}

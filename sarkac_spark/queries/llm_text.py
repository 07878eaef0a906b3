"""Text-analysis-family queries (split from llm.py): token/quality
stats, language ID, TF-IDF, n-gram LMs, repetition/Gopher filters, PII,
sketches (CMS/HLL/Bloom/histogram), BPE (merges/apply/fertility), Zipf,
chunking, and multimodal payload plumbing. See llm_common for shared
constants; the QUERIES/ORACLE registry lives in llm.py."""

from __future__ import annotations

from sarkac_spark.queries.llm_common import *  # noqa: F401,F403
from sarkac_spark.plans.audit import lazy_checkpoint

__all__ = [
    "q_doc_lm_score",
    "q_vocab_coverage",
    "q_token_stats",
    "q_quality_score",
    "q_lang_id",
    "q_multimodal_payload",
    "q_tfidf_terms",
    "q_inverted_index",
    "q_length_deciles",
    "q_top_terms",
    "q_bigram_lm",
    "q_lang_jaccard",
    "q_chunk_documents",
    "q_repetition_filter",
    "q_profile_documents",
    "q_pii_redaction",
    "q_unigram_kl",
    "q_cms_term_counts",
    "_cms_term_counts_sql",
    "q_hll_distinct",
    "_hll_distinct_sql",
    "_bloom_vocab_sql",
    "_hll_est_cte",
    "_corpus_overlap_sql",
    "q_hist_quantiles",
    "_hist_quantiles_sql",
    "_lang_shingles",
    "q_bloom_vocab",
    "q_corpus_overlap",
    "q_bpe_merges",
    "q_zipf_fit",
    "q_bpe_tokenize",
    "q_bpe_fertility",
    "_bpe_fertility_sql",
    "q_bpe_apply",
    "_lang_id_sql",
    "_tfidf_sql",
    "_inverted_index_sql",
    "_length_deciles_sql",
    "_top_terms_sql",
    "_bigram_lm_sql",
    "_chunk_documents_sql",
    "_repetition_filter_sql",
    "_profile_documents_sql",
    "_pii_redaction_sql",
    "_unigram_kl_sql",
    "_bpe_merges_sql",
    "_zipf_fit_sql",
]

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


def q_tfidf_terms(spark, sf_dir):
    """Top-3 characteristic terms per doc by smoothed TF-IDF."""
    from sarkac_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k=3)


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


def q_bigram_lm(spark, sf_dir):
    """Top-3 next-word transitions per frequent head word."""
    from sarkac_spark.operators.text import bigram_transitions

    return bigram_transitions(
        _docs(spark, sf_dir), min_head_count=BIGRAM_MIN_HEAD, k=3
    )


def q_lang_jaccard(spark, sf_dir):
    """Corpus-pair lexical overlap: Jaccard of distinct-unigram
    vocabularies for every language pair — the cross-lingual
    contamination / source-merge audit view."""
    from sarkac_spark.operators.text import group_vocab_jaccard

    return group_vocab_jaccard(_docs(spark, sf_dir), "lang", "text")


def q_chunk_documents(spark, sf_dir):
    """Context-window prep: fixed word-budget chunks with overlap,
    map-only (sequence + slice + one explode)."""
    from sarkac_spark.operators.text import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir),
        chunk_words=CHUNK_WORDS,
        overlap=CHUNK_OVERLAP,
    )


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


def q_unigram_kl(spark, sf_dir):
    """Per-source unigram-distribution drift vs the corpus mixture:
    KL(P_source || P_corpus) from exact token counts."""
    from sarkac_spark.operators.text import unigram_kl

    return unigram_kl(_docs(spark, sf_dir), "source", "text")


def q_cms_term_counts(spark, sf_dir):
    """Count-min-sketch audit: estimate the corpus's top-20 term counts
    from a 4x1024 sketch and report the one-sided error against the
    exact counts — the bounded-memory heavy-hitter primitive (sketch
    size is fixed whatever the corpus size; the exact side exists here
    as the audit baseline)."""
    from sarkac_spark.operators.dedup import words_col
    from sarkac_spark.operators.sketch import cms_estimate, count_min_sketch

    # barrier the (term, count) AGGREGATE, not the token occurrence
    # list (r12 wave 4): both consumers derive from it exactly — the
    # exact side IS the aggregate, and a count-weighted sketch build
    # (`weight_col`) sums the same per-bucket totals as exploding every
    # occurrence (sum over occurrences of 1 == sum over terms of cnt).
    # The materialized relation shrinks from corpus-sized to
    # vocab-sized, the explode runs once, and the cms hashing runs per
    # distinct term instead of per occurrence. 0.56x measured; ``top``
    # still barriers (feeds the probe leg AND the final join).
    counts = (
        _docs(spark, sf_dir)
        .select(F.explode(words_col("text")).alias("term"))
        .select(F.lower(F.col("term")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .transform(lazy_checkpoint)
    )
    top = (
        counts.orderBy(F.col("true_count").desc(), "term")
        .limit(CMS_TOP)
        .transform(lazy_checkpoint)
    )
    sk = count_min_sketch(
        counts, "term", depth=CMS_DEPTH, width=CMS_WIDTH, weight_col="true_count"
    )
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


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog cardinality audit: md5-HLL distinct-words-per-language
    estimate vs the exact count, with relative error — the bounded-memory
    distinct primitive (1024 registers whatever the corpus; the exact
    side exists here as the audit baseline)."""
    from sarkac_spark.operators.dedup import words_col
    from sarkac_spark.operators.sketch import hll_distinct

    # barrier the DISTINCT (lang, term) set, not the token occurrence
    # list (r12 wave 4): both consumers are duplicate-invariant —
    # countDistinct over occurrences == count over the deduped set, and
    # HLL registers keep a per-register MAX, which repeated terms
    # cannot move. The materialized relation shrinks from corpus-sized
    # to per-lang-vocab-sized and the register hashing runs per
    # distinct term. 0.56x measured, result-identical.
    toks = (
        _docs(spark, sf_dir)
        .select("lang", F.explode(words_col("text")).alias("w"))
        .select("lang", F.lower(F.col("w")).alias("term"))
        .distinct()
        .transform(lazy_checkpoint)
    )
    exact = toks.groupBy("lang").agg(F.count(F.lit(1)).alias("true_distinct"))
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


def _lang_shingles(spark, sf_dir):
    from sarkac_spark.operators.dedup import shingles

    # NO barrier here (r12 wave 4): the two consumers split this
    # relation into COMPLEMENTARY lang sides, so without a barrier the
    # lang predicate pushes into the parquet scan and each side's
    # explode prunes to its own partition — one full corpus of explode
    # work total. A barrier here materialized the corpus-sized
    # occurrence relation (larger than the input) AND swallowed the
    # pushdown; the multiply-referenced relations are the per-side
    # DISTINCT shingle sets (vocab-sized), barriered in the consumers.
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
    # corpus feeds the bloom build AND the exact `seen` audit join
    corpus = (
        sh.filter(F.col("lang") != "en")
        .select("shingle")
        .distinct()
        .transform(lazy_checkpoint)
    )
    probes = sh.filter(F.col("lang") == "en").select("shingle").distinct()
    bloom = bloom_build(corpus, "shingle", m_bits=BLOOM_M, k_hashes=BLOOM_K)
    flags = bloom_might_contain(bloom, probes, "shingle", BLOOM_M, BLOOM_K)
    seen = corpus.select(F.col("shingle"), F.lit(1).alias("__seen"))
    return flags.join(seen, "shingle", "left").select(
        "shingle",
        F.col("might_contain").cast("long").alias("maybe_seen"),
        F.coalesce(F.col("__seen"), F.lit(0)).cast("long").alias("true_seen"),
    )


def q_corpus_overlap(spark, sf_dir):
    """Inclusion-exclusion overlap estimate over HLL registers:
    |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B) with the union estimated
    from MAX-MERGED registers (no re-scan of the union) — the cheap
    contamination pre-check before an exact decontamination pass, here
    audited against the exact overlap (EN shingle set vs non-EN
    shingle set)."""
    from sarkac_spark.operators.sketch import hll_overlap

    sh = _lang_shingles(spark, sf_dir)
    # each side feeds the HLL estimate AND the exact-overlap audit.
    # Barrier the DISTINCT sets, not the occurrence lists (r12 wave 4):
    # HLL registers are duplicate-invariant (per-register max of rho, so
    # repeated shingles can't move any register) and the exact overlap
    # is a distinct-set join — both consumers are therefore identical on
    # the deduped relation, which is vocab-sized where the occurrence
    # list is corpus-sized. Result-identical, oracle-verified.
    a = (
        sh.filter(F.col("lang") == "en")
        .select("shingle")
        .distinct()
        .transform(lazy_checkpoint)
    )
    b = (
        sh.filter(F.col("lang") != "en")
        .select("shingle")
        .distinct()
        .transform(lazy_checkpoint)
    )
    est = hll_overlap(a, b, "shingle", b=OVERLAP_B)
    true = a.join(b, "shingle").agg(F.count(F.lit(1)).alias("true_overlap"))
    return est.crossJoin(F.broadcast(true))


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

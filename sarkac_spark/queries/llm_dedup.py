"""Dedup-family queries (split from llm.py): exact / MinHash+LSH /
SimHash / n-gram-Jaccard / winnowing / span / semantic dedup, dedup
clustering, contamination, and the incremental signature-store arms —
each with its generated DuckDB oracle. See llm_common for the shared
constants and CTE builders; the QUERIES/ORACLE registry lives in
llm.py."""

from __future__ import annotations

from sarkac_spark.queries.llm_common import *  # noqa: F401,F403
from sarkac_spark.plans.audit import lazy_checkpoint

__all__ = [
    "q_dedup_exact",
    "q_dedup_signatures",
    "_dedup_signatures_sql",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_hot_spans",
    "q_span_dedup",
    "q_paragraph_dedup",
    "q_ngram_jaccard",
    "q_decontamination",
    "q_semantic_dedup",
    "q_incremental_dedup",
    "q_incremental_minhash",
    "_incremental_dedup_sql",
    "_incremental_minhash_sql",
    "q_minhash_hot_bands",
    "_minhash_hot_bands_sql",
    "q_minhash_recall",
    "_minhash_recall_sql",
    "q_winnow_pairs",
    "_winnow_pairs_sql",
    "q_dedup_clusters",
    "q_dedup_canonical",
    "q_cluster_split",
    "q_dup_ngram_frac",
    "q_duplicate_spans",
    "q_remove_duplicate_spans",
    "q_remove_duplicate_spans_fp",
    "q_contamination_spans",
    "_minhash_sql",
    "_ngram_jaccard_sql",
    "_simhash_sql",
    "_dedup_clusters_sql",
    "_dedup_canonical_sql",
    "_cluster_split_sql",
    "_decontamination_sql",
    "_semantic_dedup_sql",
    "_contamination_spans_sql",
    "q_dedup_phash",
    "_dedup_phash_sql",
    "_synth_pnm_media",
    "PHASH_W",
    "PHASH_H",
    "PHASH_MOD",
    "PHASH_NOISE",
    "PHASH_BRIGHT",
    "PHASH_MAX_HAMMING",
    "q_dedup_audio",
    "_dedup_audio_sql",
    "_synth_wav_media",
    "AFP_N_SAMPLES",
    "AFP_AMP",
    "AFP_NOISE",
    "AFP_MAX_HAMMING",
    "q_dedup_video",
    "_dedup_video_sql",
    "_synth_video_frames",
    "VID_FRAMES",
]

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
-- count distinct HASHED values, not distinct shingle strings: Spark's
-- sh_set is collect_set(h60), so both engines must count the same
-- 60-bit image of the shingle set (collisions shrink both alike).
sizes AS (
  SELECT doc_id,
         CAST(count(DISTINCT ('0x' || substr(md5(shingle), 1, 15))::bigint)
              AS BIGINT) AS n_sh
  FROM sh GROUP BY 1
)
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


def q_paragraph_dedup(spark, sf_dir):
    """span_dedup in its real-deployment shape: structural-boundary
    segments (blank-line paragraphs) instead of fixed word windows —
    the splitter that catches whole boilerplate paragraphs (headers,
    license blocks, navigation chrome) as units. Corpus docs without
    boundaries degenerate to whole-doc exact dedup, which is precisely
    the semantics: one segment, first occurrence kept."""
    from sarkac_spark.operators.dedup import span_dedup

    return span_dedup(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        boundary=r"\n{2,}",
        joiner="\n\n",
    )


def q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        threshold=JACCARD_THRESHOLD,
        max_df=NGRAM_MAX_DF,
    )


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
        _h60,
        _minhash_aggs,
        minhash_lsh_candidates,
        ngram_jaccard_pairs_from_shingles,
        shingles,
    )

    d = _docs(spark, sf_dir)
    # both arms (exact truth + minhash sketch) start from the SAME
    # shingle explode; materialize it once (r12: the two arms plus
    # their internal legs re-scanned the corpus 24x at runtime)
    sh_raw = shingles(d, "doc_id", "text", 3).transform(lazy_checkpoint)
    truth = ngram_jaccard_pairs_from_shingles(
        sh_raw, "doc_id", threshold=JACCARD_THRESHOLD, max_df=NGRAM_MAX_DF
    ).select("id_a", "id_b")
    sigs = (
        sh_raw.select(
            F.col("doc_id"), (_h60(F.col("shingle")) % MINHASH_P).alias("h")
        )
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


def q_dup_ngram_frac(spark, sf_dir):
    """RefinedWeb-style partial-duplication audit: per doc, the share
    of its 3-gram occurrences whose 3-gram appears in >= 2 documents —
    catches templated/boilerplate-heavy docs that doc-level dedup and
    within-doc repetition features both miss."""
    from sarkac_spark.operators.dedup import dup_ngram_fraction

    return dup_ngram_fraction(
        _docs(spark, sf_dir), "doc_id", "text", n=DUP_NGRAM_N, min_df=DUP_NGRAM_MIN_DF
    )


def q_duplicate_spans(spark, sf_dir):
    """Maximal cross-corpus duplicated substrings (the exact-substring-
    dedup evidence pass): consecutive rolling 5-grams shared by >= 2
    distinct docs merge into maximal runs; runs of >= 12 words are the
    verbatim regions a removal/masking pass would cut. Word-indexed
    (doc_id, span_start, span_words)."""
    from sarkac_spark.operators.dedup import duplicate_spans

    return duplicate_spans(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=REPEAT_K,
        min_words=REPEAT_MIN_WORDS,
    )


def q_remove_duplicate_spans(spark, sf_dir):
    """The removal consumer of ``duplicate_spans``: cut every word
    position covered by a qualifying verbatim cross-corpus span and
    re-emit the cleaned corpus as (doc_id, text_clean, n_removed) —
    Lee-et-al exact-substring dedup, applied rather than reported."""
    from sarkac_spark.operators.dedup import remove_duplicate_spans

    return remove_duplicate_spans(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=REPEAT_K,
        min_words=REPEAT_MIN_WORDS,
    )


def q_remove_duplicate_spans_fp(spark, sf_dir):
    """``remove_duplicate_spans`` iterated to a fixed point (full Lee
    et al. discipline): excision can butt words into NEW qualifying
    cross-doc runs, so repeat until a pass removes nothing. Registered
    at max_iters=2 — exact vs the 2-pass unrolled oracle whether or
    not the corpus converges in one pass (a pass over a fixed corpus
    is a no-op on both engines)."""
    from sarkac_spark.operators.dedup import remove_duplicate_spans_fp

    return remove_duplicate_spans_fp(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=REPEAT_K,
        min_words=REPEAT_MIN_WORDS,
        max_iters=2,
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


# --- multimodal dedup members (image / audio / video) -------------------------
#
# Shared deterministic-corpus contract: payloads (PNM pixels, WAV
# samples, video frames) derive from doc_id by PURE INTEGER arithmetic
# through one avalanche hash, so the DuckDB oracle recomputes the raw
# values (it cannot decode bytes) while Spark runs the REAL decode path
# (Arrow mapInPandas) — the hash gate covers the entire decode+hash
# implementation bit-for-bit. Each ODD doc is its EVEN neighbor (scene
# a = doc_id // 2) under the invariances the fingerprint must deliver
# (brightness/volume x integer upscaling/resampling, one moved noise
# element). The mixing MUST be an avalanche (multiply-xorshift) —
# anything with residual linear structure makes distinct scenes
# hash-NEAR and incidental pairs grow superlinearly with the corpus
# (simulated: this mix gives 0 incidental pairs at 20k docs with 100%
# planted recall).

PHASH_W, PHASH_H = 27, 24  # divisible by the 9x8 dHash grid
PHASH_MOD = 151
PHASH_NOISE = 40
PHASH_BRIGHT = 50
PHASH_MAX_HAMMING = 6
AFP_N_SAMPLES = 1300  # 65 frames x 20 samples (divisible -> equal frames)
AFP_AMP = 8190        # base amplitude; x2 volume stays inside int16
AFP_NOISE = 4000
AFP_MAX_HAMMING = 6
VID_FRAMES = 3


def _avalanche_np(key):
    """The shared multiply-xorshift mix, numpy side (int64 keys >= 0;
    every operand stays under 2^62). Mirrored textually by
    ``_avalanche_cte``."""
    import numpy as np

    h = (key * 2654435761) % 2147483648
    h = np.bitwise_xor(h, h // 65536)
    h = (h * 1103515245) % 2147483648
    return np.bitwise_xor(h, h // 2048)


def _avalanche_cte(key_expr: str, carry: str, src: str) -> str:
    """h1/h2 CTEs ending with column ``h``; the final mixed value is
    ``xor(h, h // 2048)`` at the caller's use site. One source of truth
    for the oracle side of ``_avalanche_np``."""
    return f"""h1 AS (
  SELECT {carry}, (({key_expr}) * 2654435761) % 2147483648 AS h
  FROM {src}
),
h2 AS (SELECT {carry}, (xor(h, h // 65536) * 1103515245) % 2147483648 AS h
       FROM h1)"""


def _banded_hamming_sql(band_idx: str, band_group: str, max_hamming) -> str:
    """The shared oracle TAIL over a ``bits`` CTE of (doc_id, [dims,]
    k, bit): 16-bit band packing (band index expression per modality —
    frame-major for video), the df-capped band join, and the XOR
    bit-count Hamming verify. Mirrors operators/multimodal.py
    ``pack_band_values`` + ``dedup_phash`` exactly."""
    return f"""bands0 AS (
  SELECT doc_id,
         ({band_idx})::varchar || '|' ||
           CAST(sum(bit * (CAST(1 AS BIGINT) << (k % 16))) AS BIGINT)::varchar
           AS band_key,
         {band_idx} AS band_idx,
         CAST(sum(bit * (CAST(1 AS BIGINT) << (k % 16))) AS BIGINT) AS band_val
  FROM bits GROUP BY {band_group}
),
bands AS (
  SELECT doc_id, band_key, band_idx, band_val FROM (
    SELECT doc_id, band_key, band_idx, band_val,
           count(*) OVER (PARTITION BY band_key) AS bdf
    FROM bands0
  ) WHERE bdf <= {MINHASH_MAX_BAND_DF}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
ham AS (
  SELECT c.id_a, c.id_b,
         CAST(sum(bit_count(xor(x.band_val, y.band_val))) AS BIGINT) AS hamming
  FROM cand c
  JOIN bands0 x ON x.doc_id = c.id_a
  JOIN bands0 y ON y.doc_id = c.id_b AND y.band_idx = x.band_idx
  GROUP BY 1, 2
)
SELECT id_a, id_b, hamming FROM ham WHERE hamming <= {max_hamming}"""


def _synth_pnm_media(docs):
    """doc ids -> (media_id, payload): P5 images whose pixels avalanche-
    hash from (scene, pixel index); odd docs +PHASH_BRIGHT and 2x
    pixel-replicated, noise pixel moved."""
    import numpy as np
    import pandas as pd

    n_px = PHASH_W * PHASH_H

    def run(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                a = doc_id // 2
                i = np.arange(n_px, dtype=np.int64)
                flat = (_avalanche_np(a * n_px + i + 1) % PHASH_MOD).copy()
                flat[(doc_id * 31) % n_px] += PHASH_NOISE
                img = flat.reshape(PHASH_H, PHASH_W)
                if doc_id % 2:
                    img = np.kron(
                        img + PHASH_BRIGHT, np.ones((2, 2), dtype=np.int64)
                    )
                h, w = img.shape
                payloads.append(
                    b"P5\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        run, schema="media_id long, payload binary"
    )


def q_dedup_phash(spark, sf_dir):
    """Image near-dup pairs via dHash + LSH banding — the image member
    of the multimodal dedup family. Synthesizes a deterministic PNM
    corpus from doc ids (planted resized/brightness-shifted near-dup
    per even/odd pair), hashes through the REAL decode path
    (``image_dhash``: Arrow mapInPandas), then bands and
    Hamming-verifies JVM-side (``dedup_phash``, band-df-capped)."""
    from sarkac_spark.operators.multimodal import dedup_phash, image_dhash

    media = _synth_pnm_media(_docs(spark, sf_dir))
    return dedup_phash(
        image_dhash(media),
        max_hamming=PHASH_MAX_HAMMING,
        max_band_df=MINHASH_MAX_BAND_DF,
    ).select("id_a", "id_b", "hamming")


def _dedup_phash_sql() -> str:
    """Arithmetic mirror: recompute the synthetic pixels from doc_id
    (base image only — brightness and 2x replication provably cancel in
    the sum-comparisons), block sums on the 8x9 grid, then the shared
    banding/Hamming tail."""
    n_px = PHASH_W * PHASH_H
    return f"""
WITH g AS (
  SELECT doc_id, doc_id // 2 AS a, (doc_id * 31) % {n_px} AS np
  FROM documents
),
{_avalanche_cte(f"a * {n_px} + i + 1", "doc_id, np, i",
                f"g, (SELECT unnest(range({n_px})) AS i)")},
px AS (
  SELECT doc_id,
         (i // {PHASH_W}) // {PHASH_H // 8} AS gr,
         (i % {PHASH_W}) // {PHASH_W // 9} AS gc,
         xor(h, h // 2048) % {PHASH_MOD}
           + CASE WHEN i = np THEN {PHASH_NOISE} ELSE 0 END AS v
  FROM h2
),
cell AS (SELECT doc_id, gr, gc, sum(v) AS s FROM px GROUP BY 1, 2, 3),
bits AS (
  SELECT l.doc_id, l.gr * 8 + l.gc AS k,
         CASE WHEN l.s < rr.s THEN 1 ELSE 0 END AS bit
  FROM cell l
  JOIN cell rr ON rr.doc_id = l.doc_id AND rr.gr = l.gr AND rr.gc = l.gc + 1
  WHERE l.gc < 8
),
{_banded_hamming_sql("k // 16", "doc_id, k // 16", PHASH_MAX_HAMMING)}
"""


def _synth_wav_media(docs):
    """doc ids -> (media_id, payload): 16-bit PCM WAVs whose samples
    avalanche-hash from (scene, sample index); odd docs at DOUBLE
    volume, 2x sample-duplicated, noise sample moved."""
    import numpy as np
    import pandas as pd

    from sarkac_spark.operators.multimodal import wav_bytes

    def run(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                a = doc_id // 2
                i = np.arange(AFP_N_SAMPLES, dtype=np.int64)
                s = (
                    _avalanche_np(a * AFP_N_SAMPLES + i + 1)
                    % (2 * AFP_AMP + 1)
                    - AFP_AMP
                ).copy()
                s[(doc_id * 31) % AFP_N_SAMPLES] = AFP_NOISE
                if doc_id % 2:
                    s = np.repeat(s * 2, 2)
                payloads.append(wav_bytes(s))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        run, schema="media_id long, payload binary"
    )


def q_dedup_audio(spark, sf_dir):
    """Audio near-dup pairs via frame-energy fingerprints + the SAME
    banded LSH pairing as images (``dedup_phash`` over
    ``audio_fingerprint`` output) — the audio member of the multimodal
    dedup family, through the REAL WAV decode path (Arrow
    mapInPandas)."""
    from sarkac_spark.operators.multimodal import audio_fingerprint, dedup_phash

    media = _synth_wav_media(_docs(spark, sf_dir))
    return dedup_phash(
        audio_fingerprint(media),
        max_hamming=AFP_MAX_HAMMING,
        max_band_df=MINHASH_MAX_BAND_DF,
    ).select("id_a", "id_b", "hamming")


def _dedup_audio_sql() -> str:
    """Arithmetic mirror: INTEGER frame energies from the synthetic
    sample formula (base waveform only — volume x2 and duplication
    provably cancel in equal-frame comparisons; decode_wav's /32768 is
    an exact power-of-two scale, so double comparisons equal the
    integer ones), then the shared banding/Hamming tail."""
    frame = AFP_N_SAMPLES // 65
    return f"""
WITH g AS (
  SELECT doc_id, doc_id // 2 AS a, (doc_id * 31) % {AFP_N_SAMPLES} AS np
  FROM documents
),
{_avalanche_cte(f"a * {AFP_N_SAMPLES} + i + 1", "doc_id, np, i",
                f"g, (SELECT unnest(range({AFP_N_SAMPLES})) AS i)")},
sv AS (
  SELECT doc_id, i // {frame} AS f,
         CASE WHEN i = np THEN {AFP_NOISE}
              ELSE xor(h, h // 2048) % {2 * AFP_AMP + 1} - {AFP_AMP} END AS s
  FROM h2
),
fe AS (SELECT doc_id, f, sum(s * s) AS e FROM sv GROUP BY 1, 2),
bits AS (
  SELECT l.doc_id, l.f AS k,
         CASE WHEN l.e < rr.e THEN 1 ELSE 0 END AS bit
  FROM fe l JOIN fe rr ON rr.doc_id = l.doc_id AND rr.f = l.f + 1
  WHERE l.f < 64
),
{_banded_hamming_sql("k // 16", "doc_id, k // 16", AFP_MAX_HAMMING)}
"""


def _synth_video_frames(docs):
    """doc ids -> (media_id, frame_idx, payload): VID_FRAMES P5 frames
    per doc, pixels avalanche-hashed from (scene, frame, pixel index);
    odd docs brightness-shifted + 2x upscaled per frame, per-frame
    noise pixel moved."""
    import numpy as np
    import pandas as pd

    n_px = PHASH_W * PHASH_H

    def run(batches):
        for pdf in batches:
            mids, fidxs, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                a = doc_id // 2
                for fr in range(VID_FRAMES):
                    i = np.arange(n_px, dtype=np.int64)
                    flat = (
                        _avalanche_np((a * VID_FRAMES + fr) * n_px + i + 1)
                        % PHASH_MOD
                    ).copy()
                    flat[(doc_id * 31 + fr * 97) % n_px] += PHASH_NOISE
                    img = flat.reshape(PHASH_H, PHASH_W)
                    if doc_id % 2:
                        img = np.kron(
                            img + PHASH_BRIGHT, np.ones((2, 2), dtype=np.int64)
                        )
                    hgt, wid = img.shape
                    payloads.append(
                        b"P5\n%d %d\n255\n" % (wid, hgt)
                        + img.astype("uint8").tobytes()
                    )
                    mids.append(doc_id)
                    fidxs.append(fr)
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": fidxs, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        run, schema="media_id long, frame_idx int, payload binary"
    )


def q_dedup_video(spark, sf_dir):
    """Video near-dup pairs: frame-sampled dHash sequences through the
    REAL per-frame PNM decode (Arrow mapInPandas), concatenated in
    frame order, paired by the SAME banded machinery as images/audio
    (``dedup_phash`` — band indexes are frame-major, so Hamming bounds
    the total bit distance across all sampled frames)."""
    from sarkac_spark.operators.multimodal import dedup_phash, video_fingerprint

    frames = _synth_video_frames(_docs(spark, sf_dir))
    return dedup_phash(
        video_fingerprint(frames),
        max_hamming=PHASH_MAX_HAMMING * VID_FRAMES,
        max_band_df=MINHASH_MAX_BAND_DF,
    ).select("id_a", "id_b", "hamming")


def _dedup_video_sql() -> str:
    """Arithmetic mirror: the dedup_phash pixel/grid/bit CTEs with a
    frame dimension; band_idx = frame * 4 + chunk (the frame-major
    concatenation order), then the shared banding/Hamming tail."""
    n_px = PHASH_W * PHASH_H
    return f"""
WITH g AS (
  SELECT doc_id, doc_id // 2 AS a FROM documents
),
fr AS (SELECT unnest(range({VID_FRAMES})) AS fr),
{_avalanche_cte(f"(a * {VID_FRAMES} + fr) * {n_px} + i + 1",
                f"doc_id, fr, (doc_id * 31 + fr * 97) % {n_px} AS np, i",
                f"g, fr, (SELECT unnest(range({n_px})) AS i)")},
px AS (
  SELECT doc_id, fr,
         (i // {PHASH_W}) // {PHASH_H // 8} AS gr,
         (i % {PHASH_W}) // {PHASH_W // 9} AS gc,
         xor(h, h // 2048) % {PHASH_MOD}
           + CASE WHEN i = np THEN {PHASH_NOISE} ELSE 0 END AS v
  FROM h2
),
cell AS (SELECT doc_id, fr, gr, gc, sum(v) AS s FROM px GROUP BY 1, 2, 3, 4),
bits AS (
  SELECT l.doc_id, l.fr, l.gr * 8 + l.gc AS k,
         CASE WHEN l.s < rr.s THEN 1 ELSE 0 END AS bit
  FROM cell l
  JOIN cell rr ON rr.doc_id = l.doc_id AND rr.fr = l.fr
              AND rr.gr = l.gr AND rr.gc = l.gc + 1
  WHERE l.gc < 8
),
{_banded_hamming_sql("fr * 4 + k // 16", "doc_id, fr, k // 16",
                     f"{PHASH_MAX_HAMMING} * {VID_FRAMES}")}
"""

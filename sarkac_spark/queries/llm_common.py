"""Shared foundation for the LLM-pipeline query families
(llm_dedup / llm_retrieval / llm_text / llm_curation): the engine
constants (one source of truth for k/bands/thresholds mirrored into
every generated DuckDB oracle), the table loaders, and the SQL CTE
builders used across families. ``__all__`` deliberately includes
underscore names — the family modules and the ``llm`` aggregator pull
the whole namespace via star-import, keeping
``sarkac_spark.queries.llm`` import-compatible with the pre-split
single file."""

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

__all__ = [
    "DataFrame",
    "SparkSession",
    "F",
    "_LCG_A",
    "_LCG_B",
    "MINHASH_MAX_BAND_DF",
    "MINHASH_P",
    "SIMHASH_BITS",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "ngram_jaccard_pairs",
    "bpe_apply_sql",
    "cosine",
    "cosine_topk",
    "ivf_topk",
    "lsh_topk",
    "STOPWORDS",
    "bpe_ish_token_count",
    "doc_fingerprint",
    "lang_id",
    "quality_score",
    "token_count",
    "load_table",
    "MINHASH_K",
    "MINHASH_BANDS",
    "JACCARD_THRESHOLD",
    "SIMHASH_MAX_HAMMING",
    "EMB_NEARDUP_THRESHOLD",
    "TOPK",
    "N_QUERIES",
    "N_CENTROIDS",
    "LSH_BITS",
    "LSH_TABLES",
    "EMB_DIM",
    "_docs",
    "_embs",
    "NGRAM_MAX_DF",
    "SPAN_WORDS",
    "TEMP_ALPHA",
    "VOCAB_TOP_K",
    "PACK_BUDGET",
    "PACK_GROUPS",
    "HOT_SPANS_TOP_K",
    "IVF_NPROBE",
    "SAMPLE_RATES",
    "SAMPLE_DEFAULT_RATE",
    "EVAL_RATE",
    "QUALITY_CUTOFF",
    "DECONTAM_MIN_SHARED",
    "DECONTAM_MAX_TRAIN_DF",
    "SPAN_MIN_RUN",
    "BIGRAM_MIN_HEAD",
    "PER_LANG_BUDGET",
    "DOMAIN_CAP",
    "CHUNK_WORDS",
    "CHUNK_OVERLAP",
    "REP_TOP_BIGRAM_FRAC",
    "REP_MIN_DISTINCT_WORD_FRAC",
    "SEMDEDUP_BITS",
    "SEMDEDUP_TAU",
    "CMS_DEPTH",
    "CMS_WIDTH",
    "CMS_TOP",
    "_capped_bands_cte",
    "HARDNEG_K",
    "HARDNEG_LO",
    "HARDNEG_HI",
    "WSAMPLE_N",
    "WINNOW_K",
    "WINNOW_W",
    "WINNOW_MIN_SHARED",
    "HLL_B",
    "HIST_K",
    "MIX_WEIGHTS",
    "DUP_NGRAM_N",
    "DUP_NGRAM_MIN_DF",
    "REPEAT_K",
    "REPEAT_MIN_WORDS",
    "SNAP_ADD_CUTOFF",
    "SNAP_DEL_CUTOFF",
    "SNAP_EDIT_CUTOFF",
    "BPE_TOPK",
    "ZIPF_TOPK",
    "BLOOM_M",
    "BLOOM_K",
    "OVERLAP_B",
    "N_SHARDS",
    "MIX_TARGETS",
    "PQ_SHORTLIST",
    "_WORDS",
    "_SHINGLES_CTE",
    "_LANG_SHINGLES_CTE",
    "_COS",
    "_sample_hash_sql",
    "_DOC_COLUMNS",
]

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


HOT_SPANS_TOP_K = 20


IVF_NPROBE = 2  # the multi-probe recall lever, oracle-mirrored


# stratified-sampling contract: downsample dominant en, light trim on
# the rest, half-rate for unknown strata; 10% eval split
SAMPLE_RATES = {"en": 0.3, "zh": 0.9, "es": 0.9, "de": 0.9, "fr": 0.9}


SAMPLE_DEFAULT_RATE = 0.5


EVAL_RATE = 0.1


QUALITY_CUTOFF = 0.65  # ~median of the synthetic corpus — non-trivial


# decontamination contract: a (eval, train) pair is contaminated when it
# shares >= 3 distinct trigram shingles (1-2 shared trigrams is phrase-
# level coincidence in this corpus; the planted near-dup groups share 20+)
DECONTAM_MIN_SHARED = 3


DECONTAM_MAX_TRAIN_DF = 256  # boilerplate-shingle cap, mirrored in oracle


SPAN_MIN_RUN = 2  # contamination_spans: >= 2 consecutive matching 3-grams


BIGRAM_MIN_HEAD = 20


PER_LANG_BUDGET = 30


DOMAIN_CAP = 10


CHUNK_WORDS = 40


CHUNK_OVERLAP = 8


# repetition contract, tuned to the synthetic small-vocab corpus (median
# distinct_word_frac ~0.46): flags ~22% at sf0.01
REP_TOP_BIGRAM_FRAC = 0.1


REP_MIN_DISTINCT_WORD_FRAC = 0.35


# SemDeDup bucketing: 4 hyperplane bits => 16 deterministic "clusters" at
# test scale (real corpora run 14+ bits). The synthetic embeddings have no
# true near-dups (max within-bucket cosine ~0.45 at sf0.01), so tau sits at
# the ~99th percentile of the within-bucket pair distribution to exercise
# the drop path with a non-trivial kept/dropped split.
SEMDEDUP_BITS = 4


SEMDEDUP_TAU = 0.3


CMS_DEPTH, CMS_WIDTH, CMS_TOP = 4, 1024, 20


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


HARDNEG_K = 5


HARDNEG_LO, HARDNEG_HI = 0.2, 0.45  # hi = the near-dup/positive threshold


WSAMPLE_N = 15


WINNOW_K = 3   # word k-grams


WINNOW_W = 4   # winnowing window (hashes) — catches shared runs >= 6 words


WINNOW_MIN_SHARED = 2


HLL_B = 10  # 2^10 = 1024 registers => ~3.2% relative error


HIST_K = 64  # bins — error bound is one bin width = (max-min)/64


# corpus-mix contract: oversample src0/src1, trim src2, pass the rest
MIX_WEIGHTS = {"src0": 2.5, "src1": 2.0, "src2": 0.4}


DUP_NGRAM_N = 3


DUP_NGRAM_MIN_DF = 2


# duplicate_spans (maximal duplicated-run merge): rolling-gram width and
# the minimum merged-run length worth reporting (in words)
REPEAT_K = 5


REPEAT_MIN_WORDS = 12


# snapshot-diff fixture: old/new corpus snapshots derived from the one
# documents table by hash — ~10% added (absent from old), ~10% removed
# (absent from new), ~20% edited (old text reversed). Cutoffs are over
# the shared 1e6 hash modulus.
SNAP_ADD_CUTOFF = 100_000


SNAP_DEL_CUTOFF = 100_000


SNAP_EDIT_CUTOFF = 200_000


BPE_TOPK = 50


ZIPF_TOPK = 500


# The unit for the bloom / overlap audits is the 3-gram SHINGLE, not the
# bare term: the synthetic fixture shares one ~31-word vocabulary across
# languages (term-level membership would be trivially all-true), while
# shingle sets have real structure (sf0.01: 9k EN / 11k non-EN / 4k
# shared). m = 2^18 bits -> ~0.06% fp at the sf0.01 shingle count; at
# sf0.1 the same filter runs ~45% fp — deliberately kept so the audit
# SHOWS saturation (the sizing decision the fp column is for).
BLOOM_M = 262144


BLOOM_K = 4


OVERLAP_B = 12  # 4096 registers => ~1.6% per-estimate error


N_SHARDS = 16  # divides 1e6 exactly -> unbiased deal (assign_shards doc)


# explicit target mixture over the corpus languages (Pile/DoReMi-style
# spec — an *input*, unlike temperature_sample's count-derived weights)
MIX_TARGETS = {"en": 0.4, "zh": 0.2, "de": 0.15, "es": 0.15, "fr": 0.1}


PQ_SHORTLIST = 20


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


_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


def _sample_hash_sql(salt: str) -> str:
    return (
        f"('0x' || substr(md5('{salt}|' || CAST(doc_id AS VARCHAR)), 1, 15))"
        "::BIGINT % 1000000"
    )


_DOC_COLUMNS = ("doc_id", "text", "lang", "source", "n_chars")

"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure column expressions / one grouped aggregation — no Python in the
data path, every op oracle-checkable. Scale shape: token ops are map-only
per document; lang-ID is one explode + one aggregation (stopword dim is a
broadcast literal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from sarkac_spark.functions.ranking import rank_topk
from sarkac_spark.operators.dedup import _h60, words_col
from sarkac_spark.plans.audit import lazy_checkpoint

# tiny per-language stopword profiles — an n-gram/stopword-ratio heuristic
# (fastText-style lang-id is out of scope: no model files in this env)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "es", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "que"),
    "zh": ("de", "le", "shi", "zai", "he", "you", "wo", "ta", "men", "bu"),
}


def token_count(text_col: str) -> Column:
    """Whitespace token count (the cheap pre-BPE budget estimate).
    Long-typed to match the oracle engine's BIGINT counts."""
    return F.size(words_col(text_col)).cast("long")


def bpe_ish_token_count(text_col: str) -> Column:
    """BPE-ish upper bound: word-piece segments from a regex split on
    non-alphanumerics plus a 4-chars-per-piece length penalty — a cheap,
    deterministic stand-in for a real tokenizer's count."""
    pieces = F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+")
    return F.aggregate(
        F.filter(pieces, lambda p: p != ""),
        F.lit(0).cast("long"),
        lambda acc, p: acc + F.ceil(F.length(p) / F.lit(4.0)).cast("long"),
    )


def doc_fingerprint(text_col: str) -> Column:
    """Deterministic fingerprint of whitespace-normalized, lowercased
    text — the exact-dedup key that survives formatting noise."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return F.md5(normalized)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: lengths, punctuation/digit/space ratios,
    unique-word ratio, mean word length — the usual pre-training filters.

    The words array (and its distinct form) are materialized in their own
    projection first: each expression referencing the raw ``split`` would
    re-run the regex per expression (same lesson as ``dedup.shingles``).
    """
    staged = df.withColumns(
        {
            "__w": words_col(text_col),
        }
    ).withColumns(
        {
            "__wd": F.array_distinct(F.col("__w")),
            "__nc": F.length(F.col(text_col)),
        }
    )
    w, wd, n_chars = F.col("__w"), F.col("__wd"), F.col("__nc")
    return staged.withColumns(
        {
            "n_words": F.size(w).cast("long"),
            "n_unique_words": F.size(wd).cast("long"),
            "unique_ratio": F.round(F.size(wd) / F.size(w), 6),
            "mean_word_len": F.round(
                F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
                / F.size(w),
                6,
            ),
            "punct_ratio": F.round(
                (n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", "")))
                / n_chars,
                6,
            ),
            "digit_ratio": F.round(
                (n_chars - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", "")))
                / n_chars,
                6,
            ),
        }
    ).drop("__w", "__wd", "__nc")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0-1 quality score: rewards lexical diversity and sane
    word lengths, penalizes punctuation/digit noise. Weights are the
    operator's contract (documented, deterministic), not a claim of
    linguistic truth.

    Arithmetic note: the weighted sum is computed in exact integer
    micro-units (inputs are 6-decimal-rounded ratios, scale 1e6; weights
    x100) and divided once by 1e8 — float summation can land exactly on
    a rounding boundary and flip the 6th decimal between engines, which
    broke oracle comparison; integer math cannot.
    """
    feats = quality_features(df, text_col)

    def micro(col: str) -> F.Column:
        return F.round(F.col(col) * 1_000_000).cast("long")

    len_term6 = F.least(F.col("n_words") * 10_000, F.lit(1_000_000))
    score_scaled = (
        35 * micro("unique_ratio")
        + 35 * len_term6
        + 15 * (1_000_000 - micro("punct_ratio"))
        + 15 * (1_000_000 - micro("digit_ratio"))
    )
    return feats.withColumn(
        "quality_score", score_scaled / F.lit(100_000_000.0)
    )


# English function words for the Gopher "has stopwords" rule — reuses the
# lang-id profile so both rules share one vocabulary contract.
_GOPHER_STOPWORDS = STOPWORDS["en"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 1_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style repetition-free quality rules (Rae et al. 2021 §A1.1):
    word-count bounds, mean-word-length bounds, symbol-to-char ratio cap,
    and a minimum count of English function words. Emits each rule's
    feature plus per-rule booleans and the conjunction, so downstream
    filters can both gate and audit *why* a doc failed.

    Scale shape: map-only column expressions (split + two higher-order
    folds per row), no shuffle, no Python — survives any corpus size that
    scans. The words array is staged in its own projection so each rule
    reads one materialized array instead of re-running the regex split.
    """
    staged = df.withColumns({"__w": words_col(text_col)}).withColumns(
        {"__nc": F.length(F.col(text_col))}
    )
    w, n_chars = F.col("__w"), F.col("__nc")
    n_words = F.size(w).cast("long")
    # empty docs: 0/0 would be NULL in Spark but fall through DuckDB's
    # CASE to 0 — guard both ratios to 0.0 so the booleans stay boolean
    # and the oracle hash can't diverge on empty text
    mean_wl = F.when(
        F.size(w) > 0,
        F.round(
            F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
            / F.size(w),
            6,
        ),
    ).otherwise(F.lit(0.0))
    # symbols = anything outside [a-zA-Z0-9 ] — markup, control chars, the
    # '#'/ellipsis family Gopher counts, collapsed to one deterministic class
    symbol_ratio = F.when(
        n_chars > 0,
        F.round(
            (
                n_chars
                - F.length(
                    F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9 ]", "")
                )
            )
            / n_chars,
            6,
        ),
    ).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.filter(w, lambda x: F.array_contains(stop_arr, F.lower(x)))
    ).cast("long")
    feats = staged.withColumns(
        {
            "n_words": n_words,
            "mean_word_len": mean_wl,
            "symbol_ratio": symbol_ratio,
            "stop_hits": stop_hits,
        }
    ).drop("__w", "__nc")
    rules = feats.withColumns(
        {
            "ok_word_count": (
                (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
            ).cast("long"),
            "ok_mean_word_len": (
                (F.col("mean_word_len") >= min_mean_word_len)
                & (F.col("mean_word_len") <= max_mean_word_len)
            ).cast("long"),
            "ok_symbol_ratio": (F.col("symbol_ratio") <= max_symbol_ratio).cast(
                "long"
            ),
            "ok_stopwords": (F.col("stop_hits") >= min_stop_hits).cast("long"),
        }
    )
    return rules.withColumn(
        "passes",
        (
            F.col("ok_word_count")
            * F.col("ok_mean_word_len")
            * F.col("ok_symbol_ratio")
            * F.col("ok_stopwords")
        ).cast("long"),
    )


def unigram_kl(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group unigram-distribution drift: KL(P_group || P_corpus) over
    lowercased whitespace tokens — the standard check that a corpus slice
    (a crawl source, a date bucket) hasn't drifted from the mixture it is
    sampled into. Output: (group, n_tokens, n_types, kl_divergence).

    Scale shape: ONE corpus scan. The explode + (group, token) count is
    the only data-sized shuffle; the token marginal (c_t) and group
    marginal (tot_g) come from window sums over the already-aggregated
    counts (vocab-bounded — tiny next to the corpus), not from re-derived
    branches that would each rescan the corpus. The grand total branches
    from the same (group, token) exchange, so the physical planner emits
    a ReusedExchange instead of a second scan (plan-asserted in
    test_plans.py). The final per-group aggregation reuses the group
    window's partitioning — no extra exchange. Each KL term is computed
    from exact integer counts — (c_gt/tot_g) * ln((c_gt * tot) /
    (tot_g * c_t)) — so only the final sum sees floats; rounded to 6
    decimals.
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(words_col(text_col)).alias("tok"),
    ).select("grp", F.lower(F.col("tok")).alias("tok"))
    gt = toks.groupBy("grp", "tok").agg(F.count("*").alias("c_gt"))
    total = gt.agg(F.sum("c_gt").cast("long").alias("tot"))
    enr = (
        gt.crossJoin(F.broadcast(total))
        .withColumn("c_t", F.sum("c_gt").over(Window.partitionBy("tok")))
        .withColumn("tot_g", F.sum("c_gt").over(Window.partitionBy("grp")))
    )
    terms = enr.select(
        "grp",
        "c_gt",
        (
            (F.col("c_gt") / F.col("tot_g"))
            * F.log(
                (F.col("c_gt") * F.col("tot")) / (F.col("tot_g") * F.col("c_t"))
            )
        ).alias("term"),
    )
    return (
        terms.groupBy("grp")
        .agg(
            F.sum("c_gt").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.round(F.sum("term"), 6).alias("kl_divergence"),
        )
        .withColumnRenamed("grp", group_col)
    )


def lang_id(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Stopword-profile language ID: explode words, count hits per
    language profile, argmax with (count desc, lang asc) tiebreak; docs
    with zero hits in every profile get 'und' (undetermined).

    One explode + one aggregation; the profile table is a literal
    broadcast dim.
    """
    spark = df.sparkSession
    profile = spark.createDataFrame(
        [(lang, word) for lang, ws in STOPWORDS.items() for word in ws],
        "lang_cand string, word string",
    )
    words = df.select(
        F.col(id_col), F.explode(words_col(text_col)).alias("word")
    ).withColumn("word", F.lower(F.col("word")))
    hits = (
        words.join(F.broadcast(profile), "word")
        .groupBy(id_col, "lang_cand")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("n_hits").desc(), F.col("lang_cand")
    )
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("lang_cand").alias("lang_pred"), "n_hits")
    )
    return df.select(id_col).join(best, id_col, "left").fillna(
        {"lang_pred": "und", "n_hits": 0}
    )


# --- PII redaction -----------------------------------------------------------

# Patterns restricted to the RE2 ∩ Java-regex dialect (no lookaround, no
# backreferences) so the DuckDB oracle runs the IDENTICAL strings.
# Order matters: emails first (their local part could otherwise be eaten
# by the numeric patterns), then the fixed-shape numeric ids.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Scrub PII-shaped spans, the pre-training privacy pass: each
    pattern class is counted (on the raw text) and replaced with its
    typed placeholder ``[EMAIL]``/``[SSN]``/... Adds ``n_<kind>``
    counts and the redacted text.

    All JVM-side (``regexp_count`` + chained ``regexp_replace`` —
    codegen'd, no Python in the hot path, map-only: the op composes
    with any scan without adding a shuffle). Counting precedes
    replacement so classes can't shadow each other's counts; the
    replacement chain applies in PII_PATTERNS order.
    """
    out = df
    for kind, pat in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    red = F.col(text_col)
    for kind, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"[{kind.upper()}]")
    return out.withColumn(out_col, red)


# --- repetition filters (Gopher-style quality gates) -------------------------


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_bigram_frac: float = 0.06,
    min_distinct_word_frac: float = 0.5,
) -> DataFrame:
    """Repetition quality gate in the Gopher/MassiveText tradition:
    machine-generated and boilerplate text betrays itself by repeating —
    a dominant bigram or a collapsed vocabulary. Per doc:

    - ``distinct_word_frac``: |unique words| / |words| — pure JVM array
      math on the words array, no shuffle;
    - ``top_bigram_frac``: occurrences of the most frequent bigram over
      all bigram occurrences — relational (explode -> two grouped aggs),
      because per-doc quadratic array probing would blow up on long docs;
    - ``repetitive``: either signal tripping its threshold.

    Scale shape: one scan; the explode leg shuffles (doc, bigram) pairs
    once and (doc) once. NULL-safe: docs with < 2 words have no bigrams
    and a NULL ``top_bigram_frac``; the flag coalesces that leg to
    false on BOTH engines (three-valued OR would otherwise leak NULL
    flags).
    """
    words = df.select(F.col(id_col), words_col(text_col).alias("__w"))
    w = F.col("__w")
    base = words.select(
        F.col(id_col),
        F.size(w).cast("long").alias("n_words"),
        F.round(F.size(F.array_distinct(w)) / F.size(w), 6).alias(
            "distinct_word_frac"
        ),
    )
    idx = F.sequence(F.lit(0), F.size(w) - 2)
    grams_arr = F.transform(idx, lambda i: F.array_join(F.slice(w, i + 1, 2), " "))
    safe = F.when(F.size(w) >= 2, grams_arr).otherwise(
        F.array().cast("array<string>")
    )
    grams = words.select(F.col(id_col), F.explode(safe).alias("g"))
    top = (
        grams.groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.max("__c").alias("__max_c"),
            F.round(F.max("__c") / F.sum("__c"), 6).alias("top_bigram_frac"),
        )
    )
    out = base.join(top, on=id_col, how="left")
    # the bigram leg only fires when the top bigram actually REPEATS:
    # in a short all-unique doc the top fraction is 1/n_bigrams by
    # construction, which says nothing about repetition
    flag = F.coalesce(
        (F.col("__max_c") >= 2)
        & (F.col("top_bigram_frac") > F.lit(max_top_bigram_frac)),
        F.lit(False),
    ) | (F.col("distinct_word_frac") < F.lit(min_distinct_word_frac))
    return out.withColumn("repetitive", flag).drop("__max_c")


# --- chunking ----------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 40,
    overlap: int = 8,
) -> DataFrame:
    """Split docs into fixed word-budget chunks with overlap — the
    context-window prep step (embedding indexing, long-doc training
    samples). Output: (id, chunk_id, chunk_text, n_words), chunk_id
    numbering the stride position.

    Map-only: chunk starts come from a ``sequence`` at stride
    (chunk_words - overlap), the chunk text from ``slice`` +
    ``array_join`` — one explode, no shuffle, no Python. The start
    bound ``size - overlap - 1`` kills the degenerate tail chunk whose
    words are all covered by its predecessor's overlap (a stride-end
    chunk always contributes >= 1 new word).
    """
    if overlap >= chunk_words:
        raise ValueError("overlap must be < chunk_words")
    stride = chunk_words - overlap
    words = df.select(F.col(id_col), words_col(text_col).alias("__w"))
    w = F.col("__w")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(w) - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    out = words.select(
        F.col(id_col), w.alias("__w"), F.explode(starts).alias("__start")
    )
    return out.select(
        F.col(id_col),
        (F.col("__start") / stride).cast("long").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("__w"), F.col("__start") + 1, chunk_words), " "
        ).alias("chunk_text"),
        F.least(
            F.lit(chunk_words), F.size(F.col("__w")) - F.col("__start")
        ).cast("long").alias("n_words"),
    )


# --- TF-IDF ------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k characteristic terms per doc by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)`` — the sklearn smoothing, never
    divides by zero). The keyword-extraction / topic-drift primitive
    over a corpus.

    Relational shape: ONE explode to (doc, term) counts; document
    frequency comes from the SAME counted relation (one extra grouped
    agg over |doc x term|, not a rescan); N is a 1-row broadcast. The
    top-k rank runs per doc on the scored relation. Deterministic
    tiebreak (score desc, term asc) and 6-decimal rounding BEFORE
    ranking keep ranks identical cross-engine despite ln()'s last-ulp
    variation.
    """
    words = df.select(
        F.col(id_col), F.explode(words_col(text_col)).alias("term")
    ).withColumn("term", F.lower(F.col("term")))
    # barrier: ``tf`` feeds the document-frequency agg AND the scored
    # join under different keys — without it the term explode re-ran
    # per leg (r12)
    tf = (
        words.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(lazy_checkpoint)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__n") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", F.col("tf").cast("long").alias("tf"), "tfidf", "rank")
    )


# --- corpus-level term statistics --------------------------------------------


def top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """Global heavy hitters: top-k terms by total occurrences, with
    document frequency. The vocabulary/stopword-discovery pass run
    before tuning quality filters on a new corpus.

    Scale shape: both aggregates are partial-before-shuffle (the first
    shuffle carries |doc x term| combined counts, the second |vocab|);
    top-k is orderBy().limit() => TakeOrderedAndProject (per-partition
    heap merged on the driver), never a global sort or a
    single-partition rank window.
    """
    words = df.select(
        F.col(id_col), F.explode(words_col(text_col)).alias("term")
    ).withColumn("term", F.lower(F.col("term")))
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    per_term = tf.groupBy("term").agg(
        F.sum("tf").cast("long").alias("n_occ"),
        F.count(F.lit(1)).alias("df_docs"),
    )
    top = per_term.orderBy(F.col("n_occ").desc(), F.col("term")).limit(k)
    return rank_topk(top, "n_occ", "term")


def bpe_merge_pairs(df: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """First BPE merge iteration, corpus-wide: the frequency of every
    adjacent CHARACTER pair inside words, weighted by word occurrences —
    the statistic the BPE training loop (Sennrich et al. 2016) greedily
    maximizes each round. Run on a pre-training corpus it answers "is
    the shipped tokenizer fit to this data?" (the top merge candidates
    here should already be merges in its vocab) without training one.

    Output: (pair, occurrences, rank) — top-k by occurrences, pair-asc
    tie-break, so the selected SET is deterministic for the oracle.

    Scale shape: word occurrences collapse FIRST (one map-side-combined
    shuffle down to |vocab|); the pair explosion runs on the
    distinct-word relation — ~word_len pairs per VOCAB ENTRY, not per
    occurrence — so the second shuffle carries <= |vocab| x word_len
    rows whatever the corpus row count. Top-k is orderBy().limit()
    (TakeOrderedAndProject) + ``rank_topk``, never a global sort or a
    single-partition window.
    """
    words = df.select(F.explode(words_col(text_col)).alias("__word"))
    wc = words.groupBy("__word").agg(F.count(F.lit(1)).alias("__cnt"))
    wlen = F.length("__word")
    # sequence(1, 0) counts DOWN in Spark — guard 1-char words explicitly
    grams = F.transform(
        F.sequence(F.lit(1), wlen - 1),
        lambda i: F.col("__word").substr(i, F.lit(2)),
    )
    pairs = wc.select(
        F.explode(
            F.when(wlen >= 2, grams).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
        F.col("__cnt"),
    )
    agg = pairs.groupBy("pair").agg(F.sum("__cnt").cast("long").alias("occurrences"))
    top = agg.orderBy(F.col("occurrences").desc(), F.col("pair")).limit(k)
    return rank_topk(top, "occurrences", "pair")


def zipf_fit(df: DataFrame, text_col: str = "text", top_k: int = 500) -> DataFrame:
    """Zipf-law fit over the term-frequency head: the least-squares
    slope of log10(frequency) on log10(rank) across the ``top_k`` most
    frequent terms. Natural corpora sit near slope -1 (Zipf 1949);
    a slope far from -1 or a low r2 flags synthetic/templated text,
    boilerplate floods, or tokenizer mismatch — a one-row corpus health
    gate cheap enough to run per ingest.

    Output: ONE row (n_terms, slope, intercept, r2), rounded to 6.

    Determinism / oracle note: ranks come from ``rank_topk`` (broadcast
    self-join, no window); each log10 input is lifted to exact integer
    micro-units (round(log10(v) * 1e6)) so every regression SUM is
    integer arithmetic — identical under any partitioning and in either
    engine. The final slope/intercept/r2 combine casts those exact
    integers to double: the one inexact step, but identical inputs give
    identical IEEE results cross-engine.

    Scale shape: one map-side-combined term-count shuffle (|vocab|
    rows), a TakeOrderedAndProject top-k, then O(top_k^2) broadcast
    rank pairs and a 1-row aggregate — corpus size only touches the
    first scan.
    """
    words = df.select(F.explode(words_col(text_col)).alias("term"))
    counts = words.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    top = counts.orderBy(F.col("n_occ").desc(), F.col("term")).limit(top_k)
    ranked = rank_topk(top, "n_occ", "term")
    micro = 1_000_000
    pts = ranked.select(
        F.round(F.log10(F.col("rank").cast("double")) * micro)
        .cast("long")
        .alias("__x"),
        F.round(F.log10(F.col("n_occ").cast("double")) * micro)
        .cast("long")
        .alias("__y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    return sums.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n / F.lit(float(micro)), 6).alias("intercept"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )


def bigram_transitions(
    df: DataFrame,
    text_col: str = "text",
    min_head_count: int = 20,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Corpus bigram transition model: for each sufficiently-frequent
    head word, the top-k next words with conditional probability
    P(next | head) — the n-gram LM / suggestion primitive.

    Bigrams are built MAP-SIDE with a zip-shift over the words array
    (``arrays_zip(w, w[2:])``, NULL-padded tail filtered out) — no
    positional self-join, no second explode pass. Head totals come from
    the already-aggregated pair relation (|vocab^2 observed| rows), not
    a rescan. Ranking uses the integer pair count (desc, then next-word
    asc), so order is exact cross-engine; prob is a rounded derived
    column.
    """
    w = F.expr(f"filter(split(lower(trim({text_col})), '\\\\s+'), x -> x != '')")
    shifted = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0)))
    bg = F.explode(F.arrays_zip(w.alias("head"), shifted.alias("nxt"))).alias("bg")
    # barrier: ``pairs`` feeds the head totals AND the final join —
    # without it the corpus bigram explode re-ran per leg (r12); the
    # materialized relation is |observed bigrams| rows, tiny vs corpus
    pairs = (
        df.select(bg)
        .select(F.col("bg.head").alias("head"), F.col("bg.nxt").alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .groupBy("head", "nxt")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .transform(lazy_checkpoint)
    )
    heads = pairs.groupBy("head").agg(F.sum("n_ab").cast("long").alias("n_a"))
    rk = Window.partitionBy("head").orderBy(F.col("n_ab").desc(), F.col("nxt"))
    return (
        pairs.join(heads.filter(F.col("n_a") >= min_head_count), "head")
        .withColumn("rank", F.row_number().over(rk).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "head",
            "nxt",
            F.col("n_ab").cast("long").alias("n_ab"),
            "n_a",
            F.round(F.col("n_ab") / F.col("n_a"), round_digits).alias("prob"),
            "rank",
        )
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 40,
    round_digits: int = 6,
) -> DataFrame:
    """Vocabulary coverage curve: for each of the top-``top_k`` corpus
    terms (by occurrences, term tiebreak), the cumulative share of all
    token occurrences a vocabulary truncated at that rank would cover —
    the standard "how big must the vocab be / what's the OOV rate"
    tokenizer-design question.

    Shape: one explode + one grouped count (the same relation top_terms
    aggregates), a driver-merged top-k, then the cumulative sum over the
    k survivors via a tiny broadcast self-join (rank<=rank) — k^2 rows
    at k<=a few hundred, so no unpartitioned running-sum window appears
    in the plan (single-partition WindowExec is the thing plan audits
    flag). The 1-row total rides as a broadcast.

    Output: (rank, term, n_occ, cum_coverage, oov_rate), rank 1-based.
    """
    words = df.select(
        F.explode(words_col(text_col)).alias("term")
    ).withColumn("term", F.lower(F.col("term")))
    counts = words.groupBy("term").agg(F.count(F.lit(1)).alias("n_occ"))
    totals = counts.agg(F.sum("n_occ").alias("__total"))
    top = counts.orderBy(F.col("n_occ").desc(), F.col("term")).limit(top_k)
    ranked = rank_topk(top, "n_occ", "term")
    prior = ranked.select(
        F.col("rank").alias("__r"), F.col("n_occ").alias("__occ")
    )
    cum = (
        ranked.join(F.broadcast(prior), F.col("__r") <= F.col("rank"))
        .groupBy("rank", "term", "n_occ")
        .agg(F.sum("__occ").alias("__cum_occ"))
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "rank",
            "term",
            "n_occ",
            F.round(F.col("__cum_occ") / F.col("__total"), round_digits).alias(
                "cum_coverage"
            ),
            F.round(
                F.lit(1.0) - F.col("__cum_occ") / F.col("__total"), round_digits
            ).alias("oov_rate"),
        )
    )


def doc_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """LM-based quality scoring (the CCNet/Dolma perplexity-filter step,
    with the corpus's own add-one-smoothed bigram model standing in for
    KenLM — no model files ship in this environment): each document gets
    the mean negative log-probability of its bigrams under
    ``p(next|head) = (c(head,next) + 1) / (c(head) + V)``. Gibberish and
    heavily-templated text sit at the distribution's tails; curation
    cuts on a quantile of ``lm_score``.

    Shape: the zip-shift bigram explode (map-side, shared with
    bigram_transitions), ONE grouped count for the corpus pair table,
    head totals reduced from it, then a pair-table join back to the
    per-doc bigrams and one per-doc aggregation. The pair relation is
    |observed bigrams| rows — far smaller than the corpus — and AQE
    broadcasts it while it fits. Integer counts + a single ln() at the
    end keep the score cross-engine stable at 6 decimals.

    Output: (id, n_bigrams, lm_score); docs with < 2 words are excluded
    (no bigrams to score — the length gates own that regime).
    """
    w = F.expr(f"filter(split(lower(trim({text_col})), '\\\\s+'), x -> x != '')")
    shifted = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0)))
    bg = F.explode(F.arrays_zip(w.alias("head"), shifted.alias("nxt"))).alias("bg")
    # barrier: ``doc_bigrams`` feeds FOUR legs (pair counts, the two
    # vocab union sides, the final scoring join) — without it the
    # corpus bigram explode re-ran per leg (r12: 9 runtime scans)
    doc_bigrams = (
        df.select(F.col(id_col), bg)
        .select(
            F.col(id_col),
            F.col("bg.head").alias("head"),
            F.col("bg.nxt").alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .transform(lazy_checkpoint)
    )
    pairs = doc_bigrams.groupBy("head", "nxt").agg(
        F.count(F.lit(1)).alias("n_ab")
    )
    heads = pairs.groupBy("head").agg(F.sum("n_ab").cast("long").alias("n_a"))
    vocab = doc_bigrams.select(F.col("head").alias("__w")).union(
        doc_bigrams.select(F.col("nxt").alias("__w"))
    )
    v = vocab.agg(F.countDistinct("__w").alias("__v"))
    model = pairs.join(heads, "head").crossJoin(F.broadcast(v))
    neg_log_p = -F.log(
        (F.col("n_ab") + F.lit(1)) / (F.col("n_a") + F.col("__v"))
    )
    return (
        doc_bigrams.join(model, ["head", "nxt"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(neg_log_p), round_digits).alias("lm_score"),
        )
    )


def group_vocab_jaccard(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise lexical overlap between corpus slices (languages,
    sources, snapshots): Jaccard similarity of the distinct-unigram
    vocabularies of every pair of groups — the corpus-analytics view
    for spotting cross-lingual contamination (two "languages" sharing
    most of their vocabulary) or near-identical sources worth merging
    before dedup.

    Shape: ONE corpus scan -> explode to (group, term) -> distinct ->
    groupBy(term) collecting each term's group-set (the two data-sized
    shuffles). Pair counts and per-group vocab sizes both re-aggregate
    from that tiny per-term relation — no self-join: each term expands
    to its in-array group *combinations* via JVM higher-order
    functions, bounded by |groups|^2 per term whatever the corpus
    size. The shared subtree dedupes to a ReusedExchange at runtime.

    Output: (group_a, group_b, vocab_a, vocab_b, shared_terms,
    jaccard), one row per unordered pair (group_a < group_b),
    zero-overlap pairs included.
    """
    vocab = (
        df.select(
            F.col(group_col).cast("string").alias("g"),
            F.explode(words_col(text_col)).alias("w"),
        )
        .select("g", F.lower(F.col("w")).alias("term"))
        .distinct()
    )
    # barrier: ``by_term`` feeds the vocab-size leg AND the pair-combo
    # leg; the runtime ReusedExchange only partially covered it (r12)
    by_term = vocab.groupBy("term").agg(
        F.array_sort(F.collect_set("g")).alias("gs")
    ).transform(lazy_checkpoint)
    sizes = (
        by_term.select(F.explode("gs").alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    combos = F.explode(
        F.expr(
            "flatten(transform(gs, (x, i) -> "
            "transform(slice(gs, i + 2, size(gs)), "
            "y -> struct(x AS ga, y AS gb))))"
        )
    ).alias("p")
    inter = (
        by_term.select(combos)
        .select(F.col("p.ga").alias("ga"), F.col("p.gb").alias("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    grid = (
        sizes.alias("sa")
        .join(
            sizes.alias("sb"),
            F.col("sa.g") < F.col("sb.g"),
        )
        .select(
            F.col("sa.g").alias("group_a"),
            F.col("sb.g").alias("group_b"),
            F.col("sa.vocab").alias("vocab_a"),
            F.col("sb.vocab").alias("vocab_b"),
        )
    )
    shared = F.coalesce(F.col("shared"), F.lit(0)).cast("long")
    return (
        grid.join(
            inter,
            (F.col("group_a") == F.col("ga")) & (F.col("group_b") == F.col("gb")),
            "left",
        )
        .select(
            "group_a",
            "group_b",
            "vocab_a",
            "vocab_b",
            shared.alias("shared_terms"),
            (
                shared.cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - shared)
            ).alias("jaccard"),
        )
    )


def hash_embed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Hashing-trick document embeddings (Weinberger et al., ICML 2009):
    every token hashes to a bucket j = h(term) % dim with a sign from an
    independent hash bit; the doc vector is the signed bucket-count
    histogram, L2-normalized. No vocabulary, no training, no Python —
    the deterministic text→vector bridge that lets the embedding stack
    (semantic dedup, IVF/LSH/PQ ANN, cosine near-dup) run on raw text
    when no learned encoder output is available.

    Output: (id, embedding array<double>), unit-norm, components rounded
    to 6 — one row per input doc. Every doc yields >= 1 token under
    ``words_col`` (whitespace split of trimmed text returns [''] for
    empty text), so the explode never drops a doc — an invariant this
    operator RELIES on and tests pin (a words_col change that filters
    empties would silently drop token-less docs here). The zero-vector
    branch below is for SIGN CANCELLATION: a doc whose signed bucket
    counts all net to zero has norm 0 and keeps its zero vector rather
    than dividing by it.

    Scale shape: one (id, bucket) map-side-combined shuffle (at most
    ``dim`` rows per doc survive the combine) and one per-doc
    aggregation that densifies via a map lookup over ``sequence(0,
    dim-1)`` — no |vocab|-sized state anywhere, which is the point of
    the hashing trick. Cross-engine exact: signed counts are integers;
    normalization divides identical integers by the same sqrt.
    """
    words = df.select(
        F.col(id_col), F.explode(words_col(text_col)).alias("__t")
    ).withColumn("__t", F.lower(F.col("__t")))
    h = _h60(F.col("__t"))
    signed = words.select(
        F.col(id_col),
        (h % dim).alias("__b"),
        F.when((h % (2 * dim)) >= dim, F.lit(-1)).otherwise(F.lit(1)).alias("__s"),
    )
    per_bucket = signed.groupBy(id_col, "__b").agg(
        F.sum("__s").cast("long").alias("__v")
    )
    dense = per_bucket.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("__b", "__v"))).alias("__m")
    )
    # STAGE the dense vector and its norm in their own projections: an
    # expression referenced inside a HOF lambda is re-evaluated per
    # element (no CSE across the lambda boundary — the shingles lesson),
    # so inlining `vec`/`norm` into the normalize transform cost
    # dim x (dim lookups + a fold) per row
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(
            F.element_at(F.col("__m"), j.cast("long")), F.lit(0)
        ).cast("double"),
    )
    staged = dense.select(F.col(id_col), vec.alias("__vec")).select(
        F.col(id_col),
        F.col("__vec"),
        F.sqrt(
            F.aggregate(F.col("__vec"), F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("__n"),
    )
    unit = F.when(
        F.col("__n") > 0,
        F.transform(F.col("__vec"), lambda x: F.round(x / F.col("__n"), 6)),
    ).otherwise(F.transform(F.col("__vec"), lambda x: x * 0.0))
    return staged.select(F.col(id_col), unit.alias("embedding"))

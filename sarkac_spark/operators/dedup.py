"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json mandate): exact dedup,
MinHash+LSH near-dup, SimHash near-dup, and n-gram Jaccard similarity,
each expressed as declarative DataFrame plans that scale:

- exact: one hash-shuffle on the text digest.
- minhash: shingle explode -> ONE grouped aggregation computes all k
  minhashes (conditional-agg pattern: k ``min`` aggregates over the same
  shuffle); LSH banding turns O(n^2) comparison into an equi-join on
  band keys; only candidate pairs get the exact Jaccard verification.
- simhash: word explode -> one grouped aggregation computes all bit
  sums; banding on bit chunks turns hamming search into an equi-join.
- ngram_jaccard: candidate pairs from a shared-shingle equi-join
  (inverted-index style), exact Jaccard on candidates. At very large n,
  prefilter with minhash_lsh_candidates instead — the shared-shingle
  join is quadratic in hot shingles (df blacklisting mitigates).

Portability: all hashing is md5-derived (identical in Spark and DuckDB),
so every operator here is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window
from sarkac_spark.plans.audit import is_small_input, lazy_checkpoint

# 60-bit hash from the md5 hex prefix: fits a signed 64-bit long in both
# engines (Spark: conv(hex,16,10) cast long; DuckDB: ('0x'||hex)::bigint).
_HASH_HEX_LEN = 15
SIMHASH_BITS = 60


def _h60(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, _HASH_HEX_LEN), 16, 10).cast("long")


def words_col(text_col: str) -> F.Column:
    """Whitespace tokenization, shared by dedup/text ops."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle).

    Built with sequence+transform (JVM higher-order functions, no Python)
    then exploded — the explode is the scale cost, ~words x n per doc.

    The words array is MATERIALIZED in its own projection first: an
    expression referenced inside a lambda is re-evaluated per array
    element (no common-subexpression elimination across the HOF
    boundary), so inlining the regex split made shingling ~15x slower —
    one split per shingle per leg instead of one per document.
    """
    words = df.select(F.col(id_col), words_col(text_col).alias("__w"))
    w = F.col("__w")
    idx = F.sequence(F.lit(0), F.size(w) - n)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(w, i + 1, n), " "))
    # guard: docs shorter than n words produce no shingles (Spark's
    # sequence() would otherwise run DESCENDING for size-n < 0 and slice
    # errors on index 0 under ANSI mode)
    safe = F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
    return words.select(F.col(id_col), F.explode(safe).alias("shingle"))


# --- exact dedup ------------------------------------------------------------


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by text digest; keeps min(id) as canonical.
    Returns (text_hash, canonical_id, n_dups). One shuffle on the digest —
    at 100 TB this is the cheapest possible full-corpus dedup."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# --- MinHash + LSH ----------------------------------------------------------


# LCG minhash family over one md5-derived base hash: h_i = (A_i*h + B_i)
# mod P. ONE md5 per shingle (the old md5-per-(i,shingle) scheme cost k
# digests per row — the dominant cost at scale); the k variants are pure
# 64-bit integer ops, identical in Spark and DuckDB. P prime < 2^31 keeps
# A_i*h < 2^62 (no int64 overflow). Constants are fixed engine contract.
MINHASH_P = 2147483647
_LCG_A = [1103515245 + 12820163 * i for i in range(64)]
_LCG_B = [377003613 + 1013904223 * i for i in range(64)]

# Hot-band guard (on by default): a band key shared by D docs yields
# D(D-1)/2 candidate rows from the band self-join — one boilerplate-heavy
# band with df=1e6 means 5e11 join rows, the same quadratic scale-killer
# ngram_jaccard_pairs caps with max_df. Bands with df > this cap are
# excluded from candidacy (fanout bounded at cap^2/2 per band); a doc can
# still pair via its other, discriminating bands. Docs whose EVERY band is
# hot are by construction near-identical to >cap others — route them
# through dedup_exact / minhash_hot_bands clustering, not pairwise LSH.
# Mirrored verbatim in the DuckDB oracles (queries/llm.py).
MINHASH_MAX_BAND_DF = 1024


def _df_cap(rel: DataFrame, key_col: str, max_df: int | None) -> DataFrame:
    """Shared hot-key df cap: drop every row whose ``key_col`` value
    occurs more than ``max_df`` times.

    Formulated as a map-side-combined count aggregation + shuffle
    SEMI-JOIN on the key (merge hint) — NOT a count window, and NOT a
    broadcast anti-join:

    - A window partitioned by the key funnels the entire hot key
      through ONE unsplittable task (windows cannot be split across
      tasks; AQE skew handling covers joins only): at df=1e8 — the
      boilerplate shape this cap exists for — that is a minutes-long
      straggler sorting 1e8 rows, i.e. the guard itself reintroduces
      the skew it guards against.
    - A broadcast anti-join against the hot set is skew-safe but
      re-derives ``rel`` for the count leg (map-only subtrees have no
      exchange for ReuseExchange to dedupe) — measured 2-3x wall on
      the shingle-explode relations.
    - The shuffle semi-join gets both: the aggregation and the probe
      leg consume the SAME exchange on the key (ReuseExchange — one
      derivation of ``rel``, one shuffle), the hot key collapses
      map-side in the count's partial aggregation, and a skewed
      partition in a sort-merge join IS AQE-splittable
      (OptimizeSkewedJoin covers LeftSemi). AQE may still convert to
      broadcast at runtime from the already-materialized stage — no
      recompute either way.

    Result-identical to the window formulation, so the DuckDB oracles
    (which keep the simpler windowed SQL) are unaffected — equivalence
    property-tested in test_properties.py."""
    if max_df is None:
        return rel
    keep = (
        rel.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select(key_col)
    )
    return rel.join(keep.hint("merge"), key_col, "left_semi")


def _cap_band_df(banded: DataFrame, max_band_df: int | None) -> DataFrame:
    """Band-key instance of ``_df_cap`` (see its docstring for the
    semi-join-not-window rationale)."""
    return _df_cap(banded, "band_key", max_band_df)


def _minhash_aggs(k: int) -> list[F.Column]:
    return [
        F.min(
            (F.lit(_LCG_A[i] % MINHASH_P) * F.col("h") + F.lit(_LCG_B[i] % MINHASH_P))
            % MINHASH_P
        ).alias(f"mh_{i}")
        for i in range(k)
    ]


def _hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    sh = shingles(df, id_col, text_col, n=shingle_n)
    # h (mod P) feeds the minhash LCGs, which need values < P; h60 is
    # the full 60-bit hash carried in sh_set for jaccard verification —
    # mod-P sets would suffer within-doc birthday collisions (~s^2/2^32)
    # on large docs, visibly shrinking counts at corpus scale.
    h60 = _h60(F.col("shingle"))
    return sh.select(
        F.col(id_col), (h60 % MINHASH_P).alias("h"), h60.alias("h60")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 16, shingle_n: int = 3
) -> DataFrame:
    """k minhashes per doc in ONE aggregation pass: minhash_i = min over
    shingles of ``(A_i * h60(shingle) mod P + B_i) mod P``. Returns
    (id, mh_0..mh_{k-1}) as longs."""
    hashed = _hashed_shingles(df, id_col, text_col, shingle_n)
    return hashed.groupBy(id_col).agg(*_minhash_aggs(k))


def _band_keys_expr(k: int, bands: int) -> F.Column:
    rows = k // bands
    return F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"mh_{b * rows + r}").cast("string") for r in range(rows)],
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    max_band_df: int | None = MINHASH_MAX_BAND_DF,
) -> DataFrame:
    """Band signatures into ``bands`` buckets of k/bands rows; docs sharing
    any band key become a candidate pair (id_a < id_b). The band equi-join
    replaces the O(n^2) cross product — the core LSH scale move.

    ``max_band_df`` (on by default) drops degenerate bands before the
    self-join — see MINHASH_MAX_BAND_DF. ``None`` restores uncapped
    candidacy for small corpora. Hot bands remain auditable via
    ``minhash_hot_bands``."""
    banded = _cap_band_df(
        sigs.select(F.col(id_col), F.explode(_band_keys_expr(k, bands)).alias("band_key")),
        max_band_df,
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_hot_bands(
    sigs: DataFrame,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    max_band_df: int | None = MINHASH_MAX_BAND_DF,
) -> DataFrame:
    """Audit relation for the capped bands: (band_key, band_df) for every
    band the ``max_band_df`` guard excluded from pairwise candidacy. All
    members of one hot band are mutual near-duplicates by construction
    (identical signature rows on that band), so the scale-safe handling
    is per-bucket clustering — pick min(id) per band_key as canonical —
    not D^2/2 pairs. One grouped count, no self-join.

    ``max_band_df=None`` (guard disabled) excludes nothing, so the
    audit is EMPTY by definition — mirrored here with a false filter
    rather than returning every band."""
    banded = sigs.select(
        F.col(id_col), F.explode(_band_keys_expr(k, bands)).alias("band_key")
    )
    counts = banded.groupBy("band_key").agg(
        F.count(F.lit(1)).alias("band_df"), F.min(id_col).alias("canonical_id")
    )
    if max_band_df is None:
        return counts.filter(F.lit(False))
    return counts.filter(F.col("band_df") > max_band_df)


def dedup_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_band_df: int | None = MINHASH_MAX_BAND_DF,
    barrier: bool | None = None,
) -> DataFrame:
    """MinHash -> LSH banding -> exact-Jaccard verification. Returns
    near-duplicate pairs (id_a, id_b, jaccard >= threshold).

    ``barrier`` controls the doc-aggregate materialization barrier;
    the default ``None`` size-gates it (``is_small_input``: off below
    the 64 MB floor, ON when large or unknown). Measured r13,
    interleaved same-process A/B: the barrier is a wash at sf0.1
    (2.37 vs 2.35 s), LOSES 1.6x at the x10 generated corpus (15.4 vs
    9.5 s — materializing O(corpus) sig+set rows costs more than the
    legs' recompute at 7 MB), and returns to a wash at x100 / 84 MB
    (89.5 vs 86.8 s, BENCH_SCALE_R13_x100_c32.json) — i.e. the
    materialization amortizes as the corpus grows, and at deployment
    scale each avoided leg is a full corpus re-scan. Results are
    identical either way (the flag only inserts/removes a
    localCheckpoint).

    Single-pass shape (plan-audited): the corpus is scanned, shingled,
    and hashed ONCE; one grouped aggregation computes the k-minhash
    signature AND the doc's shingle-hash set together. Verification
    intersects the carried sets per candidate pair (``array_intersect``
    JVM-side over the few LSH survivors) instead of re-joining the
    exploded inverted index — the naive shape re-scanned the corpus 6x
    (3 shingle recomputations), which is the dominant cost at 100 TB.
    The repeated agg subtree collapses to one exchange via ReuseExchange
    (asserted in test_plans). Jaccard on 60-bit shingle hashes, not
    strings: the set payload is 8 bytes/shingle, and a cross-doc
    collision needs ~2^30 distinct shingles before it perturbs one
    count (birthday on 2^60) — deterministic for a fixed corpus either
    way, and bit-identical to the string oracle in every run we gate.

    ``max_band_df`` (on by default) bounds the band self-join's fanout —
    see MINHASH_MAX_BAND_DF; hot bands audit via ``minhash_hot_bands``."""
    hashed = _hashed_shingles(df, id_col, text_col, shingle_n)
    # The doc-level aggregate feeds THREE legs (band keys, set_a, set_b)
    # plus the band-cap's count leg. Catalyst prunes each leg to a
    # DIFFERENT aggregate (mh_* only vs __sh_set only), so the pruned
    # exchanges never canonicalize equal and ReuseExchange recovers only
    # part of it — measured r12: 9 corpus scans / 19 exchanges at
    # runtime. One lazy localCheckpoint materializes the shingle
    # explode + md5 + agg ONCE (O(corpus) rows of sigs+hash-sets,
    # memory-and-disk — far cheaper than re-scanning and re-hashing the
    # corpus per leg; guide §8's "fingerprint once, decide on the small
    # relation" shape). Lazy, so merely building the plan runs no job.
    doc = hashed.groupBy(id_col).agg(
        *_minhash_aggs(k), F.collect_set("h60").alias("__sh_set")
    )
    if barrier is None:
        # unknown input size (checkpointed/non-file df) gates to True:
        # the barrier shape is always correct, merely heavier on toy data
        barrier = not is_small_input(df)
    if barrier:
        doc = doc.transform(lazy_checkpoint)
    cands = minhash_lsh_candidates(
        doc.select(id_col, *[f"mh_{i}" for i in range(k)]),
        id_col,
        k=k,
        bands=bands,
        max_band_df=max_band_df,
    )
    sets_a = doc.select(F.col(id_col).alias("id_a"), F.col("__sh_set").alias("__set_a"))
    sets_b = doc.select(F.col(id_col).alias("id_b"), F.col("__sh_set").alias("__set_b"))
    inter = F.size(F.array_intersect(F.col("__set_a"), F.col("__set_b")))
    return (
        cands.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .withColumn("__n_common", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("__n_common")
                / (F.size("__set_a") + F.size("__set_b") - F.col("__n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash -----------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per doc: per-word 60-bit md5 hash; bit j of the
    fingerprint is 1 iff the count-weighted sum of (+1/-1) over words'
    bit j is positive. One explode + ONE grouped aggregation with 60
    conditional sums — no per-bit shuffle."""
    w = words_col(text_col)
    # h materialized in its own projection: referencing the md5 hash
    # inside all 60 aggregate expressions would recompute it per
    # expression. Summing +/-1 per word OCCURRENCE equals the
    # count-weighted sum, so no intermediate (doc, word) count shuffle.
    hashed = df.select(F.col(id_col), F.explode(w).alias("word")).select(
        F.col(id_col), _h60(F.col("word")).alias("h")
    )
    bit_sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << j)) != 0, F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = hashed.groupBy(id_col).agg(*bit_sums)
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select(F.col(id_col), fp.cast("long").alias("simhash"))


def dedup_simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.
    Candidates via bit-chunk banding (pigeonhole: distance <= bands-1
    guarantees one equal chunk; with max_hamming=3, bands=4 is exact),
    verified with bit_count(xor).

    A pair sharing several chunks matches in several bands; instead of
    a ``distinct()`` — a full shuffle of the candidate-pair stream, the
    largest relation in the plan — each pair is kept only at its FIRST
    matching band: both fingerprints ride the join, so "no earlier band
    chunk was equal" is a few post-join bit ops per row, and every
    surviving pair is emitted exactly once with zero extra exchanges."""
    fps = simhash(df, id_col, text_col)
    chunk = SIMHASH_BITS // bands
    mask = (1 << chunk) - 1

    def chunk_of(col: Column, b: int) -> Column:
        return F.shiftright(col, b * chunk).bitwiseAND(F.lit(mask))

    band_keys = F.array(
        *[
            F.concat_ws(
                ":", F.lit(str(b)), chunk_of(F.col("simhash"), b).cast("string")
            )
            for b in range(bands)
        ]
    )
    banded = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(band_keys).alias("bidx", "bk"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    sh_a, sh_b = F.col("a.simhash"), F.col("b.simhash")
    earlier_band_matched = F.lit(False)
    for bp in range(bands - 1):
        earlier_band_matched = earlier_band_matched | (
            (F.col("a.bidx") > bp) & (chunk_of(sh_a, bp) == chunk_of(sh_b, bp))
        )
    pairs = (
        a.join(b, "bk")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(~earlier_band_matched)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sh_a.alias("sh_a"),
            sh_b.alias("sh_b"),
        )
    )
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --- train/eval decontamination ----------------------------------------------


def cross_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_shared: int = 1,
    max_train_df: int | None = 256,
) -> DataFrame:
    """Benchmark-decontamination primitive: every (eval doc, train doc)
    pair sharing >= ``min_shared`` distinct n-gram shingles. Returns
    (eval_id, train_id, n_shared) — the audit trail; callers drop or
    flag the eval side (or the train side, for pretraining decontam).

    Scale shape: both corpora shingled once (distinct per doc), joined
    on the 60-bit shingle hash (8-byte shuffle keys, not strings), pair
    counts from one grouped aggregation. The join is inverted-index
    style — work scales with shared-shingle volume, not |train| x
    |eval|. Hot (boilerplate) shingles are the skew risk at 100 TB —
    and a *correctness* risk too: a shingle every train doc carries
    inflates every pair's n_shared with non-evidence. ``max_train_df``
    (default on) drops shingles whose train-side document frequency
    exceeds the cap, via the shared ``_df_cap`` exchange-reusing
    semi-join (map-combined hot-key count, no unsplittable window task
    — see its docstring). ``None`` restores the uncapped measure.
    """
    # barrier before the cap: its count + probe legs would otherwise
    # re-run the train-side shingle explode (unshared exchanges, r12)
    t = (
        shingles(train, id_col, text_col, n=shingle_n)
        .select(F.col(id_col).alias("train_id"), _h60(F.col("shingle")).alias("h"))
        .transform(lazy_checkpoint)
    )
    t = _df_cap(t, "h", max_train_df)
    e = shingles(eval_df, id_col, text_col, n=shingle_n).select(
        F.col(id_col).alias("eval_id"), _h60(F.col("shingle")).alias("h")
    )
    return (
        e.join(t, "h")
        .groupBy("eval_id", "train_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def contamination_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_run: int = 2,
    max_train_df: int | None = 256,
) -> DataFrame:
    """Exact-substring contamination spans — the signal behind
    exact-substring decontamination (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better") re-expressed
    relationally: per (eval doc, train doc) pair, the longest RUN of
    CONSECUTIVE eval n-gram positions whose n-grams all occur in that
    train doc. ``cross_contamination`` counts shared shingles with no
    adjacency — a verbatim 50-token quote inside an otherwise-novel
    eval doc scores like 50 scattered common trigrams; here the quote
    lights up as max_run ~ 50-n while scatter stays near 1.

    Relaxation (the documented contract): adjacency is required on the
    EVAL side, containment anywhere on the train side — so max_run
    upper-bounds the true shared-substring run. Safe for
    decontamination: drop decisions err toward dropping.

    Output: (eval_id, train_id, max_run, span_words, n_matched_pos)
    for pairs with max_run >= ``min_run``; span_words = max_run +
    shingle_n - 1 (the longest verbatim-shared window in words).

    Scale shape: train side is the distinct-shingle inverted index,
    df-capped like ``cross_contamination`` (boilerplate shingles are
    non-evidence AND the skew hazard — the cap bounds the h-join's
    per-key fanout); the eval side carries positions, one row per
    n-gram occurrence. Join output is bounded by shared-shingle volume,
    never |train| x |eval|. The island window partitions by
    (eval_id, train_id) — bounded by one eval doc's length, so no
    single hot partition can exceed a document.
    """
    words = eval_df.select(F.col(id_col), words_col(text_col).alias("__w"))
    w = F.col("__w")
    idx = F.sequence(F.lit(0), F.size(w) - shingle_n)
    grams = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            _h60(F.array_join(F.slice(w, i + 1, shingle_n), " ")).alias("h"),
        ),
    )
    e = words.select(
        F.col(id_col).alias("eval_id"),
        F.explode(
            F.when(F.size(w) >= shingle_n, grams).otherwise(
                F.array().cast("array<struct<pos:int,h:bigint>>")
            )
        ).alias("g"),
    ).select("eval_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    # same barrier-before-cap as cross_contamination (r12)
    t = (
        shingles(train, id_col, text_col, n=shingle_n)
        .select(F.col(id_col).alias("train_id"), _h60(F.col("shingle")).alias("h"))
        .transform(lazy_checkpoint)
    )
    t = _df_cap(t, "h", max_train_df)
    m = e.join(t, "h").select("eval_id", "train_id", "pos").distinct()
    win = Window.partitionBy("eval_id", "train_id").orderBy("pos")
    runs = m.withColumn("__island", F.col("pos") - F.row_number().over(win))
    per_island = runs.groupBy("eval_id", "train_id", "__island").agg(
        F.count(F.lit(1)).alias("__run")
    )
    return (
        per_island.groupBy("eval_id", "train_id")
        .agg(
            F.max("__run").alias("max_run"),
            F.sum("__run").cast("long").alias("n_matched_pos"),
        )
        .withColumn("span_words", F.col("max_run") + F.lit(shingle_n - 1))
        .filter(F.col("max_run") >= min_run)
    )


# --- n-gram Jaccard (no minhash approximation) --------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_df: int | None = 256,
) -> DataFrame:
    """n-gram Jaccard >= threshold via the shingle inverted index:
    ONE self-join on shingle counts |A ∩ B| for every co-occurring pair
    directly (no candidates-distinct-then-rejoin round trip — that shape
    cost 2 extra joins over the exploded relation).

    ``max_df`` is the hot-shingle guard, on by default: a shingle in D
    docs creates D(D-1)/2 join rows, so one boilerplate shingle with
    df=1e6 means 5e11 rows — the quadratic scale-killer. Shingles with
    df > max_df are excluded from the similarity universe on BOTH sides
    (sizes and intersections), which keeps the measure symmetric and
    well-defined: Jaccard over *discriminating* shingles. Boilerplate
    carries no dedup signal, so at a sane cap this tracks raw Jaccard
    closely while bounding per-shingle fanout at max_df^2/2. The dropped
    (hot) shingles remain auditable via
    ``inverted_index(df, min_df=max_df + 1, max_df=2**62)``.
    ``max_df=None`` restores the uncapped exact measure for small
    corpora. At large n prefer ``dedup_minhash`` (LSH candidates)."""
    # NO barrier on the raw shingles here (r12 wave 4): its only two
    # consumers are the df-cap's count leg and the probe leg, and
    # materializing the corpus-sized occurrence relation to save ONE
    # re-explode measured SLOWER than the re-explode itself (stacked
    # under the capped barrier below it was 1.15x). The capped relation
    # — smaller (hot shingles gone) and feeding THREE differently-keyed
    # legs — keeps its barrier inside
    # ``ngram_jaccard_pairs_from_shingles``. Callers that DO hold more
    # consumers of the raw explode (minhash_recall's sketch arm) pass
    # their own barriered relation through the ``_from_shingles`` seam.
    return ngram_jaccard_pairs_from_shingles(
        shingles(df, id_col, text_col, n=shingle_n),
        id_col,
        threshold=threshold,
        max_df=max_df,
    )


def ngram_jaccard_pairs_from_shingles(
    sh_raw: DataFrame,
    id_col: str,
    threshold: float = 0.5,
    max_df: int | None = 256,
) -> DataFrame:
    """``ngram_jaccard_pairs`` over a prebuilt (id, shingle) relation —
    the seam that lets callers computing shingles for OTHER purposes
    too (minhash_recall's sketch arm) share one materialization instead
    of re-exploding the corpus per arm."""
    # the capped shingle relation feeds THREE legs (sizes, join side a,
    # join side b) with different downstream keys (id vs shingle), so
    # no exchange is shared between them — without a barrier the corpus
    # is re-shingled per leg (measured r12 as part of minhash_recall's
    # 24 runtime corpus scans). Materialize it once, lazily.
    sh = _df_cap(sh_raw, "shingle", max_df).transform(lazy_checkpoint)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # sizes joins stay un-hinted: AQE broadcasts them while they fit and
    # falls back to shuffle joins at billion-doc scale
    return (
        inter.join(
            sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- canonical representative selection ---------------------------------------


def canonical_select(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    prefer_col: str = "n_chars",
) -> DataFrame:
    """Turn near-dup *pairs* into the keep/drop decision dedup actually
    executes: label clusters (transitive closure), then keep ONE
    representative per cluster — highest ``prefer_col``, ties to the
    smallest id — and flag the rest for deletion.

    Returns (id, cluster_id, cluster_size, keep) for every doc.

    Scale shape: the rank window runs ONLY on cluster members
    (|pairs|-bounded, tiny vs the corpus); untouched docs become
    keep=true singletons via a LEFT ANTI join — no window, no extra
    shuffle of the full corpus beyond that one hash anti-join.
    """
    from sarkac_spark.operators.graph import connected_components

    cc = connected_components(pairs)  # (node, component)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    members = docs.select(F.col(id_col), F.col(prefer_col)).join(
        cc, docs[id_col] == cc.node
    )
    w = Window.partitionBy("component").orderBy(
        F.col(prefer_col).desc(), F.col(id_col)
    )
    ranked = (
        members.withColumn("keep", F.row_number().over(w) == 1)
        .join(F.broadcast(sizes), "component")
        .select(
            F.col(id_col),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            "keep",
        )
    )
    singles = docs.join(
        cc.select(F.col("node").alias(id_col)), id_col, "left_anti"
    ).select(
        F.col(id_col),
        F.col(id_col).alias("cluster_id"),
        F.lit(1).cast("long").alias("cluster_size"),
        F.lit(True).alias("keep"),
    )
    return ranked.unionByName(singles)


# --- inverted index -----------------------------------------------------------


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_df: int = 2,
    max_df: int = 10,
) -> DataFrame:
    """Shingle -> sorted posting list: the candidate-generation index
    behind exact containment / plagiarism lookup (a shared shingle IS a
    dedup candidate edge).

    Returns (shingle, n_docs, postings) for shingles whose document
    frequency lies in [min_df, max_df]. The max_df cap is the scale
    guard: it bounds every posting array (head shingles — boilerplate,
    stopword runs — would otherwise collect millions of ids into one
    row; they carry no discriminating signal and belong in a bitmap
    store, not a list). df=1 shingles match nothing and are dropped.
    """
    sh = shingles(df, id_col, text_col, n)
    return (
        sh.groupBy("shingle")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("postings"),
        )
        .filter(F.col("n_docs").between(min_df, max_df))
    )


# --- span-level (paragraph) dedup ---------------------------------------------


def doc_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 10,
) -> DataFrame:
    """Fixed word-window span segmentation shared by ``span_dedup`` and
    ``hot_spans`` (one definition, so the audit sees exactly the units
    the dedup deduplicates). Map-only posexplode: (id, pos, span)."""
    words = df.select(F.col(id_col), words_col(text_col).alias("__w"))
    w = F.col("__w")
    n_spans = F.ceil(F.size(w) / F.lit(span_words)).cast("int")
    idx = F.sequence(F.lit(0), n_spans - 1)
    # materialize __w first (no CSE across the HOF boundary — see shingles)
    span = F.transform(
        idx,
        lambda i: F.array_join(F.slice(w, i * span_words + 1, span_words), " "),
    )
    return words.select(
        F.col(id_col),
        F.posexplode(
            F.when(F.size(w) > 0, span).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "span"),
    )


def paragraph_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundary: str = r"\n{2,}",
) -> DataFrame:
    """Structural-boundary span segmentation — the real-deployment
    splitter ``span_dedup``'s fixed-window mode stands in for: one row
    per non-blank boundary-delimited segment (paragraph by default),
    (id, pos, span) with ``pos`` the ordinal among kept segments.
    Map-only split + posexplode, same shape as ``doc_spans``. A doc
    with no boundary match is one span: its own trimmed text; a doc
    that is empty or all-blank emits ONE empty span — the same
    contract as window mode (``words_col('')`` yields one ``''``
    token), so switching modes never changes the output row set and
    join-backs by doc id keep every document."""
    segs = F.transform(
        F.split(F.col(text_col), boundary), lambda s: F.trim(s)
    )
    kept = F.filter(segs, lambda s: s != F.lit(""))
    kept = F.when(F.size(kept) > 0, kept).otherwise(F.array(F.lit("")))
    return df.select(
        F.col(id_col), F.posexplode(kept).alias("pos", "span")
    )


def hot_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 10,
    min_df: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """Boilerplate audit: the ``top_k`` most-duplicated spans — WHAT
    ``span_dedup`` is about to remove, before committing a 100 TB pass
    (navigation chrome, license blocks, cookie banners dominate; a
    surprise entry here usually means a scraper bug, not real text).

    One grouped count over the span shuffle (map-side combined, so the
    hot keys being audited are themselves skew-immune — same argument
    as span_dedup's first-occurrence agg) + distributed TakeOrdered
    top-k under the (span_df desc, n_docs desc, span) total order —
    deterministic, no global sort materialized.

    Output: (span, span_df, n_docs) — total occurrences and distinct
    docs touched."""
    spans = doc_spans(df, id_col, text_col, span_words)
    counts = spans.groupBy("span").agg(
        F.count(F.lit(1)).alias("span_df"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    return (
        counts.filter(F.col("span_df") >= min_df)
        .orderBy(F.col("span_df").desc(), F.col("n_docs").desc(), F.col("span"))
        .limit(top_k)
    )


def dup_ngram_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_df: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document cross-corpus duplicate n-gram fraction — the
    RefinedWeb/Dolma quality signal that catches *partially* templated
    documents (a page that is 60% navigation chrome around 40% unique
    text is invisible to doc-level dedup and to within-doc repetition
    features alike): the share of a doc's n-gram OCCURRENCES whose
    n-gram appears in >= ``min_df`` distinct documents.

    Output: (id, n_ngrams, n_dup, dup_frac) — one row per doc with at
    least one n-gram; dup_frac in [0, 1], filter-ready (e.g. drop
    docs with dup_frac > 0.6).

    Scale shape: occurrences collapse to (doc, gram, cnt) first (one
    shuffle, map-side combined), the gram document-frequency relation
    derives from THAT (second map-side-combined agg, |distinct grams|
    rows), joins back on the gram key (per-occurrence fanout is exactly
    1 — linear, no hot-key hazard regardless of how duplicated a gram
    is), and the per-doc roll-up is the third and last shuffle. No
    all-pairs structure anywhere: cost is O(corpus n-gram occurrences)
    at any duplication level — this is the audit you can afford corpus-
    wide even when pairwise dedup needs banding.
    """
    words = df.select(F.col(id_col), words_col(text_col).alias("__w"))
    w = F.col("__w")
    idx = F.sequence(F.lit(0), F.size(w) - n)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(w, i + 1, n), " "))
    occ = words.select(
        F.col(id_col),
        F.explode(
            F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))
        ).alias("__g"),
    )
    # barrier: ``per_doc_gram`` feeds the gram-df agg AND the join-back
    # — without it the corpus n-gram explode re-ran per leg (r12)
    per_doc_gram = (
        occ.groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .transform(lazy_checkpoint)
    )
    gram_df = per_doc_gram.groupBy("__g").agg(F.count(F.lit(1)).alias("__df"))
    return (
        per_doc_gram.join(gram_df, "__g")
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_ngrams"),
            F.sum(
                F.when(F.col("__df") >= min_df, F.col("__cnt")).otherwise(F.lit(0))
            ).alias("n_dup"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("n_dup") / F.col("n_ngrams"), round_digits),
        )
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_words: int = 12,
    min_doc_df: int = 2,
    words_df: DataFrame | None = None,
) -> DataFrame:
    """MAXIMAL cross-corpus duplicated substrings per document — the
    exact-substring-dedup evidence pass (the "remove any substring
    repeated verbatim across the corpus" family, Lee et al. 2022):
    rolling word ``k``-grams that appear in >= ``min_doc_df`` DISTINCT
    documents are merged, where consecutive in a doc, into maximal runs
    (gaps-and-islands: position minus per-doc rank is constant within a
    run), and runs spanning >= ``min_words`` words are reported as
    (id, span_start, span_words), word-indexed. Complements the two
    existing members: ``span_dedup`` sees only FIXED non-overlapping
    windows (a duplicated region straddling a boundary is invisible),
    ``dup_ngram_fraction`` reports a per-doc share without positions.
    This one localizes the verbatim region so a removal/masking pass
    knows exactly what to cut.

    Scale shape: occurrences collapse to (gram-hash -> distinct-doc df)
    with map-side combine (shuffle 1); duplicated positions come from a
    join back on the gram hash with per-occurrence fanout exactly 1
    (shuffle 2 — no hot-key hazard however duplicated a gram is); the
    run merge is a doc-partitioned window + grouped agg over ONLY the
    duplicated positions (shuffle 3, usually a small fraction of the
    corpus). No all-pairs structure at any duplication level. Gram
    identity is the house 15-hex md5 prefix (``span_dedup``'s rule), so
    the DuckDB oracle hashes identically.

    ``words_df``: a prebuilt ``(id_col, __w)`` relation to use instead
    of splitting ``text_col`` here — callers that already hold the
    words array (the removal pass) share one corpus split/scan."""
    words = (
        words_df.select(F.col(id_col), "__w")
        if words_df is not None
        else df.select(F.col(id_col), words_col(text_col).alias("__w"))
    )
    # barrier: ``occ`` feeds the duplicated-gram df agg AND the
    # position join-back — without it the posexplode + md5 pass re-ran
    # per leg (r12)
    occ = _gram_occ(words, id_col, k).transform(lazy_checkpoint)
    dup = (
        occ.groupBy("__gh")
        .agg(F.count_distinct(F.col(id_col)).alias("__ddf"))
        .filter(F.col("__ddf") >= min_doc_df)
        .select("__gh")
    )
    hits = occ.join(dup, "__gh").select(id_col, "pos")
    return _runs_from_hits(hits, id_col, k, min_words)


def _gram_occ(words: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id, pos, __gh) rolling word ``k``-gram occurrence relation from
    a ``(id_col, __w)`` words relation — ``duplicate_spans``'s explode,
    shared by the restricted fixed-point pass (which rebuilds it for
    touched docs only)."""
    w = F.col("__w")
    idx = F.sequence(F.lit(0), F.size(w) - k)
    gram_hashes = F.transform(
        idx,
        lambda i: F.substring(
            F.md5(F.array_join(F.slice(w, i + 1, k), " ")), 1, 15
        ),
    )
    return words.select(
        F.col(id_col),
        F.posexplode(
            F.when(F.size(w) >= k, gram_hashes).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("pos", "__gh"),
    )


def _runs_from_hits(
    hits: DataFrame, id_col: str, k: int, min_words: int
) -> DataFrame:
    """Gaps-and-islands merge of duplicated gram positions into maximal
    runs >= ``min_words`` — ``duplicate_spans``'s tail, shared by the
    restricted fixed-point pass."""
    rank = F.row_number().over(Window.partitionBy(id_col).orderBy("pos"))
    return (
        hits.withColumn("__grp", F.col("pos") - rank)
        .groupBy(id_col, "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + k).alias("span_words"),
        )
        .filter(F.col("span_words") >= min_words)
        .select(id_col, "span_start", "span_words")
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_words: int = 12,
    min_doc_df: int = 2,
    mask_token: str | None = None,
) -> DataFrame:
    """The removal consumer of ``duplicate_spans`` (Lee et al. 2022
    practice: don't just LOCATE verbatim cross-corpus regions — CUT
    them and re-emit the cleaned corpus). Every word position covered
    by a qualifying span (>= ``min_words`` words, grams shared by >=
    ``min_doc_df`` docs) is excised; the survivors are re-joined in
    order. Returns (id, text_clean, n_removed), word-indexed — a doc
    whose every word was duplicated keeps an empty ``text_clean``.

    Note the single-pass contract: excision can butt previously
    non-adjacent words together, so a RE-RUN of ``duplicate_spans`` on
    the cleaned corpus can in principle surface new (boundary-crossing)
    runs — ``remove_duplicate_spans_fp`` iterates to that fixed point
    when it matters. What one pass guarantees exactly: no word of any
    reported span survives.

    ``mask_token``: instead of excising, replace each covered word with
    the token — word COUNT and offsets are preserved, so downstream
    position-indexed metadata (span labels, alignment anchors) stays
    valid; excision (the default) is the Lee-et-al corpus-cleaning
    shape. Masking cannot butt words together, but runs of the mask
    token are themselves shared across cleaned docs — don't feed a
    masked corpus back into a dedup pass without dropping the token.

    Docs with NO qualifying span pass through byte-identical (original
    ``text_col``, rebuild skipped) — only spanned docs are re-joined,
    which normalizes their whitespace to single spaces. At corpus scale
    the untouched majority therefore costs no HOF work and diffs clean
    against the input.

    Scale shape: ``duplicate_spans``'s three bounded shuffles, plus one
    doc-keyed grouped agg over ONLY the qualifying spans (a small
    fraction of the corpus) and one left join back on the doc id —
    span lists are per-doc tiny, so no skew hazard. The rebuild is
    map-side JVM higher-order functions (filter/exists/transform/
    array_join) over the words array: no Python stage, no explode of
    the corpus itself. The words relation is split ONCE behind a
    materialization barrier and shared by the span-locating leg (via
    ``duplicate_spans``'s ``words_df``) and the rebuild leg — one
    corpus scan + split instead of two (r12)."""
    words = df.select(
        F.col(id_col), F.col(text_col), words_col(text_col).alias("__w")
    ).transform(lazy_checkpoint)
    spans = duplicate_spans(
        df, id_col, text_col, k, min_words, min_doc_df, words_df=words
    )
    return _span_removal_select(
        words.join(_spans_per_doc(spans, id_col), id_col, "left"),
        id_col,
        text_col,
        mask_token,
    )


def _spans_per_doc(spans: DataFrame, id_col: str) -> DataFrame:
    """(id, __spans: array<struct<s,n>>) per-doc span lists from a
    ``duplicate_spans``-shaped relation."""
    return spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_words").alias("n")
            )
        ).alias("__spans")
    )


def _span_removal_select(
    joined: DataFrame,
    id_col: str,
    text_col: str,
    mask_token: str | None,
) -> DataFrame:
    """Final projection of the removal pass over a relation holding
    ``(id_col, text_col, __w, __spans)`` — ``remove_duplicate_spans``'s
    rebuild, shared by the restricted fixed-point pass (which feeds it
    a CONDITIONAL ``__w``, split only for spanned docs)."""
    w = F.col("__w")
    # docs with no qualifying spans take the pass-through branch below;
    # the coalesce keeps the HOF lambdas null-safe regardless of branch
    # evaluation order (an empty array<string> cast to array<struct> is
    # illegal, hence the typed one-element zero span)
    sp = F.coalesce(
        F.col("__spans"),
        F.array(F.struct(F.lit(0).alias("s"), F.lit(0).alias("n"))),
    )
    idx = F.when(
        F.size(w) > 0, F.sequence(F.lit(0), F.size(w) - 1)
    ).otherwise(F.array().cast("array<int>"))
    covered = lambda i: F.exists(  # noqa: E731
        sp, lambda s: (i >= s["s"]) & (i < s["s"] + s["n"])
    )
    kept = F.filter(idx, lambda i: ~covered(i))
    if mask_token is None:
        rebuilt = F.array_join(
            F.transform(kept, lambda i: F.element_at(w, i + 1)), " "
        )
    else:
        rebuilt = F.array_join(
            F.transform(
                idx,
                lambda i: F.when(covered(i), F.lit(mask_token)).otherwise(
                    F.element_at(w, i + 1)
                ),
            ),
            " ",
        )
    # span-free docs (the corpus majority) pass through byte-identical
    # and skip the rebuild entirely — CASE short-circuits per row in
    # codegen, so the HOF chain only runs for spanned docs
    untouched = F.col("__spans").isNull()
    return joined.select(
        F.col(id_col),
        F.when(untouched, F.col(text_col)).otherwise(rebuilt).alias(
            "text_clean"
        ),
        F.when(untouched, F.lit(0))
        .otherwise(F.size(w) - F.size(kept))
        .cast("long")
        .alias("n_removed"),
    )


def remove_duplicate_spans_fp(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_words: int = 12,
    min_doc_df: int = 2,
    max_iters: int = 3,
    restricted: bool = True,
) -> DataFrame:
    """``remove_duplicate_spans`` iterated to a fixed point (the full
    Lee et al. 2022 discipline): excision butts previously
    non-adjacent words together, which can assemble NEW qualifying
    cross-doc runs — e.g. two docs sharing a prefix and a suffix
    around different middles become identical once the middles (each
    independently duplicated elsewhere) are cut. One pass guarantees
    only "no reported span survives"; the fixed point guarantees "the
    cleaned corpus has no qualifying span at all".

    Stops when a pass removes nothing or after ``max_iters`` passes
    (each real-world pass shrinks total duplicated mass sharply, so
    2-3 passes reach the fixed point in practice — Lee et al. report
    one extra pass sufficing). Returns the same (id, text_clean,
    n_removed) schema as the single-pass operator with ``n_removed``
    summed across passes.

    Scale shape with ``restricted`` (default, r12): pass 1 is the
    single-pass operator's bounded-shuffle plan with its occurrence
    relation and full gram->doc-df aggregate kept on executor-local
    checkpoints; every LATER pass recomputes grams only for the docs
    the previous pass excised and updates the doc-df relation
    incrementally from their old/new gram SETS, instead of re-splitting
    and re-counting the whole corpus. Pass p >= 2 therefore costs the
    duplicated fraction (plus narrow scans of the materialized
    occurrence relation), not a full corpus pass — at 100 TB the fixed
    point is ~one pass + the duplicated tail, not ``max_iters`` passes.
    Result-identical to ``restricted=False`` (the literal re-run), see
    ``_restricted_span_pass`` for the equivalence argument. Each pass
    result is ``localCheckpoint``-ed to truncate lineage (same device
    as ``backfill``); the convergence probe per pass is a single-row
    aggregate — bounded driver traffic, no per-doc collect."""
    acc = df.select(
        F.col(id_col),
        F.col(text_col).alias("text_clean"),
        F.lit(0).cast("long").alias("n_removed"),
    )
    occ = gdf = prev_step = None
    for it in range(max_iters):
        cur = acc.select(F.col(id_col), F.col("text_clean").alias("__txt"))
        if not restricted:
            step = remove_duplicate_spans(
                cur, id_col, "__txt", k, min_words, min_doc_df
            )
        elif it == 0:
            # the single-pass plan, with occ (already barriered there)
            # and the UNFILTERED gram doc-df agg exposed on checkpoints
            # for the later passes' incremental update
            words = cur.select(
                F.col(id_col), F.col("__txt"), words_col("__txt").alias("__w")
            ).transform(lazy_checkpoint)
            occ = _gram_occ(
                words.select(F.col(id_col), "__w"), id_col, k
            ).transform(lazy_checkpoint)
            gdf = (
                occ.groupBy("__gh")
                .agg(F.count_distinct(F.col(id_col)).alias("__ddf"))
                .transform(lazy_checkpoint)
            )
            dup = gdf.filter(F.col("__ddf") >= min_doc_df).select("__gh")
            hits = occ.join(dup, "__gh").select(id_col, "pos")
            spans = _runs_from_hits(hits, id_col, k, min_words)
            step = _span_removal_select(
                words.join(_spans_per_doc(spans, id_col), id_col, "left"),
                id_col,
                "__txt",
                None,
            )
        else:
            step, occ, gdf = _restricted_span_pass(
                cur, prev_step, occ, gdf, id_col, k, min_words, min_doc_df
            )
        step = step.localCheckpoint(eager=True)
        prev_step = step
        removed = step.agg(F.sum("n_removed").alias("r")).first()["r"] or 0
        if removed == 0:
            break
        acc = (
            acc.select(F.col(id_col), F.col("n_removed").alias("__acc"))
            .join(step, id_col)
            .select(
                F.col(id_col),
                F.col("text_clean"),
                (F.col("__acc") + F.col("n_removed")).alias("n_removed"),
            )
        )
    return acc


def _restricted_span_pass(
    cur: DataFrame,
    prev_step: DataFrame,
    occ: DataFrame,
    gdf: DataFrame,
    id_col: str,
    k: int,
    min_words: int,
    min_doc_df: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One detection+removal pass of ``remove_duplicate_spans_fp``
    RESTRICTED to the docs that can differ from the previous pass —
    result-identical to re-running the full single-pass operator over
    ``cur``, by this argument:

    - ``occ``/``gdf`` describe the corpus BEFORE the previous pass's
      excision; ``prev_step`` (eagerly checkpointed) says which docs it
      touched (``n_removed > 0`` — every qualifying span covers >= 1
      word, so touched <=> had a span) and what their text is now.
      The current corpus's gram doc-df is then EXACTLY
      ``gdf + delta``, where ``delta(g)`` sums, over touched docs, the
      per-doc membership change in the doc's distinct gram SET (old
      from ``occ``, new from the re-split of the touched docs only) —
      untouched docs' contributions are unchanged by definition.
    - A doc untouched by the previous pass has the same gram positions,
      so its duplicated-position set can only change through grams
      whose df crossed ``min_doc_df``: downward crossings SHRINK the
      set (maximal runs were already < ``min_words``, sub-runs stay
      so — no new span), and upward crossings can only come from
      ``delta`` grams (seam grams assembled by excision). Hence every
      doc that can gain a qualifying span is either touched or holds an
      upward-crossing gram — exactly the candidate set scanned here;
      all other docs pass through byte-identical, which is also what
      the full pass does to span-free docs.

    Returns (step, occ', gdf') where occ'/gdf' describe the corpus the
    pass detected on (= ``cur``), for the next pass. Only the touched
    re-split and set-delta aggregates shuffle; everything else is
    narrow scans of the checkpointed ``occ``/``gdf``."""
    touched = prev_step.filter(F.col("n_removed") > 0)
    words_new = touched.select(
        F.col(id_col), words_col("text_clean").alias("__w")
    )
    occ_new = _gram_occ(words_new, id_col, k).transform(lazy_checkpoint)
    old_set = (
        occ.join(touched.select(id_col), id_col, "semi")
        .select(id_col, "__gh")
        .distinct()
    )
    new_set = occ_new.select(id_col, "__gh").distinct()
    # deliberately NOT barriered although three legs reference it
    # (gdf_aff, gdf_next's anti-join, ``up``): the repeated aggregation
    # is touched-sized and its occ inputs are already-materialized
    # checkpoints, so re-running it costs less than materializing it —
    # measured 3.80 vs 4.26 s min-of-5 interleaved at sf0.1 (r12 wave-5
    # probe, same lesson as the wave-4 barrier unstacking)
    delta = (
        old_set.select("__gh", F.lit(-1).alias("__d"))
        .unionByName(new_set.select("__gh", F.lit(1).alias("__d")))
        .groupBy("__gh")
        .agg(F.sum("__d").alias("__d"))
        .filter(F.col("__d") != 0)
    )
    gdf_aff = delta.join(gdf, "__gh", "left").select(
        "__gh",
        (F.coalesce(F.col("__ddf"), F.lit(0)) + F.col("__d")).alias("__ddf"),
    )
    gdf_next = (
        gdf.join(delta.select("__gh"), "__gh", "left_anti")
        .unionByName(gdf_aff.filter(F.col("__ddf") > 0))
    )
    # grams whose df crossed min_doc_df upward: only these can give an
    # UNtouched doc new duplicated positions
    up = (
        gdf_aff.filter(F.col("__ddf") >= min_doc_df)
        .join(
            gdf.filter(F.col("__ddf") >= min_doc_df).select("__gh"),
            "__gh",
            "left_anti",
        )
        .select("__gh")
    )
    occ_keep = occ.join(touched.select(id_col), id_col, "left_anti")
    neighbors = (
        occ_keep.join(up, "__gh", "semi").select(id_col).distinct()
    )
    cand_occ = occ.join(neighbors, id_col, "semi").unionByName(occ_new)
    dup = gdf_next.filter(F.col("__ddf") >= min_doc_df).select("__gh")
    hits = cand_occ.join(dup, "__gh").select(id_col, "pos")
    spans = _runs_from_hits(hits, id_col, k, min_words)
    # rebuild over the full current corpus, but split ONLY spanned docs
    # (the conditional __w short-circuits inside the row projection) —
    # the pass-through majority costs no HOF work and keeps its bytes
    joined = cur.join(_spans_per_doc(spans, id_col), id_col, "left").select(
        F.col(id_col),
        F.col("__txt"),
        F.col("__spans"),
        F.when(
            F.col("__spans").isNotNull(), words_col("__txt")
        ).alias("__w"),
    )
    step = _span_removal_select(joined, id_col, "__txt", None)
    return step, occ_keep.unionByName(occ_new), gdf_next


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 10,
    boundary: str | None = None,
    joiner: str = " ",
) -> DataFrame:
    """C4/Dolma-style sub-document dedup: drop every later occurrence of
    a repeated text span ACROSS the whole corpus, keeping only the first
    (smallest (doc, position)), then reassemble each document from its
    surviving spans.

    Exact-duplicate paragraphs — boilerplate headers, license blocks,
    navigation chrome — are the dominant repetition mode in web-scale
    training data, and document-level dedup never sees them. Real
    deployments split on structural boundaries: pass ``boundary`` (a
    split regex, e.g. ``r"\\n{2,}"`` for paragraphs) to dedup
    boundary-delimited segments via ``paragraph_spans`` and rejoin the
    survivors with ``joiner`` (use ``"\\n\\n"`` to round-trip the
    paragraph structure). Default is the fixed ``span_words``-word
    window (``doc_spans``) — same plan, different splitter.

    Scale shape: explode to one row per span (map-only), ONE shuffle on
    the span's 60-bit md5 to pick global first occurrences, one shuffle
    back on the doc id to reassemble in position order. First-occurrence
    selection is a ``min(struct(id, pos))`` grouped aggregation, NOT a
    row_number window: windows cannot be split across tasks (AQE
    skew-split only applies to joins), so a 10^6-copy boilerplate span
    would be one straggler task sorting 10^6 rows. The aggregation gets
    map-side partial combine — every mapper collapses its copies of the
    hot span to ONE row before the shuffle, so the reducer sees
    ~#mappers rows per span regardless of corpus-wide df: skew-immune
    by construction, O(D) not O(D log D), and the hot key never meets
    a sort or a self-join.

    Returns (id, text_dedup, n_spans, n_kept); documents whose every
    span was a later duplicate keep an empty text_dedup.
    """
    # barrier: ``spans`` feeds the first-occurrence agg AND the per-doc
    # totals — without it the span explode re-ran per leg (r12)
    spans = (
        paragraph_spans(df, id_col, text_col, boundary)
        if boundary is not None
        else doc_spans(df, id_col, text_col, span_words)
    ).transform(lazy_checkpoint)
    # span joins the hash in the grouping key: the 60-bit prefix is only
    # a shuffle-narrowing key, so a hash collision between distinct spans
    # lands them in distinct groups instead of silently dropping one.
    # min over struct(id, pos) is the global first occurrence ((id, pos)
    # is a total order — ties impossible).
    kept = (
        spans.withColumn("__h", _h60(F.col("span")))
        .groupBy("__h", "span")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first"))
        .select(
            F.col(f"__first.{id_col}").alias(id_col),
            F.col("__first.pos").alias("pos"),
            F.col("span"),
        )
    )
    totals = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("span")))
                    ),
                    lambda s: s.getField("span"),
                ),
                joiner,
            ).alias("text_dedup"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
            "n_spans",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``k``-gram, slide
    a window of ``w`` consecutive hashes, keep each window's minimum.
    The guarantee that makes it the local-overlap detector (vs MinHash's
    whole-document similarity): any shared word run of at least
    ``w + k - 1`` words produces at least one shared fingerprint, while
    the fingerprint set stays ~``2/(w+1)`` of the gram count — a bounded
    sample with a coverage proof, not a random one.

    Map-only per document: grams, hashes, and window minima are JVM
    higher-order functions over arrays materialized stage-by-stage (the
    ``shingles`` lesson: expressions referenced inside a lambda are
    re-evaluated per element, so each array lands in its own projection
    before the next HOF consumes it). Docs with fewer than ``w`` grams
    keep their single global minimum; sub-``k``-word docs emit nothing.

    Output: (id, fp) — distinct selected hash values per document.
    """
    words = df.select(F.col(id_col), words_col(text_col).alias("__w"))
    wc = F.col("__w")
    gidx = F.sequence(F.lit(0), F.size(wc) - k)
    grams = F.transform(gidx, lambda i: F.array_join(F.slice(wc, i + 1, k), " "))
    gsafe = F.when(F.size(wc) >= k, grams).otherwise(
        F.array().cast("array<string>")
    )
    g = words.select(F.col(id_col), gsafe.alias("__g"))
    h = g.select(
        F.col(id_col), F.transform(F.col("__g"), _h60).alias("__h")
    )
    hc = F.col("__h")
    n = F.size(hc)
    widx = F.sequence(F.lit(0), n - w)
    mins = F.transform(widx, lambda j: F.array_min(F.slice(hc, j + 1, w)))
    fp = (
        F.when(n >= w, F.array_distinct(mins))
        .when(n > 0, F.array(F.array_min(hc)))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return h.select(F.col(id_col), F.explode(fp).alias("fp"))


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 256,
) -> DataFrame:
    """Local-overlap candidate pairs from winnowing fingerprints: docs
    sharing >= ``min_shared`` selected hashes — the plagiarism / quote /
    boilerplate-overlap detector that fires on a single long shared
    passage even when whole-document similarity is low (where
    ``dedup_minhash`` would not band it).

    Same scale discipline as ``ngram_jaccard_pairs``: the self-join runs
    over the winnowed relation (already ~2/(w+1) the gram count) with
    the ``max_df`` hot-fingerprint cap bounding per-key fanout at
    max_df^2/2 via the shared ``_df_cap`` exchange-reusing semi-join
    (no unsplittable window task — see its docstring).

    Output: (id_a, id_b, n_shared), id_a < id_b.
    """
    # two materialization barriers (r12): raw fingerprints feed the
    # df-cap's count + probe legs (unshared exchanges), and the capped
    # relation feeds both self-join sides — without them the HOF-heavy
    # winnow pass (md5 per gram + window minima) ran up to 6x at
    # runtime for one query.
    raw = winnow_fingerprints(df, id_col, text_col, k=k, w=w).localCheckpoint(
        eager=False
    )
    fps = _df_cap(raw, "fp", max_df).transform(lazy_checkpoint)
    a = fps.withColumnRenamed(id_col, "id_a")
    b = fps.withColumnRenamed(id_col, "id_b")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def incremental_exact_dedup(
    new_df: DataFrame,
    seen_hashes: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Ingest-time exact dedup of a NEW batch against the corpus already
    on disk — the operational shape at 100 TB, where re-deduping the
    whole corpus per ingest is a non-starter: cost scales with the
    batch, not the corpus. ``seen_hashes`` is the stored fingerprint
    relation (one ``text_hash`` column, the md5 digests of everything
    kept so far — the output of ``dedup_exact`` is exactly this shape).

    Keeps a new row iff (a) its digest is unseen in the corpus
    AND (b) it is the first occurrence within the batch itself
    (min-id per digest). The kept rows' (text_hash, id) is the delta to
    append to the fingerprint store for the next ingest.

    Join shape (the per-trigger 100 TB term): a direct
    ``batch ANTI corpus`` must build on the CORPUS side — too big to
    broadcast, so it SHUFFLES the whole fingerprint store every
    trigger. Instead the membership test runs corpus-side first:
    ``hits = corpus SEMI batch-digests`` (batch side broadcasts in the
    streaming regime — the store is scanned map-side, one pruned
    column, zero store shuffle) and the batch then anti-joins the
    batch-sized ``hits``. In the backfill regime (batch comparable to
    the store) AQE falls back to shuffle joins — same cost class as
    the direct form. Result-identical: hits = seen ∩ batch, and
    dropping batch rows whose digest is in (seen ∩ batch) == dropping
    those whose digest is in seen.

    Output: new_df columns + text_hash, batch-first + corpus-unseen
    rows only.
    """
    hashed = new_df.withColumn("text_hash", F.md5(F.col(text_col)))
    hits = seen_hashes.select("text_hash").join(
        hashed.select("text_hash").distinct(), "text_hash", "left_semi"
    )
    unseen = hashed.join(hits, "text_hash", "left_anti")
    first = Window.partitionBy("text_hash").orderBy(F.col(id_col))
    return (
        unseen.withColumn("__rn", F.row_number().over(first))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_minhash_incremental(
    df: DataFrame,
    id_col: str,
    text_col: str,
    new_col: str,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_band_df: int | None = MINHASH_MAX_BAND_DF,
) -> DataFrame:
    """Near-dup pairs INVOLVING the new batch only: band keys of the new
    rows equi-join the whole corpus's band keys, so old-old pairs are
    never generated — per-ingest candidate work is O(|batch| x bucket
    occupancy) instead of the full corpus's pair volume. (In a deployed
    pipeline the corpus side's signatures and shingle-hash sets are the
    stored relation; here they derive from ``df`` in the same pass.)

    ``new_col`` is a boolean column on ``df`` marking the batch. Output
    matches ``dedup_minhash``: (id_a, id_b, jaccard >= threshold) with
    id_a < id_b, restricted to pairs where at least one side is new.

    ``max_band_df`` (on by default) caps band df over the FULL corpus∪batch
    banded relation before the corpus×new join — a hot band's fanout is
    corpus_df × batch_df, unbounded in the corpus dimension without it.
    See MINHASH_MAX_BAND_DF; hot bands audit via ``minhash_hot_bands``.

    PRECONDITION: batch and corpus ids are DISJOINT. A shared id makes
    the groupBy(id_col) merge the two documents' shingle sets and
    duplicates the ``new_col`` flag join rows, silently corrupting pair
    flags and drop decisions downstream. Enforce at ingest (e.g.
    monotonically increasing ids, or Curator.report()'s anti-join guard).
    """
    hashed = _hashed_shingles(df, id_col, text_col, shingle_n)
    flags = df.select(F.col(id_col), F.col(new_col).alias("__new"))
    # same three-leg reuse as dedup_minhash (band keys / set_a / set_b):
    # materialize the doc aggregate once instead of re-deriving the
    # shingle explode per pruned leg — see dedup_minhash for the
    # ReuseExchange-doesn't-fire-across-prunings rationale.
    doc = (
        hashed.groupBy(id_col)
        .agg(*_minhash_aggs(k), F.collect_set("h60").alias("__sh_set"))
        .join(flags, id_col)
        .transform(lazy_checkpoint)
    )
    band_keys = _band_keys_expr(k, bands)
    banded = _cap_band_df(
        doc.select(
            F.col(id_col), F.col("__new"), F.explode(band_keys).alias("band_key")
        ),
        max_band_df,
    )
    corpus_side = banded.alias("a")
    new_side = banded.filter(F.col("__new")).alias("b")
    cands = (
        corpus_side.join(new_side, "band_key")
        .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        )
        .distinct()
    )
    sets_a = doc.select(F.col(id_col).alias("id_a"), F.col("__sh_set").alias("__set_a"))
    sets_b = doc.select(F.col(id_col).alias("id_b"), F.col("__sh_set").alias("__set_b"))
    inter = F.size(F.array_intersect(F.col("__set_a"), F.col("__set_b")))
    return (
        cands.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .withColumn("__n_common", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("__n_common")
                / (
                    F.size(F.col("__set_a"))
                    + F.size(F.col("__set_b"))
                    - F.col("__n_common")
                ),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def row_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_sh_set: int | None = None,
) -> DataFrame:
    """``dedup_signatures`` computed PER ROW — higher-order functions
    only, no groupBy — so it is legal on an unaggregated STREAM (the
    stateless front half of ``streaming/stateful_ingest_dedup``; a groupBy on
    a stream would be a stateful aggregation, not a projection).

    Value-identical to ``dedup_signatures`` by construction (pinned by
    ``test_row_signatures_match_dedup_signatures``): same shingle
    grammar, same ``_h60`` md5-prefix hash, same LCG minhash family,
    same band-key format — the per-shingle groupBy aggregation is just
    replaced by ``transform``/``array_min`` over the row's own shingle
    array. ``sh_set`` comes out SORTED (the batch ``collect_set`` is
    unordered; every consumer treats it as a set).

    Scale shape: ~k integer passes over each doc's shingle array, all
    inside whole-stage codegen; the words and shingle arrays are
    materialized in their own projections first (the ``shingles()``
    CSE-boundary lesson — an expression referenced inside a lambda is
    re-evaluated per element).
    """
    w = F.col("__w")
    staged = df.withColumn("__w", words_col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - shingle_n),
        lambda i: F.array_join(F.slice(w, i + 1, shingle_n), " "),
    )
    staged = staged.withColumn(
        "__sh",
        F.when(F.size(w) >= shingle_n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        ),
    )
    staged = staged.withColumn(
        "__h60", F.array_distinct(F.transform(F.col("__sh"), _h60))
    ).withColumn(
        "__hmod", F.transform(F.col("__h60"), lambda x: x % MINHASH_P)
    )
    def _mh(i: int) -> F.Column:
        # a closure factory, NOT `lambda x, i=i`: pyspark passes a
        # second (index) Column to any 2-parameter HOF lambda
        a, b = _LCG_A[i] % MINHASH_P, _LCG_B[i] % MINHASH_P
        return F.array_min(
            F.transform(
                F.col("__hmod"), lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P
            )
        )

    mh_cols = {f"mh_{i}": _mh(i) for i in range(k)}
    staged = staged.withColumns(mh_cols)
    sh_set = F.array_sort(F.col("__h60"))
    if max_sh_set is not None:
        sh_set = F.slice(sh_set, 1, int(max_sh_set))
    empty_str = F.array().cast("array<string>")
    return staged.select(
        *[F.col(c) for c in df.columns],
        F.md5(F.col(text_col)).alias("text_hash"),
        F.when(F.col("mh_0").isNull(), empty_str)
        .otherwise(_band_keys_expr(k, bands))
        .alias("band_keys"),
        sh_set.alias("sh_set"),
    )


def dedup_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_sh_set: int | None = None,
) -> DataFrame:
    """The per-doc DEDUP SIGNATURE relation — everything ingest-time
    dedup ever needs from a committed document, with the text left
    behind: (id, text_hash, band_keys array<string>, sh_set
    array<long>).

    What persisting this buys, honestly sized: the per-trigger CPU that
    disappears is the re-shingle/re-hash/re-minhash of the corpus —
    O(corpus text) work every trigger. Scan bytes are columnar: the
    banded candidate leg reads only (id, band_keys) — k hashes per doc,
    a tiny fraction of store bytes — while the ``sh_set`` column (the
    exact-jaccard verify side) is the same ORDER as the text itself
    (one 8-byte hash per distinct shingle ≈ per word), read only by the
    verify leg's join.

    ``max_sh_set`` is the 100 TB knob for that column: keep only the
    ``max_sh_set`` SMALLEST shingle hashes per doc (a bottom-k sketch —
    deterministic, order-free, oracle-replayable as sort+slice).
    Consumers must then verify with the union-bottom-k estimator
    (``incremental_minhash_drop_ids_sigs(max_sh_set=...)``): membership
    -in-both over the k smallest of A∪B, which is exact whenever
    |A∪B| <= k and unbiased otherwise — NOT naive
    intersection-over-union of the truncated sets, which clips the two
    tails independently and is biased for docs above the cap. None
    (default) keeps the exact sets, matching the text-side batch
    operators bit-for-bit.

    Docs shorter than ``shingle_n`` words have no shingles, hence empty
    ``band_keys``/``sh_set`` (they can never near-dup-pair, exactly as
    in the text-side operators where the shingle groupBy drops them);
    ``text_hash`` still covers them for exact dedup.
    """
    hashed = _hashed_shingles(df, id_col, text_col, shingle_n)
    sh_agg = F.collect_set("h60")
    if max_sh_set is not None:
        sh_agg = F.slice(F.array_sort(sh_agg), 1, int(max_sh_set))
    doc = hashed.groupBy(id_col).agg(
        *_minhash_aggs(k), sh_agg.alias("sh_set")
    )
    empty_str = F.array().cast("array<string>")
    empty_long = F.array().cast("array<long>")
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .join(doc, id_col, "left")
        .select(
            F.col(id_col),
            F.col("text_hash"),
            F.when(F.col("mh_0").isNull(), empty_str)
            .otherwise(_band_keys_expr(k, bands))
            .alias("band_keys"),
            F.coalesce(F.col("sh_set"), empty_long).alias("sh_set"),
        )
    )


def incremental_minhash_drop_ids_sigs(
    corpus_sigs: DataFrame | None,
    batch_sigs: DataFrame,
    id_col: str,
    threshold: float = 0.5,
    max_band_df: int | None = MINHASH_MAX_BAND_DF,
    max_sh_set: int | None = None,
) -> DataFrame:
    """``incremental_minhash_drop_ids`` over MATERIALIZED signature
    relations (``dedup_signatures`` shape) — the per-trigger scan is the
    signature store, never the corpus text. Semantics are identical by
    construction: same banded relation (exploded ``band_keys``), same
    union-wide band-df cap, same corpus×batch-only candidate join, same
    rounded-jaccard verify against ``sh_set``, same corpus-never-loses /
    lower-batch-id-wins drop rule. Same id-disjointness PRECONDITION.

    ``max_sh_set`` MUST match the value the signatures were built with.
    When set, ``sh_set`` columns are bottom-k truncations, and the
    verify step switches to the standard union-bottom-k estimator:
    membership-in-both over the k smallest of A∪B. That statistic is
    computable EXACTLY from the two truncated sets — any element among
    the k smallest of the union ranks ≤ k in whichever source set holds
    it, so it survived that side's truncation — unlike the naive
    ``|A∩B| / (|A|+|B|-|A∩B|)`` over truncated sets, which intersects
    two independently clipped tails and is biased for docs larger than
    the cap. With ``None`` (exact sets) the exact formula is used.

    ``corpus_sigs=None`` (empty corpus) dedups the batch against itself
    only. One-column output (``id_col``), distinct: batch ids to drop.

    Per-trigger 100 TB shape (the BENCH_STREAM_DECADE measurement):
    the corpus participates through (a) its banded relation REDUCED to
    the bands the batch actually touches — a map-side semi-join against
    the batch's band-key set (broadcast in the streaming regime), so
    the band-df cap and the candidate join aggregate/shuffle only
    O(batch x band-df) rows, never the 4N-row corpus banded relation —
    and (b) a column-pruned (id, sh_set) scan feeding the verify join,
    which AQE broadcasts the (batch-sized) candidate side of. The df
    cap is result-identical under the reduction: for any band the batch
    carries, EVERY corpus row of that band is in the reduced relation
    (same df); bands the batch lacks produce no candidates in either
    formulation. New/old flags come from batch-id membership (ids are
    disjoint by precondition), not an O(corpus) flag join.
    """
    cols = [F.col(id_col), "band_keys", "sh_set"]
    new_banded = batch_sigs.select(
        F.col(id_col), F.explode("band_keys").alias("band_key")
    ).withColumn("__new", F.lit(True))
    if corpus_sigs is None:
        combined = batch_sigs.select(*cols).withColumn("__new", F.lit(True))
        banded_raw = new_banded
    else:
        combined = (
            corpus_sigs.select(*cols)
            .withColumn("__new", F.lit(False))
            .unionByName(batch_sigs.select(*cols).withColumn("__new", F.lit(True)))
        )
        corpus_banded = corpus_sigs.select(
            F.col(id_col), F.explode("band_keys").alias("band_key")
        ).withColumn("__new", F.lit(False))
        touched = corpus_banded.join(
            new_banded.select("band_key").distinct(), "band_key", "left_semi"
        )
        banded_raw = touched.unionByName(new_banded)
    banded = _cap_band_df(banded_raw, max_band_df)
    corpus_side = banded.alias("a")
    new_side = banded.filter(F.col("__new")).alias("b")
    cands = (
        corpus_side.join(new_side, "band_key")
        .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        )
        .distinct()
    )
    sets_a = combined.select(
        F.col(id_col).alias("id_a"), F.col("sh_set").alias("__set_a")
    )
    sets_b = combined.select(
        F.col(id_col).alias("id_b"), F.col("sh_set").alias("__set_b")
    )
    if max_sh_set is None:
        inter = F.size(F.array_intersect(F.col("__set_a"), F.col("__set_b")))
        jac = F.round(
            inter
            / (F.size(F.col("__set_a")) + F.size(F.col("__set_b")) - inter),
            6,
        )
    else:
        # union-bottom-k: k smallest of A∪B (exactly recoverable from
        # the truncated inputs — see docstring), jaccard ≈ fraction of
        # those present in BOTH sets. Empty union (two no-shingle docs)
        # can't band-pair, so size(u) > 0 on every candidate row.
        u = F.slice(
            F.array_sort(F.array_union(F.col("__set_a"), F.col("__set_b"))),
            1,
            int(max_sh_set),
        )
        both = F.array_intersect(F.col("__set_a"), F.col("__set_b"))
        jac = F.round(F.size(F.array_intersect(u, both)) / F.size(u), 6)
    pairs = (
        cands.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )
    # new/old flags by BATCH-id membership (ids disjoint by
    # precondition) — left joins against the batch-sized id relation,
    # never an O(corpus) flag join
    batch_a = batch_sigs.select(
        F.col(id_col).alias("id_a"), F.lit(True).alias("__new_a")
    )
    batch_b = batch_sigs.select(
        F.col(id_col).alias("id_b"), F.lit(True).alias("__new_b")
    )
    sided = (
        pairs.join(batch_a, "id_a", "left")
        .join(batch_b, "id_b", "left")
        .withColumn("__new_a", F.coalesce(F.col("__new_a"), F.lit(False)))
        .withColumn("__new_b", F.coalesce(F.col("__new_b"), F.lit(False)))
    )
    return (
        sided.select(
            F.when(F.col("__new_a") & ~F.col("__new_b"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias(id_col)
        ).distinct()
    )


def incremental_minhash_drop_ids(
    combined: DataFrame,
    id_col: str,
    text_col: str,
    new_col: str = "__new",
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_band_df: int | None = MINHASH_MAX_BAND_DF,
) -> DataFrame:
    """Batch ids to DROP, given the combined corpus∪batch relation
    (``new_col`` marks batch rows): committed corpus rows never lose —
    a batch row is dropped when it near-dup-pairs with a corpus row
    (either side of the ordered pair) or with a LOWER-id batch mate.
    One-column output (``id_col``), distinct.

    This is the drop-decision half of ingest-time near-dedup, shared by
    the ``Curator`` incremental stage and
    ``streaming/incremental_dedup.IncrementalDedupPipeline`` so both
    paths cannot diverge. Same PRECONDITION as
    ``dedup_minhash_incremental``: batch and corpus ids are disjoint.

    Implemented by signing both sides (``dedup_signatures``) and
    delegating to ``incremental_minhash_drop_ids_sigs`` — ONE candidate
    /verify/drop implementation whether the corpus arrives as text or
    as its materialized signature store.
    """
    corpus_sigs = dedup_signatures(
        combined.filter(~F.col(new_col)), id_col, text_col, k, bands, shingle_n
    )
    batch_sigs = dedup_signatures(
        combined.filter(F.col(new_col)), id_col, text_col, k, bands, shingle_n
    )
    return incremental_minhash_drop_ids_sigs(
        corpus_sigs, batch_sigs, id_col, threshold=threshold, max_band_df=max_band_df
    )

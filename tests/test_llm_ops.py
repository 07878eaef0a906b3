"""Dedup / similarity / text / multimodal operator tests on controlled
inputs (planted duplicates, known vectors)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sarkac_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash,
    dedup_simhash,
    ngram_jaccard_pairs,
    shingles,
)
from sarkac_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    media_metadata,
    payload_stats,
)
from sarkac_spark.operators.similarity import cosine, cosine_topk, ivf_topk
from sarkac_spark.operators.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)

BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the old river bank yesterday"
OTHER = "completely different words about spark query engines and distributed joins"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER)], "doc_id long, text string"
    )


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "a b c d")], "doc_id long, text string")
    got = shingles(df, "doc_id", "text").collect()
    assert {r.doc_id for r in got} == {2}  # <3 words -> no shingles, no error
    assert {r.shingle for r in got} == {"a b c", "b c d"}


def test_dedup_exact(docs):
    groups = dedup_exact(docs, "doc_id", "text").filter(F.col("n_dups") > 1).collect()
    assert len(groups) == 1
    assert groups[0].canonical_id == 1 and groups[0].n_dups == 2


def test_dedup_minhash_finds_near_dup(docs):
    pairs = {(r.id_a, r.id_b) for r in dedup_minhash(docs, "doc_id", "text", threshold=0.5).collect()}
    assert (1, 2) in pairs  # exact dup: jaccard 1.0
    assert (1, 3) in pairs and (2, 3) in pairs  # near dup
    assert not any(4 in p for p in pairs)  # unrelated doc untouched


def test_ngram_jaccard_values(docs):
    rows = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.1).collect()}
    assert rows[(1, 2)] == 1.0
    assert 0.5 < rows[(1, 3)] < 1.0


def test_ngram_jaccard_max_df_guard(spark):
    """One planted hot shingle shared by every doc must not create the
    quadratic all-pairs clique: with the df cap it drops out of the
    similarity universe; the genuine near-dup pair still scores 1.0."""
    boiler = "subscribe to our newsletter"
    rows = [(i, f"{boiler} unique{i} a b") for i in range(20)]
    rows.append((100, "real duplicate text body here"))
    rows.append((101, "real duplicate text body here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.1, max_df=10
        ).collect()
    }
    assert capped == {(100, 101): 1.0}

    # uncapped exact mode still produces the boilerplate clique
    uncapped = ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.1, max_df=None
    ).count()
    assert uncapped > 100


def test_minhash_planted_hot_band(spark):
    """Hot-band guard (VERDICT round 5, item 1): a degenerate band shared
    by D docs yields D(D-1)/2 rows from the band self-join — the same
    quadratic scale-killer ngram_jaccard_pairs caps. Plant 200 identical
    boilerplate docs (every band key df=200) plus one genuine duplicate
    pair: with the cap the clique produces ZERO candidates (bounded
    fanout), the real pair still pairs at jaccard 1.0, and the dropped
    bands stay auditable via minhash_hot_bands; max_band_df=None
    restores the uncapped clique."""
    from sarkac_spark.operators.dedup import (
        _hashed_shingles,
        _minhash_aggs,
        minhash_hot_bands,
        minhash_lsh_candidates,
    )

    n = 200
    boiler = "subscribe to our newsletter for daily updates and offers"
    rows = [(i, boiler) for i in range(n)]
    rows += [(1000, "a genuinely unique document body"), (1001, "a genuinely unique document body")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup_minhash(df, "doc_id", "text", threshold=0.5, max_band_df=50)
    got = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
    assert got == {(1000, 1001): 1.0}  # clique gone, real pair intact

    sigs = (
        _hashed_shingles(df, "doc_id", "text", 3)
        .groupBy("doc_id")
        .agg(*_minhash_aggs(16))
    )
    # bounded fanout: candidate count is 1 with the cap, the full
    # D(D-1)/2 clique without it
    assert minhash_lsh_candidates(sigs, "doc_id", max_band_df=50).count() == 1
    assert (
        minhash_lsh_candidates(sigs, "doc_id", max_band_df=None).count()
        == n * (n - 1) // 2 + 1
    )

    # the dropped bands are auditable: 4 hot band keys (one per band),
    # each df=200, canonical = min doc_id of the bucket
    hot = minhash_hot_bands(sigs, "doc_id", max_band_df=50).collect()
    assert len(hot) == 4
    assert all(r.band_df == n and r.canonical_id == 0 for r in hot)

    # guard disabled -> nothing was excluded -> the audit is EMPTY (not
    # every band in the corpus)
    assert minhash_hot_bands(sigs, "doc_id", max_band_df=None).count() == 0


def test_incremental_minhash_hot_band_capped(spark):
    """The corpus x batch band join gets the same guard: a hot band's
    fanout is corpus_df x batch_df, unbounded in the corpus dimension
    without the cap over the FULL banded relation."""
    from sarkac_spark.operators.dedup import dedup_minhash_incremental

    n = 200
    boiler = "subscribe to our newsletter for daily updates and offers"
    rows = [(i, boiler, False) for i in range(n)]
    rows += [
        (1000, "a genuinely unique document body", False),
        (1001, "a genuinely unique document body", True),
        (1002, boiler, True),  # new boilerplate doc: hot band, capped out
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_new boolean")

    out = dedup_minhash_incremental(
        df, "doc_id", "text", "is_new", threshold=0.5, max_band_df=50
    )
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(1000, 1001)}

    uncapped = dedup_minhash_incremental(
        df, "doc_id", "text", "is_new", threshold=0.5, max_band_df=None
    )
    assert uncapped.count() == n + 1  # 1002 pairs all n old boiler docs + real pair


def test_ivf_bucket_stats(spark, sf_dir):
    """Index-health audit: occupancy sums to the corpus, shares to ~1,
    every bucket is a real centroid id."""
    from pyspark.sql import functions as F

    from sarkac_spark.operators.similarity import ivf_bucket_stats
    from sarkac_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    rows = ivf_bucket_stats(e, centroids).collect()
    assert sum(r.n_vecs for r in rows) == e.count()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert {r.bucket for r in rows} <= set(range(8))


def test_dedup_simhash(docs):
    pairs = {(r.id_a, r.id_b): r.hamming for r in dedup_simhash(docs, "doc_id", "text", max_hamming=10).collect()}
    assert pairs[(1, 2)] == 0  # identical text -> identical fingerprint
    assert (1, 3) in pairs  # near dup within hamming budget
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_tfidf_top_terms(spark):
    import math

    from sarkac_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "spark spark spark common"),
            (2, "duck duck common"),
            (3, "common words only"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=2).collect()
    by = {}
    for r in out:
        by.setdefault(r.doc_id, []).append(r)
    top1 = {d: sorted(rs, key=lambda r: r.rank)[0] for d, rs in by.items()}
    # the doc-specific repeated term dominates the everywhere-term
    assert top1[1].term == "spark" and top1[1].tf == 3
    assert top1[2].term == "duck"
    # smoothed idf: term in 1 of 3 docs -> ln(4/2)+1
    assert top1[1].tfidf == round(3 * (math.log(2.0) + 1), 6)
    # 'common' appears in every doc: idf = ln(4/4)+1 = 1 -> tfidf == tf
    common = [r for rs in by.values() for r in rs if r.term == "common"]
    assert all(r.tfidf == r.tf for r in common)


def test_chunk_documents(spark):
    import pytest as _pytest

    from sarkac_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [(1, words), (2, "tiny doc"), (3, "x " * 10 + "x")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_words=10, overlap=3).collect()
    by = {}
    for r in out:
        by.setdefault(r.doc_id, {})[r.chunk_id] = r
    # doc 1: 25 words, stride 7 -> starts 0,7,14,21 (21 <= 25-3-1)
    assert sorted(by[1]) == [0, 1, 2, 3]
    assert by[1][0].chunk_text.split() == [f"w{i}" for i in range(10)]
    assert by[1][1].chunk_text.split()[0] == "w7"  # overlap of 3
    assert by[1][3].n_words == 4  # tail: words 21..24
    # doc 2: shorter than one chunk -> exactly one chunk
    assert sorted(by[2]) == [0] and by[2][0].n_words == 2
    # doc 3: 11 words -> starts 0,7; tail contributes 1 new word
    assert sorted(by[3]) == [0, 1] and by[3][1].n_words == 4
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_words=5, overlap=5)


def test_connected_components(spark):
    import pytest as _pytest

    from sarkac_spark.operators.graph import connected_components

    # path 1-2-3-4 (diameter 3, exercises multi-round propagation) plus
    # the disjoint pair 10-11
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # with the fallback disabled, the guard raises instead of returning
    # partial labels
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1, star_fallback=False)
    # with the fallback (default), exceeding the round budget silently
    # restarts as star contraction and still yields exact components
    fb = {
        r.node: r.component
        for r in connected_components(edges, max_iter=1).collect()
    }
    assert fb == got


def test_skew_report(spark):
    from sarkac_spark.operators.profiling import skew_report

    # 100 rows on key "hot", 1 row each on 50 cold keys
    rows = [("hot",)] * 100 + [(f"cold{i:02d}",) for i in range(50)]
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, ["k"], top_k=3).collect()
    assert [r.key_value for r in out][0] == "hot"
    hot = out[0]
    assert hot.n_rows == 100
    assert hot.frac == round(100 / 150, 6)
    # 51 keys, uniform would be 150/51 rows/key
    assert hot.skew == round(100 * 51 / 150, 6)
    assert [r.rank for r in out] == [1, 2, 3]
    cold = out[1]
    assert cold.n_rows == 1 and cold.skew < 1


def test_repetition_features(spark):
    from sarkac_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # one word, one bigram
            (2, "buy now " * 10),  # dominant "now buy"/"buy now" bigrams
            (3, "each word here appears exactly once in this diverse sentence"),
            (4, "solo"),  # <2 words: no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_features(df).collect()}
    assert out[1].repetitive and out[1].top_bigram_frac == 1.0
    assert out[1].distinct_word_frac == round(1 / 6, 6)
    assert out[2].repetitive  # "buy now" dominates
    assert not out[3].repetitive and out[3].distinct_word_frac == 1.0
    # no bigrams -> NULL frac but a real (non-NULL) flag
    assert out[4].top_bigram_frac is None and out[4].repetitive is False


def test_profile_columns(spark):
    from sarkac_spark.operators.profiling import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 10.5), (2, None, 10.5), (3, "b", None), (4, "a", 2.0)],
        "id long, s string, v double",
    )
    prof = {r.column_name: r for r in profile_columns(df).collect()}
    assert prof["id"].n_rows == 4 and prof["id"].n_null == 0
    assert prof["id"].n_distinct == 4
    assert (prof["id"].min_value, prof["id"].max_value) == ("1", "4")
    assert prof["s"].n_null == 1 and prof["s"].n_distinct == 2
    assert prof["v"].n_null == 1 and prof["v"].n_distinct == 2
    # min on the native type, not the string cast: 2.0 < 10.5
    assert prof["v"].min_value == "2.0"
    # HLL path keeps the same schema (estimates exact at this size)
    approx = {
        r.column_name: r.n_distinct
        for r in profile_columns(df, exact_distinct=False).collect()
    }
    assert approx["id"] == 4


def test_redact_pii(spark):
    from sarkac_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d+x@e.org, ssn 123-45-6789, tel 555-123-4567 at 10.0.0.1"),
            (2, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    r1 = out[1]
    assert (r1.n_email, r1.n_ssn, r1.n_phone, r1.n_ip) == (2, 1, 1, 1)
    assert r1.redacted == "mail [EMAIL] and [EMAIL], ssn [SSN], tel [PHONE] at [IP]"
    r2 = out[2]
    assert (r2.n_email, r2.n_ssn, r2.n_phone, r2.n_ip) == (0, 0, 0, 0)
    assert r2.redacted == r2.text


def test_cross_contamination(spark):
    from sarkac_spark.operators.dedup import cross_contamination

    train = spark.createDataFrame(
        [(1, BASE), (2, OTHER)], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        # 10 = leaked copy of train doc 1; 11 = clean
        [(10, BASE), (11, "totally unrelated eval prompt about nothing shared")],
        "doc_id long, text string",
    )
    out = {
        (r.eval_id, r.train_id): r.n_shared
        for r in cross_contamination(train, ev, "doc_id", "text", min_shared=3).collect()
    }
    assert set(out) == {(10, 1)}  # only the leak, only against its source
    assert out[(10, 1)] == len(BASE.split()) - 2  # every trigram shared
    # threshold excludes phrase-level coincidence
    high = cross_contamination(train, ev, "doc_id", "text", min_shared=10_000)
    assert high.count() == 0


def test_cosine_expression(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    got = [r.c for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(1.0)


def test_cosine_all_pairs_block_matrix(spark):
    from sarkac_spark.operators.similarity import cosine_all_pairs

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),  # ~cos 0.994 with 0
        (2, [0.0, 1.0]),  # orthogonal to 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_all_pairs(df, threshold=0.5).collect()
    }
    assert (0, 1) in got and got[(0, 1)] > 0.99
    assert (0, 2) not in got  # below threshold
    assert all(a < b for a, b in got)  # canonical pair order


@pytest.fixture(scope="module")
def vectors(spark):
    # 2-d unit-ish vectors at known angles; vec 0/1 near each other
    rows = []
    for i, deg in enumerate([0, 5, 90, 180, 45, 10]):
        rows.append((i, [math.cos(math.radians(deg)), math.sin(math.radians(deg))]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk(vectors):
    out = cosine_topk(vectors, vectors.filter("vec_id = 0"), k=2).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == [1, 5]


def test_ivf_topk_prunes_to_bucket(vectors):
    cents = vectors.filter("vec_id in (0, 2)").select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    out = ivf_topk(vectors, vectors.filter("vec_id = 1"), cents, k=5).collect()
    # bucket of centroid 0 holds {0,1,4,5} (within 45 deg); 90/180 deg vecs
    # fall to centroid 2's bucket and must not appear
    got = {r.neighbor_id for r in out}
    assert got == {0, 4, 5}


def test_lsh_sign_assign_shape_and_separation(vectors):
    from sarkac_spark.operators.similarity import lsh_sign_assign

    out = lsh_sign_assign(vectors, dim=2, n_bits=4, n_tables=2).collect()
    assert len(out) == 6 * 2  # n_tables rows per vector
    by_vec = {}
    for r in out:
        by_vec.setdefault(r.vec_id, {})[r.t] = r.bucket
    # deterministic across invocations
    again = lsh_sign_assign(vectors, dim=2, n_bits=4, n_tables=2).collect()
    assert {(r.vec_id, r.t, r.bucket) for r in again} == {
        (r.vec_id, r.t, r.bucket) for r in out
    }
    # 0 deg and 5 deg vectors land together in every table (no plane
    # separates them in 2-d at ±1 coefficients); 0 vs 180 deg share none
    # (every nonzero dot flips sign, so every bit flips)
    assert by_vec[0] == by_vec[1]
    assert all(by_vec[0][t] != by_vec[3][t] for t in by_vec[0])


def test_lsh_topk_candidates_and_recall(spark, sf_dir):
    from sarkac_spark.operators.similarity import lsh_topk
    from sarkac_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(e, q, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(e, q, dim=64, k=3, n_bits=4, n_tables=3).collect()
    }
    # sanity: every query produced candidates, and the approximate set
    # overlaps the exact one (deterministic corpus + hyperplanes, so a
    # fixed floor is safe; exact recall recorded by the oracle gate)
    assert {qid for qid, _ in approx} == set(range(10))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2


def test_token_counts_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "  Hello   world  "), (2, "hello world"), (3, "internationalization")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            token_count("text").alias("tc"),
            bpe_ish_token_count("text").alias("bpe"),
            doc_fingerprint("text").alias("fp"),
        ).collect()
    }
    assert rows[1].tc == 2 and rows[2].tc == 2
    assert rows[1].fp == rows[2].fp  # whitespace/case-normalized
    assert rows[3].bpe == 5  # ceil(20/4)


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [(1, "varied words every one distinct here now"), (2, "spam spam spam spam spam")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.quality_score for r in quality_score(df).collect()}
    assert 0 <= rows[2] < rows[1] <= 1


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat of the mat and it is that"),
            (2, "der hund und die katze ist ein tier von hier"),
            (3, "xyzzy qwerty plugh"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.lang_pred for r in lang_id(df, "doc_id").collect()}
    assert rows[1] == "en" and rows[2] == "de" and rows[3] == "und"


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG1234", 64, 64, None),
        (2, "video", "video/mp4", b"\x00mp4data", 640, 480, 3500),
        (3, "audio", "audio/wav", None, None, None, 2000),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )


def test_multimodal_metadata_prunes_payload(spark, media, tmp_path):
    # pruning is only observable on a real scan: the parquet ReadSchema
    # must not include the (potentially huge) payload column
    path = str(tmp_path / "media")
    media.write.parquet(path)
    plan = (
        media_metadata(spark.read.parquet(path))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "payload" not in plan


def test_payload_stats(media):
    rows = {r.media_id: r for r in payload_stats(media).collect()}
    assert rows[1].n_bytes == 8
    assert rows[1].head_hex.startswith("89504e47")  # PNG magic
    assert rows[3].n_bytes is None


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_extract_features_stub_and_injected(media):
    # default decoder must refuse; exact wrapping of the python-worker
    # error varies with worker reuse, so only the failure itself is asserted
    with pytest.raises(Exception):  # noqa: B017, PT011
        extract_features(media).collect()

    def fake_decoder(raw: bytes, kind: str) -> list[float]:
        return [float(len(raw)), float(raw[0]) if raw else -1.0]

    rows = {r.media_id: r for r in extract_features(media, decoder=fake_decoder).collect()}
    assert rows[1].feature == [8.0, 137.0]
    assert rows[3].feature == [0.0, -1.0]
    assert rows[2].n_bytes == 8 and len(rows[2].sha_prefix) == 16


def test_decode_pnm_roundtrip_and_errors():
    import numpy as np

    from sarkac_spark.operators.multimodal import decode_pnm
    from sarkac_spark.sources.synthetic import encode_ppm

    pixels, w, h = decode_pnm(encode_ppm(8, 6, seed=0))
    assert (w, h) == (8, 6) and pixels.shape == (6, 8, 3)
    assert pixels[0, 3, 0] == 3 and pixels[5, 0, 1] == 5  # gradient truth
    # P5 grayscale with a header comment
    p5 = b"P5\n# comment\n4 2\n255\n" + bytes(range(8))
    gray, w, h = decode_pnm(p5)
    assert gray.shape == (2, 4, 1) and gray[1, 3, 0] == 7
    with pytest.raises(ValueError, match="magic"):
        decode_pnm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM unsupported
    with pytest.raises(ValueError, match="maxval"):
        decode_pnm(b"P6\n1 1\n65535\n" + b"\x00" * 6)
    assert np is not None


def test_decode_wav_pcm_variants():
    import struct

    import numpy as np

    from sarkac_spark.operators.multimodal import decode_wav
    from sarkac_spark.sources.synthetic import encode_wav

    samples, rate = decode_wav(encode_wav(800, sample_rate=8000, amplitude=12000))
    assert rate == 8000 and len(samples) == 800
    assert np.allclose(np.abs(samples), 12000 / 32768.0)  # square wave
    # stereo 16-bit: channels averaged
    data = struct.pack("<4h", 100, 300, -100, -300)
    fmt = struct.pack("<HHIIHH", 1, 2, 4000, 16000, 4, 16)
    stereo = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    s, r = decode_wav(stereo)
    assert r == 4000 and np.allclose(s * 32768.0, [200.0, -200.0])
    with pytest.raises(ValueError, match="PCM"):
        bad_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)  # float WAV
        decode_wav(
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + bad_fmt
            + b"data" + struct.pack("<I", 0)
        )


def test_builtin_decoder_end_to_end(spark):
    """The decode stub is CLOSED for dependency-free formats: the
    default decoder carries PPM/PGM and PCM WAV payloads through the
    real mapInPandas path with no injection (VERDICT round 3, item 3)."""
    from sarkac_spark.sources.synthetic import example_media

    media = example_media(spark, n=6).filter("mime != 'image/png'")
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert len(rows) == 6
    # media 0: 8x6 P6 gradient, seed 0 -> channel means 3.5 / 2.5 / 6.0
    f = rows[0].feature
    assert f[:3] == [8.0, 6.0, 3.0]
    assert abs(f[3] - 4.0) < 1e-5 and f[4] > 0
    # media 1: 800-sample square wave at 8 kHz -> RMS == peak == A/32768
    a = rows[1].feature
    assert a[:2] == [8000.0, 800.0]
    assert abs(a[2] - 0.1) < 1e-6
    assert abs(a[3] - 12000 / 32768.0) < 1e-5
    assert abs(a[4] - 12000 / 32768.0) < 1e-5
    # compressed formats still refuse loudly without an injected decoder
    png = example_media(spark, n=2).filter("mime = 'image/png'")
    with pytest.raises(Exception):  # noqa: B017, PT011
        extract_features(png).collect()


def test_frame_sample_plan(media):
    rows = frame_sample_plan(media, every_ms=1000).collect()
    assert {r.media_id for r in rows} == {2}
    assert sorted(r.sample_ms for r in rows) == [0, 1000, 2000, 3000]


def test_top_terms(spark):
    from sarkac_spark.operators.text import top_terms

    df = spark.createDataFrame(
        [(1, "a a a B"), (2, "b c"), (3, "c a")],
        "doc_id long, text string",
    )
    out = {r.term: r for r in top_terms(df, k=2).collect()}
    # 'a' occurs 4x in 2 docs; 'b' (case-folded) and 'c' 2x each -> 'b' wins tie
    assert set(out) == {"a", "b"}
    assert out["a"].n_occ == 4 and out["a"].df_docs == 2 and out["a"].rank == 1
    assert out["b"].n_occ == 2 and out["b"].df_docs == 2 and out["b"].rank == 2


def test_bigram_transitions(spark):
    from sarkac_spark.operators.text import bigram_transitions

    df = spark.createDataFrame(
        [(1, "to be or not to be"), (2, "to be is to do"), (3, "one")],
        "doc_id long, text string",
    )
    out = bigram_transitions(df, min_head_count=2, k=2).collect()
    by = {(r.head, r.nxt): r for r in out}
    # 'to' -> 'be' 3x of 4 'to'-headed bigrams; single-word doc contributes none
    r = by[("to", "be")]
    assert r.n_ab == 3 and r.n_a == 4 and r.prob == 0.75 and r.rank == 1
    assert by[("to", "do")].rank == 2
    assert all(r.n_a >= 2 for r in out)


def test_canonical_select(spark):
    from sarkac_spark.operators.dedup import canonical_select

    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 20), (4, 5), (5, 5), (6, 99)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    out = {r.doc_id: r for r in canonical_select(docs, pairs).collect()}
    assert len(out) == 6
    # cluster {1,2,3}: labeled by min id, longest doc (2) kept
    assert {out[i].cluster_id for i in (1, 2, 3)} == {1}
    assert [out[i].keep for i in (1, 2, 3)] == [False, True, False]
    assert out[1].cluster_size == 3
    # cluster {4,5}: equal length -> smallest id kept
    assert out[4].keep and not out[5].keep
    # untouched doc stays its own kept singleton
    assert out[6].keep and out[6].cluster_id == 6 and out[6].cluster_size == 1


def test_quantile_bucket_stats(spark):
    from sarkac_spark.operators.profiling import quantile_bucket_stats

    df = spark.createDataFrame([(i,) for i in range(1, 101)], "v long")
    out = {r.bucket: r for r in quantile_bucket_stats(df, "v", n_buckets=4).collect()}
    assert sorted(out) == [1, 2, 3, 4]
    # exact quartile boundaries on 1..100 -> equal-frequency buckets
    assert [out[b].n_rows for b in (1, 2, 3, 4)] == [25, 25, 25, 25]
    assert out[1].lo == 1 and out[4].hi == 100
    assert out[1].hi < out[2].lo and out[3].hi < out[4].lo


def test_inverted_index(spark):
    from sarkac_spark.operators.dedup import inverted_index

    df = spark.createDataFrame(
        [
            (3, "w x y z"),
            (1, "w x y q"),
            (2, "a b"),  # too short for 3-shingles
        ],
        "doc_id long, text string",
    )
    out = {r.shingle: r for r in inverted_index(df, min_df=2, max_df=10).collect()}
    # only the shared shingle survives min_df; postings sorted ascending
    assert set(out) == {"w x y"}
    assert out["w x y"].n_docs == 2 and out["w x y"].postings == [1, 3]


def test_quantize_int8_error(spark):
    from sarkac_spark.operators.similarity import quantize_int8_error

    df = spark.createDataFrame(
        [
            (1, [127.0, -63.5, 0.25]),
            (2, [0.0, 0.0]),  # zero vector: scale 0, no division
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_int8_error(df).collect()}
    assert out[1].scale == 1.0  # max|x| = 127 -> scale exactly 1
    # error bounded by scale/2; 0.25 -> q=0 leaves err 0.25
    assert 0 < out[1].max_abs_err <= 0.5
    assert out[2].scale == 0.0 and out[2].max_abs_err == 0.0


def test_span_dedup_drops_later_occurrences(spark):
    from sarkac_spark.operators.dedup import span_dedup

    boiler = "one two three four five"  # 5-word span unit below
    rows = [
        (1, f"{boiler} alpha beta gamma delta eps"),
        (2, f"{boiler} unique body text here now"),   # repeats the boiler span
        (3, "totally different content in this doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_dedup(df, span_words=5).collect()}

    # doc 1 (first occurrence) keeps everything
    assert out[1].n_spans == 2 and out[1].n_kept == 2
    assert out[1].text_dedup == rows[0][1]
    # doc 2 loses the boilerplate span but keeps its unique tail
    assert out[2].n_spans == 2 and out[2].n_kept == 1
    assert out[2].text_dedup == "unique body text here now"
    # untouched doc unchanged
    assert out[3].text_dedup == rows[2][1]


def test_span_dedup_fully_duplicate_doc_empties(spark):
    from sarkac_spark.operators.dedup import span_dedup

    t = "a b c d e f g h i j"
    df = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    out = {r.doc_id: r for r in span_dedup(df, span_words=10).collect()}
    assert out[1].text_dedup == t and out[1].n_kept == 1
    assert out[2].text_dedup == "" and out[2].n_kept == 0 and out[2].n_spans == 1


def test_span_dedup_paragraph_boundary_mode(spark):
    """span_dedup with boundary=: segments are blank-line paragraphs,
    duplicates drop whole boilerplate blocks, survivors rejoin with
    the paragraph joiner, blank segments vanish, and a boundary-free
    doc degenerates to whole-doc exact dedup."""
    from sarkac_spark.operators.dedup import span_dedup

    B = "license boilerplate block"
    rows = [
        (1, f"intro one\n\n{B}\n\nbody one"),
        (2, f"{B}\n\nbody two"),
        (3, "solo doc no boundaries"),
        (4, "body one"),  # whole doc equals doc 1's third paragraph
        (5, "\n\nalpha beta\n\n   \n\ngamma"),  # blank segments vanish
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_dedup, r.n_spans, r.n_kept)
        for r in span_dedup(
            df, boundary=r"\n{2,}", joiner="\n\n"
        ).collect()
    }
    assert got[1] == (f"intro one\n\n{B}\n\nbody one", 3, 3)
    assert got[2] == ("body two", 2, 1)  # B kept only at (1, 1)
    assert got[3] == ("solo doc no boundaries", 1, 1)
    assert got[4] == ("", 1, 0)  # later occurrence of doc 1's paragraph
    assert got[5] == ("alpha beta\n\ngamma", 2, 2)

    # empty / all-blank docs emit ONE ''-span — the same row contract
    # as window mode (words_col('') yields one '' token), so switching
    # modes never drops documents from the output
    blank_df = spark.createDataFrame(
        [(6, ""), (7, " \n\n  "), (8, "word")], "doc_id long, text string"
    )
    win_ids = {r.doc_id for r in span_dedup(blank_df, span_words=10).collect()}
    par = {
        r.doc_id: (r.text_dedup, r.n_spans, r.n_kept)
        for r in span_dedup(
            blank_df, boundary=r"\n{2,}", joiner="\n\n"
        ).collect()
    }
    assert set(par) == win_ids == {6, 7, 8}
    assert par[6] == ("", 1, 1)  # first ''-span keeps (vacuously)
    assert par[7] == ("", 1, 0)  # later ''-span deduped against doc 6
    assert par[8] == ("word", 1, 1)


def test_hot_spans_audit(spark):
    """The boilerplate audit surfaces the planted hot span first, with
    exact occurrence/doc counts, and respects min_df and top_k."""
    from sarkac_spark.operators.dedup import hot_spans

    boiler = "alpha beta gamma delta epsilon"
    rows = [(i, f"{boiler} unique token word number {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = hot_spans(df, span_words=5, top_k=5).collect()
    assert out[0].span == boiler
    assert out[0].span_df == 50 and out[0].n_docs == 50
    assert len(out) == 1  # unique tails never reach min_df=2


def test_span_dedup_planted_hot_key(spark):
    """Skew proof (VERDICT round 3, item 5): one boilerplate span
    repeated ~10^4 times — the exact hot-key shape web boilerplate
    produces at 100 TB. Pins (a) correctness under the skewed shuffle:
    exactly one global survivor of the hot span, every document keeps
    its unique tail; (b) skew-immunity BY CONSTRUCTION: first-occurrence
    selection is a partial-combining hash aggregate, so the plan must
    contain NO Window operator (windows cannot be split across tasks —
    AQE skew handling only applies to joins, so a windowed formulation
    puts all 10^4 copies in one straggler task) and no sort on the span
    grouping; (c) the plan stays in budget — never a self-join, no
    cartesian."""
    from sarkac_spark.operators.dedup import span_dedup
    from sarkac_spark.plans.audit import executed_plan, shuffle_count

    n = 10_000
    boiler = "alpha beta gamma delta epsilon"
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + " unique token word number "), F.col("id").cast("string")
        ).alias("text"),
    )
    out = span_dedup(docs, span_words=5)

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    assert "Window" not in plan  # the straggler shape AQE cannot split
    assert "HashAggregate" in plan  # partial combine collapses the hot key
    assert shuffle_count(out) <= 4

    rows = out.collect()
    assert len(rows) == n
    assert sum(r.n_kept for r in rows) == n + 1  # one boiler survivor total
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].n_kept == 2 and by_id[0].text_dedup.startswith(boiler)
    assert by_id[17].text_dedup == "unique token word number 17"
    assert all(r.n_spans == 2 for r in rows)


def test_vocab_coverage_curve(spark):
    from sarkac_spark.operators.text import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a a a b b c"), (2, "a b c d")], "doc_id long, text string"
    )
    out = {r.rank: r for r in vocab_coverage(df, "text", top_k=10).collect()}
    # 11 occurrences total: a=5, b=3, c=2, d=1
    assert [out[i].term for i in (1, 2, 3, 4)] == ["a", "b", "c", "d"]
    assert out[1].cum_coverage == round(5 / 11, 6)
    assert out[2].cum_coverage == round(8 / 11, 6)
    assert out[4].cum_coverage == 1.0 and out[4].oov_rate == 0.0
    # coverage is monotone, oov complements it
    for i in (1, 2, 3):
        assert out[i].cum_coverage < out[i + 1].cum_coverage
        assert out[i].oov_rate == round(1 - out[i].cum_coverage, 6)


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_star_components_match_min_label_on_paths_and_random(spark):
    """Star contraction must produce identical components to min-label
    propagation — including on a long path, where min-label would need
    diameter rounds but star contraction stays logarithmic."""
    import random

    from sarkac_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    # long path 0-1-2-...-120 (diameter 120) + a disjoint triangle
    path = [(i, i + 1) for i in range(120)]
    tri = [(500, 501), (501, 502), (500, 502)]
    edges = spark.createDataFrame(path + tri, "id_a long, id_b long")
    star = {
        r.node: r.component
        for r in connected_components_star(edges, max_iter=20).collect()
    }
    assert {star[i] for i in range(121)} == {0}
    assert {star[i] for i in (500, 501, 502)} == {500}
    # min-label agrees (given enough rounds for the diameter)
    ml = {
        r.node: r.component
        for r in connected_components(edges, max_iter=130).collect()
    }
    assert star == ml

    # seeded random graphs: same partition either way
    rng = random.Random(7)
    rand_edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(80)
    ]
    rand_edges = [(a, b) for a, b in rand_edges if a != b]
    df = spark.createDataFrame(rand_edges, "id_a long, id_b long")
    s = {r.node: r.component for r in connected_components_star(df).collect()}
    m = {r.node: r.component for r in connected_components(df, max_iter=60).collect()}
    assert s == m

    # the auto-fallback path (round budget far below the 120-diameter)
    # produces the same exact components as either converged run
    fb = {
        r.node: r.component
        for r in connected_components(edges, max_iter=3).collect()
    }
    assert fb == star


def test_cross_contamination_train_df_cap(spark):
    """A boilerplate shingle carried by every train doc must not count
    as contamination evidence; genuine shared content still does."""
    from sarkac_spark.operators.dedup import cross_contamination

    boiler = "all rights reserved by us"
    train = spark.createDataFrame(
        [(i, f"{boiler} train body number {i} here") for i in range(10)]
        + [(99, "secret eval answer key text leaked")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(500, f"{boiler} fresh eval content entirely new"),
         (501, "secret eval answer key text leaked")],
        "doc_id long, text string",
    )
    capped = cross_contamination(
        train, ev, "doc_id", "text", min_shared=3, max_train_df=5
    ).collect()
    pairs = {(r.eval_id, r.train_id) for r in capped}
    assert pairs == {(501, 99)}  # true leak found, boilerplate ignored

    uncapped = cross_contamination(
        train, ev, "doc_id", "text", min_shared=3, max_train_df=None
    ).collect()
    assert {(r.eval_id, r.train_id) for r in uncapped} > pairs


def test_doc_lm_score_orders_fluency(spark):
    """Documents made of the corpus's common bigrams must score lower
    (more probable) than a doc of bigrams seen nowhere else."""
    from sarkac_spark.operators.text import doc_lm_score

    common = "the quick brown fox jumps"
    rows = [(i, common) for i in range(10)]
    rows.append((100, "zxq wvu tsr qpo nml"))  # unique bigrams only
    rows.append((101, "solo"))  # < 2 words: excluded
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in doc_lm_score(df).collect()}

    assert 101 not in out
    assert out[0].n_bigrams == 4
    # every copy of the common doc scores identically
    assert len({out[i].lm_score for i in range(10)}) == 1
    # the gibberish doc is far less probable under the corpus model
    assert out[100].lm_score > out[0].lm_score + 1.0


def test_ann_recall_report(spark):
    from sarkac_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 99)],  # 2/3 for q1; q2 found nothing
        "query_id long, neighbor_id long",
    )
    out = {r.query_id: r for r in ann_recall(exact, approx, "lsh", k=3).collect()}
    assert out[1].n_hits == 2 and out[1].recall == round(2 / 3, 6)
    assert out[2].n_hits == 0 and out[2].recall == 0.0
    assert all(r.method == "lsh" for r in out.values())


def test_ann_recall_short_exact_list_can_reach_one(spark):
    """A query whose exact top-k has fewer than k neighbors must still be
    able to score recall 1.0 (denominator is least(k, n_exact), not k)."""
    from sarkac_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11)], "query_id long, neighbor_id long"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 99)], "query_id long, neighbor_id long"
    )
    row = ann_recall(exact, approx, "ivf", k=3).collect()[0]
    assert row.n_hits == 2 and row.recall == 1.0


@pytest.mark.parametrize(
    ("sf_dir", "ivf_floor", "lsh_floor"),
    [
        # measured: ivf 0.867, lsh 0.367
        ("/root/testdata/sf0.001", 0.7, 0.2),
        # measured: ivf 0.833, lsh 0.267 — the operating point shifts
        # with corpus size (more vectors per bucket, same probes), so
        # the floor must hold at the driver's sf too, not just the toy
        ("/root/testdata/sf0.01", 0.7, 0.15),
    ],
)
def test_ann_recall_floors(spark, sf_dir, ivf_floor, lsh_floor):
    """Pin macro-average recall@3 of both approximate paths on the
    deterministic corpora, so a parameter regression (nprobe, n_bits,
    n_tables, centroid seed) fails CI instead of silently degrading
    retrieval quality."""
    from sarkac_spark.queries.llm import q_ann_recall

    rows = q_ann_recall(spark, sf_dir).collect()
    by_method: dict[str, list[float]] = {}
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        by_method.setdefault(r.method, []).append(r.recall)
    mean = {m: sum(v) / len(v) for m, v in by_method.items()}
    assert set(mean) == {"ivf", "lsh"}
    assert mean["ivf"] >= ivf_floor, mean
    assert mean["lsh"] >= lsh_floor, mean


def test_semantic_dedup_drops_higher_id_duplicate(spark):
    """Identical vectors always co-bucket (bucket is a function of the
    vector), so the higher-id copy is dropped and the lower-id copy plus
    the unrelated vector are kept."""
    from sarkac_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),   # exact dup of 1 -> dropped
            (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal -> kept
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in semantic_dedup(df, dim=4, n_bits=3, tau=0.9).collect()}
    assert rows[1].kept == 1 and rows[2].kept == 0 and rows[3].kept == 1
    assert rows[1].bucket == rows[2].bucket


def test_gopher_rules_flags(spark):
    """Each rule trips on its own planted violation; the clean doc passes."""
    from sarkac_spark.operators.text import gopher_rules

    good = "the quick brown fox jumps over the lazy dog and runs to a tree"
    short = "the end"                                  # < 10 words
    nostop = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    symbols = "the ### $$$ %%% ^^^ &&& *** ((( ))) @@@ !!! ??? of and to in"
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, nostop), (4, symbols)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert rows[1].passes == 1
    assert rows[2].passes == 0 and rows[2].ok_word_count == 0
    assert rows[3].passes == 0 and rows[3].ok_stopwords == 0
    assert rows[4].passes == 0 and rows[4].ok_symbol_ratio == 0
    assert rows[1].n_words == 14 and rows[1].stop_hits >= 3


def test_gopher_rules_empty_text_no_nulls(spark):
    """Empty text must not NULL-poison the ratios (0/0) or the boolean
    conjunction — the documented contract is every flag in {0,1} and
    both ratios defined (ADVICE round 3: NULL here diverged from the
    DuckDB oracle's CASE fallthrough)."""
    from sarkac_spark.operators.text import gopher_rules

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None)], "doc_id long, text string"
    )
    for r in gopher_rules(df).collect():
        if r.text is None:
            continue  # null text propagates null features by design
        assert r.mean_word_len == 0.0 and r.symbol_ratio == 0.0
        assert r.passes == 0 and r.ok_word_count == 0


def test_unigram_kl_zero_for_representative_slice(spark):
    """A group distributed exactly like the corpus has KL 0; a skewed
    group scores strictly positive."""
    from sarkac_spark.operators.text import unigram_kl

    balanced = spark.createDataFrame(
        [("a", "x y"), ("b", "x y")], "source string, text string"
    )
    rows = {r.source: r for r in unigram_kl(balanced).collect()}
    assert rows["a"].kl_divergence == 0.0 and rows["b"].kl_divergence == 0.0
    assert rows["a"].n_tokens == 2 and rows["a"].n_types == 2

    skewed = spark.createDataFrame(
        [("a", "x y"), ("c", "x x x x")], "source string, text string"
    )
    rows = {r.source: r for r in unigram_kl(skewed).collect()}
    assert rows["c"].kl_divergence > 0.0
    assert rows["a"].kl_divergence > 0.0  # corpus shifted away from a too


def test_unigram_kl_differential_random_corpora(spark):
    """On seeded random corpora: KL(P_g || P_corpus) matches an
    independent numpy computation and is non-negative (Gibbs)."""
    import collections
    import math

    import numpy as np

    from sarkac_spark.operators.text import unigram_kl

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (f"g{g}", " ".join(rng.choice(vocab, rng.integers(3, 20))))
        for g in range(4)
        for _ in range(10)
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r.source: r for r in unigram_kl(df).collect()}

    c_gt: dict = collections.Counter()
    for g, text in rows:
        for t in text.split():
            c_gt[(g, t)] += 1
    c_t = collections.Counter()
    tot_g = collections.Counter()
    for (g, t), c in c_gt.items():
        c_t[t] += c
        tot_g[g] += c
    tot = sum(c_gt.values())
    for g in tot_g:
        kl = sum(
            (c / tot_g[g]) * math.log((c * tot) / (tot_g[g] * c_t[t]))
            for (gg, t), c in c_gt.items()
            if gg == g
        )
        assert got[g].kl_divergence >= -1e-6
        assert abs(got[g].kl_divergence - kl) < 1e-5, (g, kl)
        assert got[g].n_tokens == tot_g[g]


def test_semantic_dedup_differential_random(spark):
    """Full numpy re-derivation on seeded random vectors with planted
    exact duplicates: buckets, the dropped set, and kept flags must all
    match the operator exactly."""
    import numpy as np

    from sarkac_spark.operators.similarity import (
        _rademacher_hyperplanes,
        semantic_dedup,
    )

    rng = np.random.default_rng(11)
    dim, n_bits, tau = 8, 3, 0.8
    vecs = rng.normal(size=(40, dim))
    for src, dst in [(0, 20), (5, 25), (7, 35)]:  # planted exact dups
        vecs[dst] = vecs[src]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in semantic_dedup(df, dim=dim, n_bits=n_bits, tau=tau).collect()}

    v = vecs.astype(np.float32).astype(np.float64)  # match array<float> storage
    planes = np.array(_rademacher_hyperplanes(n_bits, dim, "semdedup"))
    dots = np.round(v @ planes.T, 6)
    buckets = ((dots > 0) @ (1 << np.arange(n_bits))).astype(int)
    norms = np.linalg.norm(v, axis=1)
    dropped = set()
    for hi in range(len(v)):
        for lo in range(hi):
            if buckets[lo] == buckets[hi] and round(
                float(v[lo] @ v[hi] / (norms[lo] * norms[hi])), 6
            ) > tau:
                dropped.add(hi)
    for i in range(len(v)):
        assert got[i].bucket == buckets[i], i
        assert got[i].kept == (0 if i in dropped else 1), i
    assert {20, 25, 35} <= dropped  # planted dups actually exercised the path


def test_gopher_rules_differential_random(spark):
    """Seeded random texts vs a pure-python re-derivation of every
    feature and flag."""
    import numpy as np

    from sarkac_spark.operators.text import _GOPHER_STOPWORDS, gopher_rules

    rng = np.random.default_rng(13)
    pieces = ["the", "of", "to", "zebra", "qq", "a1b2", "###", "x" * 15, "?!"]
    rows = [
        (i, " ".join(rng.choice(pieces, rng.integers(1, 30))))
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    stopset = set(_GOPHER_STOPWORDS)
    for i, text in rows:
        w = text.split()
        n_words = len(w)
        mean_wl = sum(len(x) for x in w) / n_words
        clean = "".join(c for c in text if c.isalnum() or c == " ")
        symbol_ratio = (len(text) - len(clean)) / len(text)
        stop_hits = sum(1 for x in w if x.lower() in stopset)
        r = got[i]
        assert r.n_words == n_words
        assert abs(r.mean_word_len - mean_wl) < 1e-6
        assert abs(r.symbol_ratio - symbol_ratio) < 1e-6
        assert r.stop_hits == stop_hits
        expect = int(
            10 <= n_words <= 1000
            and 2.0 <= round(mean_wl, 6) <= 12.0
            and round(symbol_ratio, 6) <= 0.1
            and stop_hits >= 2
        )
        assert r.passes == expect, (i, text)


def test_semantic_dedup_identical_clique_collapses(spark):
    """Adversarial bucket: many copies of ONE vector plus zero vectors.
    The exact-duplicate collapse must (a) keep only the lowest-id copy,
    (b) leave zero-norm copies untouched (null cosine never drops), and
    (c) run the pairwise join on distinct vectors — so the plan's join
    input is O(distinct), not O(copies)^2 (the clique guard)."""
    from sarkac_spark.operators.similarity import semantic_dedup

    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(200)]
    rows += [(1000, [0.0, 0.0, 0.0, 0.0]), (1001, [0.0, 0.0, 0.0, 0.0])]
    rows += [(2000, [-4.0, 3.0, -2.0, 1.0])]  # distinct, dissimilar
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.kept for r in semantic_dedup(df, dim=4, n_bits=2, tau=0.8).collect()}
    assert out[0] == 1
    assert all(out[i] == 0 for i in range(1, 200))  # clique -> one survivor
    assert out[1000] == 1 and out[1001] == 1  # zero vectors exempt
    assert out[2000] == 1


def test_ivf_nprobe_widens_recall(spark, sf_dir):
    """nprobe=2 must dominate nprobe=1: per query, the probed candidate
    set is a superset, so hits against the exact top-k can only grow.
    Measured on the sf0.001 fixture the macro recall strictly improves."""
    from sarkac_spark.operators.similarity import ann_recall
    from sarkac_spark.queries.llm import TOPK, q_cosine_topk, q_ivf_probe2, q_ivf_topk

    exact = q_cosine_topk(spark, sf_dir)
    r1 = {r.query_id: r.recall for r in ann_recall(exact, q_ivf_topk(spark, sf_dir), "ivf", k=TOPK).collect()}
    r2 = {r.query_id: r.recall for r in ann_recall(exact, q_ivf_probe2(spark, sf_dir), "ivf2", k=TOPK).collect()}
    assert set(r1) == set(r2)
    assert all(r2[q] >= r1[q] for q in r1), (r1, r2)
    assert sum(r2.values()) > sum(r1.values())  # strictly better on the fixture


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_round3_ops_invariant_to_input_order(spark):
    """Determinism under physical reordering: repartitioning and
    reversing the input must not change a single output row for
    semantic_dedup, gopher_rules, or unigram_kl (the property that
    makes the DuckDB oracle hash comparable at all — and that an
    accidental monotonically_increasing_id / first() would break)."""
    import numpy as np

    from sarkac_spark.operators.similarity import semantic_dedup
    from sarkac_spark.operators.text import gopher_rules, unigram_kl

    rng = np.random.default_rng(3)
    vec_rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    vec_rows += [(100 + i, vec_rows[i][1]) for i in range(5)]  # planted dups
    docs = [
        (i, f"the quick doc {i} " + " ".join(rng.choice(["a", "of", "to", "xs"], 8)),
         f"s{i % 3}")
        for i in range(40)
    ]

    def canon(rows):
        return sorted(tuple(r) for r in rows)

    results = []
    for build in (
        lambda d: d,
        lambda d: d.repartition(7),
        lambda d: d.coalesce(1),
    ):
        vdf = build(
            spark.createDataFrame(vec_rows, "vec_id long, embedding array<float>")
        )
        ddf = build(
            spark.createDataFrame(docs, "doc_id long, text string, source string")
        )
        results.append((
            canon(semantic_dedup(vdf, dim=8, n_bits=3, tau=0.8).collect()),
            canon(gopher_rules(ddf).select("doc_id", "passes", "stop_hits").collect()),
            canon(unigram_kl(ddf).collect()),
        ))
    assert results[0] == results[1] == results[2]


def test_count_min_sketch_guarantees(spark):
    """The CMS contract: (a) the sketch never exceeds depth x width rows
    whatever the input (the bounded-memory point); (b) estimates are
    one-sided — never below the true count; (c) with width >> distinct
    keys the estimate is exact; (d) the weighted variant sums weights."""
    from pyspark.sql import functions as F

    from sarkac_spark.operators.sketch import cms_estimate, count_min_sketch

    rows = [(f"k{i % 50}",) for i in range(5000)]  # 50 keys, 100 hits each
    df = spark.createDataFrame(rows, "term string")
    sk = count_min_sketch(df, "term", depth=4, width=8)  # tiny: forces collisions
    assert sk.count() <= 4 * 8
    truth = {r.term: r.c for r in df.groupBy("term").agg(F.count("*").alias("c")).collect()}
    items = df.select("term").distinct()
    est = {
        r.term: r.est_count
        for r in cms_estimate(sk, items, "term", depth=4, width=8).collect()
    }
    assert all(est[t] >= truth[t] for t in truth)  # one-sided error

    wide = count_min_sketch(df, "term", depth=4, width=4096)
    exact = {
        r.term: r.est_count
        for r in cms_estimate(wide, items, "term", depth=4, width=4096).collect()
    }
    assert exact == truth  # no collisions at this width on 50 keys

    wdf = spark.createDataFrame([("a", 3), ("a", 4), ("b", 5)], "term string, w int")
    wsk = count_min_sketch(wdf, "term", depth=4, width=4096, weight_col="w")
    west = {
        r.term: r.est_count
        for r in cms_estimate(
            wsk, wdf.select("term").distinct(), "term", depth=4, width=4096
        ).collect()
    }
    assert west == {"a": 7, "b": 5}
    # unseen keys estimate to >= 0 without erroring (missing buckets = 0)
    probe = spark.createDataFrame([("zzz-never-seen",)], "term string")
    miss = cms_estimate(wide, probe, "term", depth=4, width=4096).collect()[0]
    assert miss.est_count == 0


def test_sketch_aggregate_proxy_equivalences(spark):
    """Pins the two invariances the r12 wave-4 query rewrites rely on:
    (1) a count-weighted CMS built from the (term, count) aggregate is
    BIT-identical to the unweighted sketch built from the occurrence
    list (per-bucket sums commute with pre-aggregation), and (2) HLL
    registers/estimates are duplicate-invariant (per-register max), so
    building from the distinct set equals building from occurrences.
    These let the queries materialize vocab-sized aggregates instead of
    corpus-sized occurrence lists with zero result change."""
    from sarkac_spark.operators.sketch import (
        count_min_sketch,
        hll_distinct,
    )

    occurrences = spark.createDataFrame(
        [(t,) for t in ["x"] * 7 + ["y"] * 3 + ["z"] * 1 + ["w"] * 5],
        "term string",
    )
    counts = occurrences.groupBy("term").agg(F.count(F.lit(1)).alias("c"))

    sk_occ = {
        (r.d, r.bucket): r.cnt
        for r in count_min_sketch(occurrences, "term", depth=4, width=8).collect()
    }
    sk_agg = {
        (r.d, r.bucket): r.cnt
        for r in count_min_sketch(
            counts, "term", depth=4, width=8, weight_col="c"
        ).collect()
    }
    assert sk_occ == sk_agg

    est_occ = hll_distinct(occurrences, "term", b=8).collect()
    est_dst = hll_distinct(occurrences.distinct(), "term", b=8).collect()
    assert [tuple(r) for r in est_occ] == [tuple(r) for r in est_dst]


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_dedup_simhash_matches_bruteforce(spark):
    """Exactness of the banded candidate path: with max_hamming <=
    bands-1 the pigeonhole guarantee makes banding lossless, so the
    operator's pair set must EQUAL the brute-force all-pairs hamming
    filter over the same fingerprints — including after round 4's
    first-matching-band dedup replaced the distinct() (any pair emitted
    twice or dropped by that rewrite fails this)."""
    import numpy as np

    from sarkac_spark.operators.dedup import dedup_simhash, simhash

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    docs = [
        (i, " ".join(rng.choice(vocab, size=12, replace=True)))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {r.doc_id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    expect = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                expect.add((a, b, h))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup_simhash(df, "doc_id", "text", max_hamming=3, bands=4).collect()
    }
    assert got == expect
    # and no pair may be emitted more than once
    rows = dedup_simhash(df, "doc_id", "text", max_hamming=3, bands=4).collect()
    assert len(rows) == len({(r.id_a, r.id_b) for r in rows})


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_round4_ops_invariant_to_input_order(spark):
    """Round-4-touched operators under the same physical-reordering
    property: dedup_simhash (first-matching-band pair emission must be a
    pure function of the fingerprints, not of join/row order) and the
    single-pass extract_fields (CASE+explode must key purely on the
    topic value)."""
    from sarkac_spark.config import DSL
    from sarkac_spark.operators.dedup import dedup_simhash
    from sarkac_spark.streaming.pipeline import extract_fields

    docs = [
        (i, "alpha beta gamma delta " + ("x" if i % 4 else "y") + f" tail{i % 7}")
        for i in range(40)
    ]
    dsl = DSL.parse(
        {
            "t1": {"fields": {"a.b": {"windows": ["5m"]}}},
            "t2": {"fields": {"c": {"windows": ["5m"]}}},
        }
    )
    import datetime as dt
    import json as jsonlib

    envs = [
        (
            f"t{1 + i % 3}",  # t3 rows must be dropped everywhere
            str(i),
            jsonlib.dumps({"a": {"b": i * 1.5}, "c": i * 2.0}),
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
        )
        for i in range(60)
    ]

    def canon(rows):
        return sorted(tuple(r) for r in rows)

    results = []
    for build in (lambda d: d, lambda d: d.repartition(7), lambda d: d.coalesce(1)):
        ddf = build(spark.createDataFrame(docs, "doc_id long, text string"))
        edf = build(
            spark.createDataFrame(
                envs, "topic string, key string, value string, ts timestamp"
            )
        )
        results.append((
            canon(dedup_simhash(ddf, "doc_id", "text", max_hamming=10).collect()),
            canon(extract_fields(edf, dsl).collect()),
        ))
    assert results[0] == results[1] == results[2]
    # extraction keyed on topic: t3 rows dropped, both fields present
    extracted = results[0][1]
    assert {t[0] for t in extracted} == {"t1", "t2"}
    assert {t[3] for t in extracted} == {"a.b", "c"}


def test_group_vocab_jaccard(spark):
    from sarkac_spark.operators.text import group_vocab_jaccard

    d = spark.createDataFrame(
        [
            (1, "en", "the cat sat"),
            (2, "en", "the dog ran"),
            (3, "de", "the Cat lief"),   # lower() folds Cat -> cat
            (4, "fr", "xyz abc"),        # zero overlap with en/de
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        (r.group_a, r.group_b): r
        for r in group_vocab_jaccard(d, "lang", "text").collect()
    }
    # full unordered-pair grid, including zero-overlap pairs
    assert set(out) == {("de", "en"), ("de", "fr"), ("en", "fr")}
    de_en = out[("de", "en")]
    # en vocab: the cat sat dog ran (5); de vocab: the cat lief (3)
    assert (de_en.vocab_a, de_en.vocab_b) == (3, 5)
    assert de_en.shared_terms == 2  # {the, cat}
    assert de_en.jaccard == 2 / 6
    assert out[("en", "fr")].shared_terms == 0
    assert out[("en", "fr")].jaccard == 0.0


def test_hll_distinct_accuracy_and_invariance(spark):
    from sarkac_spark.operators.sketch import hll_distinct

    # raw-HLL regime: 50k distinct >> 2.5 * 1024 registers
    big = spark.range(50_000).select(
        F.lit("big").alias("g"), F.col("id").cast("string").alias("v")
    )
    # linear-counting regime: 200 distinct << m, duplicated rows
    small = spark.range(600).select(
        F.lit("small").alias("g"), (F.col("id") % 200).cast("string").alias("v")
    )
    d = big.union(small)
    out = {r.g: r.est_distinct for r in hll_distinct(d, "v", ["g"]).collect()}
    assert abs(out["big"] - 50_000) / 50_000 < 0.1  # ~3.2% expected at m=1024
    assert abs(out["small"] - 200) / 200 < 0.1

    # estimate is a pure function of the value SET: duplication factor,
    # row order, and partitioning must not move it by a single count
    shuffled = d.union(big).repartition(13, "v")
    out2 = {r.g: r.est_distinct for r in hll_distinct(shuffled, "v", ["g"]).collect()}
    assert out2 == out

    # ungrouped variant returns one global row
    glob = hll_distinct(d.select("v"), "v").collect()
    assert len(glob) == 1
    assert abs(glob[0].est_distinct - 50_200) / 50_200 < 0.1


def test_histogram_quantiles_error_bound(spark):
    from sarkac_spark.operators.sketch import histogram_quantiles

    # uniform 0..999 in two groups; exact pQ = ~q*999, bin width ~ 1000/k
    d = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") / 2).cast("long").alias("v"),
    )
    k = 50
    out = {r.g: r for r in histogram_quantiles(d, "v", ["g"], k=k).collect()}
    assert set(out) == {"0", "1"}
    width = 999 / k
    for r in out.values():
        assert r.n == 1000
        for q, col in [(0.5, r.p50_est), (0.95, r.p95_est), (0.99, r.p99_est)]:
            true_q = q * 999
            # upper-edge estimate: never below the true quantile, and
            # within one bin width above it
            assert true_q - 1e-9 <= col <= true_q + width + 1e-9

    # degenerate group: all values equal -> estimate is that value
    const = spark.range(10).select(
        F.lit("c").alias("g"), F.lit(42).cast("long").alias("v")
    )
    r = histogram_quantiles(const, "v", ["g"], k=k).collect()[0]
    assert (r.p50_est, r.p95_est, r.p99_est) == (42.0, 42.0, 42.0)

    # ungrouped variant: one global row
    g = histogram_quantiles(d.select("v"), "v", k=k).collect()
    assert len(g) == 1 and g[0].n == 2000


def test_winnow_fingerprints_coverage_guarantee(spark):
    from sarkac_spark.operators.dedup import winnow_fingerprints, winnow_pairs

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words = w + k - 1
    d = spark.createDataFrame(
        [
            (1, f"intro one two {shared} outro red blue"),
            (2, f"completely different head {shared} tail words here"),
            (3, "no overlap with anybody at all in this document"),
            (4, "tiny"),  # < k words: no grams, no fingerprints
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(d, "doc_id", "text", k=3, w=4)
    by_doc = {
        r.doc_id: {x.fp for x in rows}
        for r in fps.select("doc_id").distinct().collect()
        for rows in [fps.filter(F.col("doc_id") == r.doc_id).collect()]
    }
    # the paper's guarantee: a shared run of >= w+k-1 words yields at
    # least one shared fingerprint
    assert by_doc[1] & by_doc[2]
    assert 4 not in by_doc
    # density: selected fingerprints are a strict subset of the grams
    n_grams_1 = len("intro one two alpha beta gamma delta epsilon zeta outro red blue".split()) - 2
    assert 0 < len(by_doc[1]) < n_grams_1

    # pairs: (1,2) fire; doc 3 pairs with nobody
    pairs = winnow_pairs(d, "doc_id", "text", k=3, w=4, min_shared=1).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert all(r.n_shared >= 1 for r in pairs)


def test_sketch_merge_algebra(spark):
    """The properties that make the sketches distributable: CMS is
    linear (counter-wise sum), HLL registers max-merge, histograms sum —
    partial sketches built on disjoint splits combine into exactly the
    whole-input sketch, which is what map-side combine and window
    rollups rely on."""
    from sarkac_spark.operators.sketch import (
        count_min_sketch,
        hll_registers,
    )

    whole = spark.range(500).select(F.col("id").cast("string").alias("v"))
    a = whole.filter(F.col("v").cast("long") < 200)
    b = whole.filter(F.col("v").cast("long") >= 200)

    # CMS linearity
    def cms_rows(d):
        return {
            (r.d, r.bucket): r.cnt
            for r in count_min_sketch(d, "v", depth=3, width=32).collect()
        }

    sa, sb, sw = cms_rows(a), cms_rows(b), cms_rows(whole)
    merged = dict(sa)
    for k, v in sb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == sw

    # HLL register max-merge
    def regs(d):
        return {r.idx: r.M for r in hll_registers(d, "v", [], b=6).collect()}

    ra, rb, rw = regs(a), regs(b), regs(whole)
    mmax = dict(ra)
    for k, v in rb.items():
        mmax[k] = max(mmax.get(k, 0), v)
    assert mmax == rw


def test_hard_negatives_band_and_rank(spark):
    from sarkac_spark.operators.similarity import hard_negatives

    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(64)

    def mix(alpha):
        v = alpha * base + (1 - alpha) * rng.randn(64)
        return [float(x) for x in v]

    # vec 0 is the query; 1 is a near-positive (cos ~0.999), 2-4 sit
    # mid-band (cos ~0.83/0.79/0.58), 5 is pure noise (cos ~0)
    rows = [(0, [float(x) for x in base])] + [
        (i, mix(a)) for i, a in enumerate([0.95, 0.6, 0.5, 0.4, 0.0], start=1)
    ]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = hard_negatives(
        d, d.filter(F.col("vec_id") == 0), k=10, lo=0.3, hi=0.9
    ).collect()
    sims = {r.neighbor_id: r.cos_sim for r in out}
    # every returned similarity inside the band; ranks descending
    assert all(0.3 <= s < 0.9 for s in sims.values())
    ordered = sorted(out, key=lambda r: r.rank)
    assert [r.cos_sim for r in ordered] == sorted(
        (r.cos_sim for r in ordered), reverse=True
    )
    # the near-duplicate (cos > .9) is excluded as a positive, the
    # noise vector (cos ~0) as uninformative
    assert 1 not in sims and 5 not in sims
    assert set(sims) == {2, 3, 4}  # the mid-band vectors made it


def test_minhash_recall_query(spark, sf_dir):
    from sarkac_spark.queries.llm import q_minhash_recall

    r = q_minhash_recall(spark, sf_dir).collect()[0]
    # found is a subset of truth by construction, so recall is a true
    # ratio; at this corpus's operating point (near-dups are high-j)
    # banding should surface most of them
    assert 0 <= r.n_found <= r.n_true
    assert r.recall == round(r.n_found / r.n_true, 6)
    assert r.recall >= 0.8


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_histogram_quantiles_property(spark):
    """Property over adversarial distributions (skew, duplicates,
    negatives, tiny groups): the upper-edge estimate never undershoots
    the true quantile and overshoots by at most one bin width."""
    from hypothesis import given, settings, strategies as st

    from sarkac_spark.operators.sketch import histogram_quantiles

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60),
        st.integers(min_value=2, max_value=32),
    )
    def check(vals, k):
        d = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i long, v long"
        ).select(F.lit("g").alias("g"), "v")
        r = histogram_quantiles(d, "v", ["g"], qs=(0.5, 0.99), k=k).collect()[0]
        lo, hi = min(vals), max(vals)
        width = (hi - lo) / k
        s = sorted(vals)
        for q, est in [(0.5, r.p50_est), (0.99, r.p99_est)]:
            # true quantile = smallest value with cum count >= q*n
            true_q = s[max(0, math.ceil(q * len(s)) - 1)]
            assert est >= true_q - 1e-6
            assert est <= true_q + width + 1e-6

    check()


def test_incremental_dedup_equivalences(spark, sf_dir):
    from sarkac_spark.operators.dedup import (
        dedup_exact,
        dedup_minhash,
        dedup_minhash_incremental,
        incremental_exact_dedup,
    )
    from sarkac_spark.queries.llm import (
        JACCARD_THRESHOLD,
        MINHASH_BANDS,
        MINHASH_K,
    )
    from sarkac_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    new_pred = F.col("doc_id") % 5 == 0

    # exact: kept = batch rows that are corpus-unseen and batch-first —
    # equivalently, the batch members that are canonical in a full-corpus
    # dedup OR whose digest group lives entirely inside the batch with
    # them as its minimum
    seen = dedup_exact(d.filter(~new_pred), "doc_id", "text")
    kept = incremental_exact_dedup(d.filter(new_pred), seen, "doc_id", "text")
    kept_ids = {r.doc_id for r in kept.collect()}
    full = dedup_exact(d, "doc_id", "text").collect()
    # every kept id's digest must have NO smaller occurrence anywhere
    # outside the batch, and no smaller occurrence inside it
    seen_hashes = {r.text_hash for r in seen.collect()}
    for r in kept.collect():
        assert r.text_hash not in seen_hashes
    # determinism + shape
    assert kept.count() == len(kept_ids)

    # minhash: incremental pairs == full pairs restricted to >=1 new side
    dn = d.withColumn("is_new", new_pred)
    inc = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup_minhash_incremental(
            dn, "doc_id", "text", "is_new",
            k=MINHASH_K, bands=MINHASH_BANDS, threshold=JACCARD_THRESHOLD,
        ).collect()
    }
    full_pairs = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup_minhash(
            d, "doc_id", "text",
            k=MINHASH_K, bands=MINHASH_BANDS, threshold=JACCARD_THRESHOLD,
        ).collect()
        if r.id_a % 5 == 0 or r.id_b % 5 == 0
    }
    assert inc == full_pairs


def test_bloom_filter_guarantees(spark):
    """bloom_build/bloom_might_contain: NO false negatives ever (even
    under a deliberately saturated filter), small fp rate when sized
    right, and merge-by-union equals the filter built over the union —
    the mergeable-state contract shared with the other sketches."""
    from sarkac_spark.operators.sketch import bloom_build, bloom_might_contain

    corpus = spark.range(400).selectExpr("concat('in', id) AS v")
    probes = spark.range(200).selectExpr("concat('in', id) AS v").union(
        spark.range(200).selectExpr("concat('out', id) AS v")
    )

    # saturated: m=512 bits for 400 values -> high fp, still zero fn
    tiny = bloom_build(corpus, "v", m_bits=512, k_hashes=4)
    assert tiny.count() <= 512
    f1 = {
        r.v: r.might_contain
        for r in bloom_might_contain(tiny, probes, "v", 512, 4).collect()
    }
    assert all(f1[f"in{i}"] for i in range(200))  # no false negatives

    # right-sized: m=16384 -> fp ~(1-e^-0.098)^4 ~ 8e-5
    okf = bloom_build(corpus, "v", m_bits=16384, k_hashes=4)
    f2 = {
        r.v: r.might_contain
        for r in bloom_might_contain(okf, probes, "v", 16384, 4).collect()
    }
    assert all(f2[f"in{i}"] for i in range(200))
    assert sum(f2[f"out{i}"] for i in range(200)) <= 3

    # merge algebra: union of two blooms == bloom of the union
    c1 = spark.range(200).selectExpr("concat('in', id) AS v")
    c2 = spark.range(200, 400).selectExpr("concat('in', id) AS v")
    merged = (
        bloom_build(c1, "v", 16384, 4)
        .unionByName(bloom_build(c2, "v", 16384, 4))
        .distinct()
    )
    whole = {r.pos for r in okf.collect()}
    assert {r.pos for r in merged.collect()} == whole


def test_bloom_gated_join_equals_plain_join(spark):
    """bloom_gated_join: the gate drops definitely-unmatched fact rows
    BEFORE the join yet the result EQUALS the plain join exactly (no
    false negatives); semi mode ditto vs left_semi; and the map-side
    gate really fires (gated input strictly smaller than the fact when
    most keys can't match)."""
    from pyspark.sql import functions as F

    from sarkac_spark.operators.sketch import bloom_gated_join

    fact = spark.range(2_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 7).alias("v")
    )
    # dim matches only 50 of the 500 fact keys; includes payload col
    dim = spark.range(50).select(
        (F.col("id") * 10).alias("dk"), F.concat(F.lit("p"), F.col("id")).alias("attr")
    )
    got = {
        (r.k, r.v, r.attr)
        for r in bloom_gated_join(fact, dim, "k", "dk").collect()
    }
    want = {
        (r.k, r.v, r.attr)
        for r in fact.join(dim, fact["k"] == dim["dk"]).collect()
    }
    assert got == want and got  # equal AND non-trivial

    semi = bloom_gated_join(fact, dim, "k", "dk", how="semi")
    want_semi = fact.join(
        dim.select(F.col("dk").alias("k")), "k", "left_semi"
    )
    assert sorted(map(tuple, semi.collect())) == sorted(
        map(tuple, want_semi.collect())
    )

    # the GATE ALONE really thins the fact map-side (the downstream
    # exact join would mask a broken all-pass gate): with 450/500 keys
    # unmatched, survivors = 200 true matches + a tiny fp tail
    from sarkac_spark.operators.sketch import _bloom_gate

    n_gate = _bloom_gate(fact, dim, "k", "dk", 262144, 4).count()
    n_match = want_semi.count()
    assert n_match == 200  # 50 keys x 4 rows each
    assert n_match <= n_gate <= n_match + 8  # thinned, tiny fp budget

    # NULL fact keys fail the gate ITSELF (equi-join semantics): Spark's
    # xxhash64 skips NULL inputs, so without the explicit isNotNull
    # conjunct every NULL row would hash to the seed literal's k fixed
    # positions and could pass a dense bloom. Use a tiny saturated bloom
    # (m=64) so those positions are certainly set — the strongest case.
    null_fact = fact.unionByName(
        spark.range(5).select(
            F.lit(None).cast("long").alias("k"), F.col("id").alias("v")
        )
    )
    gated_nulls = _bloom_gate(null_fact, dim, "k", "dk", 64, 2)
    assert gated_nulls.filter(F.col("k").isNull()).count() == 0

    # guard rails: outer joins and mismatched key types are refused
    # loudly (both would silently break result == plain join)
    with pytest.raises(ValueError, match="inner"):
        bloom_gated_join(fact, dim, "k", "dk", how="left")
    with pytest.raises(ValueError, match="types"):
        bloom_gated_join(
            fact.withColumn("k", F.col("k").cast("double")), dim, "k", "dk"
        )


def test_hll_overlap_inclusion_exclusion(spark):
    """hll_overlap: each estimate within the b=12 error envelope and the
    inclusion-exclusion overlap within the summed envelopes; disjoint
    sets clamp to >= 0 (never a negative overlap)."""
    from sarkac_spark.operators.sketch import hll_overlap

    a = spark.range(0, 3000).selectExpr("concat('k', id) AS v")
    b = spark.range(2000, 6000).selectExpr("concat('k', id) AS v")
    row = hll_overlap(a, b, "v", b=12).collect()[0]
    env = 3 * 1.04 / (1 << 12) ** 0.5  # ~4.9%
    assert abs(row.est_a - 3000) / 3000 <= env
    assert abs(row.est_b - 4000) / 4000 <= env
    assert abs(row.est_union - 6000) / 6000 <= env
    assert abs(row.est_overlap - 1000) <= env * (3000 + 4000 + 6000)

    disj = spark.range(0, 500).selectExpr("concat('x', id) AS v")
    other = spark.range(0, 500).selectExpr("concat('y', id) AS v")
    row2 = hll_overlap(disj, other, "v", b=12).collect()[0]
    assert row2.est_overlap >= 0  # clamped inclusion-exclusion


def test_dup_ngram_fraction_planted_template(spark):
    from sarkac_spark.operators.dedup import dup_ngram_fraction

    # 20 docs share the same 6-word template prefix, each with a unique
    # 6-word tail; one fully-unique doc; one too-short doc (no 3-grams)
    tmpl = "the quick brown fox jumps over"
    rows = [
        (i, f"{tmpl} unique{i} tail{i} words{i} here{i} now{i} end{i}")
        for i in range(20)
    ]
    rows.append((100, "completely different content with no shared grams at all"))
    rows.append((101, "too short"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dup_ngram_fraction(df, "doc_id", "text", n=3).collect()}

    # the short doc yields no 3-grams -> no row
    assert 101 not in out and len(out) == 21
    # template docs: 12 words -> 10 grams; grams inside the 6-word
    # template (4 of them) appear in all 20 docs; the 2 bridge grams +
    # 4 tail grams are unique per doc
    for i in range(20):
        r = out[i]
        assert r.n_ngrams == 10 and r.n_dup == 4
        assert abs(r.dup_frac - 0.4) < 1e-9
    # the unique doc has zero duplicated occurrences
    assert out[100].n_dup == 0 and out[100].dup_frac == 0.0
    # multiplicity counts occurrences, not distinct grams: a doc that
    # repeats a shared gram twice counts it twice in both numerator and
    # denominator
    rep = spark.createDataFrame(
        [(0, "a b c x a b c"), (1, "a b c")], "doc_id long, text string"
    )
    r0 = {r.doc_id: r for r in dup_ngram_fraction(rep, "doc_id", "text", n=3).collect()}
    assert r0[0].n_ngrams == 5 and r0[0].n_dup == 2  # 'a b c' twice
    assert r0[1].n_ngrams == 1 and r0[1].n_dup == 1


def test_snapshot_diff_statuses(spark):
    from sarkac_spark.operators.profiling import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "GAMMA-EDITED"), (4, "delta")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in snapshot_diff(old, new, "doc_id", "text").collect()}
    assert {k: v.status for k, v in out.items()} == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "added",
    }
    assert out[1].new_fp is None and out[4].old_fp is None
    assert out[3].old_fp != out[3].new_fp and out[2].old_fp == out[2].new_fp
    # plan: exactly one join, no extra shuffle beyond its two exchanges
    plan = (
        snapshot_diff(old, new, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) == 1


def test_bpe_merge_pairs_counts(spark):
    from sarkac_spark.operators.text import bpe_merge_pairs

    # aaab x2 -> pairs (aa, aa, ab) each weighted 2; ab x1 -> (ab);
    # the 1-char word contributes nothing (and must not error)
    df = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "x")], "doc_id long, text string"
    )
    got = {r.pair: r for r in bpe_merge_pairs(df, "text", k=10).collect()}
    assert {p: r.occurrences for p, r in got.items()} == {"aa": 4, "ab": 3}
    assert got["aa"].rank == 1 and got["ab"].rank == 2


def test_bpe_merge_pairs_topk_tiebreak(spark):
    from sarkac_spark.operators.text import bpe_merge_pairs

    # equal counts -> pair-asc tie-break decides both the k-cut and rank
    df = spark.createDataFrame(
        [(1, "zz yy xx")], "doc_id long, text string"
    )
    got = bpe_merge_pairs(df, "text", k=2).collect()
    assert {(r.pair, r.rank) for r in got} == {("xx", 1), ("yy", 2)}


def test_zipf_fit_matches_reference_regression(spark):
    import math

    from sarkac_spark.operators.text import zipf_fit

    # counts proportional to 1/rank: an exact Zipf law, slope -1, r2 ~ 1
    counts = {"alpha": 1200, "beta": 600, "gamma": 400, "delta": 300, "eps": 240}
    text = " ".join(" ".join([w] * c) for w, c in counts.items())
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = zipf_fit(df, "text", top_k=10).first()
    assert row.n_terms == 5

    # replicate the documented integer-micro pipeline exactly
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (round(math.log10(i + 1) * 1e6), round(math.log10(c) * 1e6))
        for i, (_, c) in enumerate(ordered)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n / 1e6
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(row.slope - round(slope, 6)) < 2e-6
    assert abs(row.intercept - round(intercept, 6)) < 2e-6
    assert abs(row.r2 - round(r2, 6)) < 2e-6
    # counts ∝ 1/rank: slope -1 and a near-perfect fit by construction
    assert row.r2 > 0.999 and abs(row.slope - (-1.0)) < 1e-3


def test_contamination_spans_planted_quote(spark):
    from sarkac_spark.operators.dedup import contamination_spans

    quote = "the secret launch code is seven four nine two exactly"  # 10 words
    train = spark.createDataFrame(
        [
            (1, "filler words here " + quote + " trailing filler text"),
            (2, "unrelated training document about entirely other things"),
        ],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [
            (10, "novel eval content " + quote + " and novel conclusion words"),
            (11, "completely novel eval doc with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    out = contamination_spans(train, evald, "doc_id", "text", shingle_n=3, min_run=2)
    rows = {(r.eval_id, r.train_id): r for r in out.collect()}
    assert (10, 1) in rows  # the verbatim quote is detected
    assert (11, 1) not in rows and (10, 2) not in rows  # no false pairs
    r = rows[(10, 1)]
    # a 10-word quote = 8 consecutive 3-gram positions; the boundary
    # 3-grams straddling quote/context differ between train and eval,
    # so the run is exactly the quote
    assert r.max_run == 8
    assert r.span_words == 10
    assert r.n_matched_pos == 8


def test_hash_embed_bridges_text_to_semantic_dedup(spark):
    """End-to-end text -> hashing-trick embedding -> semantic dedup:
    identical texts produce identical unit vectors and the embedding-
    side dedup drops the later copy; unrelated text survives."""
    import math as _math

    from sarkac_spark.operators.similarity import semantic_dedup
    from sarkac_spark.operators.text import hash_embed

    a = "the quick brown fox jumps over the lazy dog near the river"
    b = "completely unrelated words about distributed query planning engines"
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, b)], "doc_id long, text string"
    )
    emb = hash_embed(df, "doc_id", "text", dim=16)
    vecs = {r.doc_id: r.embedding for r in emb.collect()}
    assert vecs[1] == vecs[2] and vecs[1] != vecs[3]
    for v in vecs.values():
        assert abs(_math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-4

    out = semantic_dedup(
        emb.select(F.col("doc_id").alias("vec_id"), "embedding"),
        dim=16,
        tau=0.95,
    )
    kept_ids = {r.vec_id for r in out.filter("kept = 1").collect()}
    assert 1 in kept_ids and 3 in kept_ids and 2 not in kept_ids


def test_hash_embed_emits_one_row_per_doc_including_empty_text(spark):
    """hash_embed relies on words_col returning [''] for empty text so
    the explode never drops a doc — pin the invariant (and the zero/
    near-empty docs' presence) so a words_col change that filters
    empties fails HERE, not as a silent row loss downstream."""
    from sarkac_spark.operators.text import hash_embed

    rows = [(1, "some real text here"), (2, ""), (3, "   "), (4, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.embedding for r in hash_embed(df, dim=8).collect()}
    assert set(out) == {1, 2, 3, 4}
    # unit norm (6-decimal rounded) for every emitted doc
    for vec in out.values():
        assert abs(sum(v * v for v in vec) - 1.0) < 1e-4


def test_quality_gate_raises_on_feature_column_collision(spark):
    from sarkac_spark.operators.classify import quality_gate

    df = spark.createDataFrame(
        [(1, "hello world", 99)], "doc_id long, text string, n_words long"
    )
    try:
        quality_gate(df)
        raise AssertionError("expected ValueError on n_words collision")
    except ValueError as e:
        assert "n_words" in str(e)


def test_dhash_invariances_and_planted_dups(spark):
    """The dHash kernel is exactly invariant to integer upscaling and
    non-clipping brightness shifts, and the banded pair operator
    catches planted resized/brightness-shifted dups while distinct
    images survive."""
    import numpy as np

    from sarkac_spark.operators.multimodal import (
        dedup_phash,
        dhash_bands_from_pixels,
        image_dhash,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 160, size=(24, 27), dtype=np.int64)
    up2 = np.kron(base, np.ones((2, 2), dtype=np.int64))       # 2x resize
    bright = base + 50                                          # brightness
    both = np.kron(base + 30, np.ones((3, 3), dtype=np.int64))  # 3x + shift
    assert (
        dhash_bands_from_pixels(base)
        == dhash_bands_from_pixels(up2)
        == dhash_bands_from_pixels(bright)
        == dhash_bands_from_pixels(both)
    )
    # a structurally different image hashes far away
    other = rng.integers(0, 160, size=(24, 27), dtype=np.int64)
    hb, ho = dhash_bands_from_pixels(base), dhash_bands_from_pixels(other)
    ham = sum(bin(a ^ b).count("1") for a, b in zip(hb, ho))
    assert ham > 12

    # a lightly corrupted variant lands within a small hamming ball
    noisy = base.copy()
    noisy[5, 7] += 90
    hn = dhash_bands_from_pixels(noisy)
    ham_n = sum(bin(a ^ b).count("1") for a, b in zip(hb, hn))
    assert ham_n <= 4

    # end-to-end over the REAL PNM decode path (P5 and P6)
    def p5(img):
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()

    def p6(img):
        h, w = img.shape
        rgb = np.repeat(img[:, :, None], 3, axis=2)
        return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype("uint8").tobytes()

    media = spark.createDataFrame(
        [
            (1, p5(base)),
            (2, p5(up2)),            # planted resize dup of 1
            (3, p6(bright)),         # planted brightness dup of 1, RGB
            (4, p5(noisy)),          # near-dup within the hamming ball
            (5, p5(other)),          # distinct — must survive
        ],
        "media_id long, payload binary",
    )
    pairs = dedup_phash(image_dhash(media), max_hamming=6, max_band_df=None)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(1, 2), (1, 3), (2, 3), (1, 4)} <= got
    assert not any(5 in p for p in got)


def test_dedup_phash_band_df_cap_bounds_hot_bands(spark):
    """Flat (constant) images all share every band — the df cap must
    exclude those bands from candidacy, the MINHASH_MAX_BAND_DF
    semantics for images."""
    import numpy as np

    from sarkac_spark.operators.multimodal import dedup_phash, image_dhash

    def p5(img):
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()

    flat = [(i, p5(np.full((24, 27), 100, dtype=np.int64))) for i in range(20)]
    media = spark.createDataFrame(flat, "media_id long, payload binary")
    hashes = image_dhash(media)
    uncapped = dedup_phash(hashes, max_hamming=6, max_band_df=None).count()
    capped = dedup_phash(hashes, max_hamming=6, max_band_df=10).count()
    assert uncapped == 20 * 19 // 2  # every pair, quadratic
    assert capped == 0  # every band hot -> excluded from candidacy


def test_audio_fingerprint_invariances_and_planted_dups(spark):
    """Frame-energy audio fingerprints are exactly invariant to global
    gain and integer resampling; the banded pair operator (shared with
    images) catches planted volume/resample dups while distinct clips
    survive."""
    import numpy as np

    from sarkac_spark.operators.multimodal import (
        afp_bands_from_samples,
        audio_fingerprint,
        dedup_phash,
        wav_bytes,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(-8190, 8191, size=1300).astype(np.int64)
    louder = base * 2                       # gain: energies x4
    resampled = np.repeat(base, 2)          # 2x duplication
    both = np.repeat(base * 3, 3)
    f = lambda s: afp_bands_from_samples(s.astype(np.float64) / 32768.0)
    assert f(base) == f(louder) == f(resampled) == f(both)

    other = rng.integers(-8190, 8191, size=1300).astype(np.int64)
    ham = sum(bin(a ^ b).count("1") for a, b in zip(f(base), f(other)))
    assert ham > 12

    media = spark.createDataFrame(
        [
            (1, wav_bytes(base)),
            (2, wav_bytes(louder)),      # planted volume dup
            (3, wav_bytes(resampled)),   # planted resample dup
            (4, wav_bytes(other)),       # distinct — must survive
        ],
        "media_id long, payload binary",
    )
    pairs = dedup_phash(
        audio_fingerprint(media), max_hamming=6, max_band_df=None
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= got
    assert not any(4 in p for p in got)


def test_video_fingerprint_planted_dups(spark):
    """Frame-sequence fingerprints: a video whose every frame is a
    brightness/resize variant of another's pairs within the hamming
    budget; reordered or different-scene frames do not."""
    import numpy as np

    from sarkac_spark.operators.multimodal import dedup_phash, video_fingerprint

    rng = np.random.default_rng(5)

    def p5(img):
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()

    frames_a = [rng.integers(0, 160, size=(24, 27), dtype=np.int64)
                for _ in range(3)]
    rows = []
    for f, img in enumerate(frames_a):
        rows.append((1, f, p5(img)))                              # original
        rows.append((2, f, p5(np.kron(img + 40, np.ones((2, 2),
                                                        dtype=np.int64)))))
    # 3: same frames in a DIFFERENT order — frame-major banding must
    # not pair it band-for-band (band_idx carries the frame position)
    for f, img in enumerate(reversed(frames_a)):
        rows.append((3, f, p5(img)))
    # 4: unrelated scenes
    for f in range(3):
        rows.append((4, f, p5(rng.integers(0, 160, size=(24, 27),
                                           dtype=np.int64))))
    frames = spark.createDataFrame(rows, "media_id long, frame_idx int, payload binary")
    pairs = dedup_phash(
        video_fingerprint(frames), max_hamming=6, max_band_df=None
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert not any(4 in p for p in got)
    # the reversed video shares frame HASHES but at shifted positions;
    # it may band-collide only if some frame repeats — with 3 distinct
    # random frames it must not pair with 1 under the tight budget
    assert (1, 3) not in got

    # length-mismatched fingerprints are SCORED, never null-dropped: a
    # truncated copy (frames 0,1 of video 1) band-matches on its shared
    # frames and each missing band counts 16 bits of distance
    frames2 = frames.union(
        spark.createDataFrame(
            [(5, f, p5(img)) for f, img in enumerate(frames_a[:2])],
            "media_id long, frame_idx int, payload binary",
        )
    )
    wide = dedup_phash(
        video_fingerprint(frames2), max_hamming=70, max_band_df=None
    ).collect()
    trunc = {(r.id_a, r.id_b): r.hamming for r in wide}
    assert trunc[(1, 5)] == 4 * 16  # one missing frame = 4 all-bit bands
    tight = dedup_phash(video_fingerprint(frames2), max_hamming=6,
                        max_band_df=None)
    assert (1, 5) not in {(r.id_a, r.id_b) for r in tight.collect()}


def test_injected_codec_composes_with_dedup_phash(spark):
    """The codec-injection contract, exercised with a real (pure-
    Python) compressed format: ZPPM = b"ZPPM" + zlib(binary PPM). The
    injected pixel decoder drives image_dhash -> dedup_phash end-to-end
    (planted dups found, distinct images survive), band values are
    bit-identical to the uncompressed path (the kernel sees only
    pixels), the same decoder slots into extract_features' decoder=
    seam, and the default path still refuses the compressed payload
    loudly."""
    import zlib

    import numpy as np

    from sarkac_spark.operators.multimodal import (
        dedup_phash,
        extract_features,
        image_dhash,
    )

    def p5(img):
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()

    def zppm(img):
        return b"ZPPM" + zlib.compress(p5(img))

    def zppm_pixels(raw: bytes) -> np.ndarray:
        from sarkac_spark.operators.multimodal import decode_pnm

        assert raw[:4] == b"ZPPM", "not a ZPPM payload"
        return decode_pnm(zlib.decompress(raw[4:]))[0]

    rng = np.random.default_rng(11)
    base = rng.integers(0, 160, size=(24, 27), dtype=np.int64)
    up2 = np.kron(base, np.ones((2, 2), dtype=np.int64))
    other = rng.integers(0, 160, size=(24, 27), dtype=np.int64)
    media = spark.createDataFrame(
        [(1, zppm(base)), (2, zppm(up2)), (3, zppm(other))],
        "media_id long, payload binary",
    )

    # default path refuses the compressed payload loudly
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with _pytest.raises((PythonException, Py4JJavaError)):
        image_dhash(media).collect()

    # injected decoder: end-to-end dedup finds the planted resize dup
    hashes = image_dhash(media, pixel_decoder=zppm_pixels)
    pairs = dedup_phash(hashes, max_hamming=6, max_band_df=None)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)

    # bit-identical to the uncompressed path — the kernel sees pixels
    plain = spark.createDataFrame(
        [(1, p5(base)), (2, p5(up2)), (3, p5(other))],
        "media_id long, payload binary",
    )
    a = {r.media_id: r.dhash_bands for r in hashes.collect()}
    b = {r.media_id: r.dhash_bands for r in image_dhash(plain).collect()}
    assert a == b

    # the same codec slots into extract_features' decoder= seam
    def zppm_features(raw: bytes, kind: str) -> list[float]:
        px = zppm_pixels(raw).astype(np.float64)
        return [float(px.shape[1]), float(px.shape[0]), round(float(px.mean()), 6)]

    feats = extract_features(
        media.withColumn("kind", F.lit("image")), decoder=zppm_features
    )
    rows = {r.media_id: r.feature for r in feats.collect()}
    assert rows[1][:2] == [27.0, 24.0]
    assert rows[2][:2] == [54.0, 48.0]


def test_injected_audio_codec_composes_with_dedup_phash(spark):
    """The audio flavor of the codec-injection contract (VERDICT r10
    ask #6): ZWAV = b"ZWAV" + zlib(PCM WAV). The injected sample
    decoder drives audio_fingerprint -> dedup_phash end-to-end, bands
    are bit-identical to the uncompressed path (the kernel sees only
    samples), and the default path refuses the compressed payload
    loudly."""
    import zlib

    import numpy as np
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from sarkac_spark.operators.multimodal import (
        audio_fingerprint,
        decode_wav,
        dedup_phash,
        wav_bytes,
    )

    def zwav(samples):
        return b"ZWAV" + zlib.compress(wav_bytes(samples))

    def zwav_samples(raw: bytes) -> np.ndarray:
        assert raw[:4] == b"ZWAV", "not a ZWAV payload"
        return decode_wav(zlib.decompress(raw[4:]))[0]

    rng = np.random.default_rng(7)
    base = (rng.standard_normal(4000) * 8000).astype(np.int16)
    dup = np.repeat(base, 2)  # 2x sample-duplication: same energy shape
    other = (rng.standard_normal(4000) * 8000).astype(np.int16)
    media = spark.createDataFrame(
        [(1, zwav(base)), (2, zwav(dup)), (3, zwav(other))],
        "media_id long, payload binary",
    )

    with _pytest.raises((PythonException, Py4JJavaError)):
        audio_fingerprint(media).collect()

    fps = audio_fingerprint(media, sample_decoder=zwav_samples)
    pairs = dedup_phash(fps, max_hamming=6, max_band_df=None)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)

    plain = spark.createDataFrame(
        [(1, wav_bytes(base)), (2, wav_bytes(dup)), (3, wav_bytes(other))],
        "media_id long, payload binary",
    )
    a = {r.media_id: r.dhash_bands for r in fps.collect()}
    b = {r.media_id: r.dhash_bands for r in audio_fingerprint(plain).collect()}
    assert a == b


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_injected_video_codec_composes_with_dedup_phash(spark):
    """The per-frame video flavor: compressed frame payloads (same ZPPM
    format as the image test) decode through video_fingerprint's
    pixel_decoder= seam; frame-major band assembly and the banded
    pairing are unchanged, bands bit-identical to the uncompressed
    path."""
    import zlib

    import numpy as np
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from sarkac_spark.operators.multimodal import (
        dedup_phash,
        decode_pnm,
        video_fingerprint,
    )

    def p5(img):
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()

    def zppm(img):
        return b"ZPPM" + zlib.compress(p5(img))

    def zppm_pixels(raw: bytes) -> np.ndarray:
        assert raw[:4] == b"ZPPM", "not a ZPPM payload"
        return decode_pnm(zlib.decompress(raw[4:]))[0]

    rng = np.random.default_rng(13)
    f0 = rng.integers(0, 160, size=(24, 27), dtype=np.int64)
    f1 = rng.integers(0, 160, size=(24, 27), dtype=np.int64)
    g0 = rng.integers(0, 160, size=(24, 27), dtype=np.int64)
    g1 = rng.integers(0, 160, size=(24, 27), dtype=np.int64)
    up = lambda img: np.kron(img, np.ones((2, 2), dtype=np.int64))  # noqa: E731
    rows = [
        (1, 0, zppm(f0)), (1, 1, zppm(f1)),          # video 1
        (2, 0, zppm(up(f0))), (2, 1, zppm(up(f1))),  # resized dup of 1
        (3, 0, zppm(g0)), (3, 1, zppm(g1)),          # distinct video
    ]
    frames = spark.createDataFrame(
        rows, "media_id long, frame_idx int, payload binary"
    )

    with _pytest.raises((PythonException, Py4JJavaError)):
        video_fingerprint(frames).collect()

    fps = video_fingerprint(frames, pixel_decoder=zppm_pixels)
    pairs = dedup_phash(fps, max_hamming=12, max_band_df=None)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)

    plain = spark.createDataFrame(
        [(i, fi, p5(img if i != 2 else img)) for (i, fi, _), img in zip(
            rows, [f0, f1, up(f0), up(f1), g0, g1]
        )],
        "media_id long, frame_idx int, payload binary",
    )
    a = {r.media_id: r.dhash_bands for r in fps.collect()}
    b = {
        r.media_id: r.dhash_bands
        for r in video_fingerprint(plain).collect()
    }
    assert a == b


def test_duplicate_spans_merges_maximal_runs(spark):
    """duplicate_spans: consecutive duplicated k-grams merge into ONE
    maximal word-indexed run per region (two shared regions in a doc =
    two rows, split by the gap); runs below min_words are filtered;
    within-doc repetition alone does not count (distinct-doc df >= 2);
    and a shared region is found at DIFFERENT word offsets in each doc
    (the case span_dedup's fixed windows miss)."""
    from sarkac_spark.operators.dedup import duplicate_spans

    S = "alpha bravo charlie delta echo foxtrot golf hotel"      # 8 words
    T = "india juliet kilo lima mike november"                   # 6 words
    U = "oscar papa quebec romeo sierra tango"                   # 6 words
    rows = [
        (1, f"u1 u2 {S} z1 z2 z3 {T}"),   # S at pos 2..9, T at pos 13..18
        (2, f"b1 {S} b2"),                # S at pos 1..8
        (3, f"{T} c1 c2"),                # T at pos 0..5
        (4, f"{U} filler1 filler2 {U}"),  # within-doc repeat only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_words)
        for r in duplicate_spans(df, k=3, min_words=5).collect()
    }
    assert got == {
        (1, 2, 8),   # S in doc 1: maximal, exact offset + length
        (1, 13, 6),  # T in doc 1: second region, separate row
        (2, 1, 8),   # S in doc 2 at a different offset
        (3, 0, 6),   # T in doc 3
    }
    # min_words filters the 6-word runs, keeps the 8-word ones
    got7 = {
        (r.doc_id, r.span_start, r.span_words)
        for r in duplicate_spans(df, k=3, min_words=7).collect()
    }
    assert got7 == {(1, 2, 8), (2, 1, 8)}


def test_duplicate_spans_words_df_parity(spark):
    """duplicate_spans(words_df=prebuilt) — the r12 shared-scan seam
    used by remove_duplicate_spans — returns exactly the rows of the
    self-splitting path, for a prebuilt relation built with the same
    words_col splitter (with or without extra columns present)."""
    from pyspark.sql import functions as F

    from sarkac_spark.operators.dedup import duplicate_spans, words_col

    S = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [(1, f"u1 u2 {S}"), (2, f"b1 {S} b2"), (3, "lone wolf text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        (r.doc_id, r.span_start, r.span_words)
        for r in duplicate_spans(df, k=3, min_words=5).collect()
    }
    prebuilt = df.select(
        F.col("doc_id"), F.col("text"), words_col("text").alias("__w")
    )
    via = {
        (r.doc_id, r.span_start, r.span_words)
        for r in duplicate_spans(
            df, k=3, min_words=5, words_df=prebuilt
        ).collect()
    }
    assert via == base and base  # non-empty parity


def test_remove_duplicate_spans_cuts_exactly_the_spans(spark):
    """remove_duplicate_spans: excises exactly the word positions of
    every qualifying duplicate_spans row (hand-checked rebuild),
    leaves span-free docs untouched with n_removed=0, and — the
    round-trip property — a re-run of duplicate_spans on the cleaned
    corpus at the same k/min_df/min_words finds nothing. Plan stays
    JVM-side (no Python stage)."""
    from sarkac_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )
    from sarkac_spark.plans import executed_plan

    S = "alpha bravo charlie delta echo foxtrot golf hotel"      # 8 words
    T = "india juliet kilo lima mike november"                   # 6 words
    U = "oscar papa quebec romeo sierra tango"                   # 6 words
    rows = [
        (1, f"u1 u2 {S} z1 z2 z3 {T}"),
        (2, f"b1 {S} b2"),
        (3, f"{T} c1 c2"),
        (4, f"{U} filler1 filler2 {U}"),  # within-doc repeat: kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cleaned = remove_duplicate_spans(df, k=3, min_words=5)
    assert "BatchEvalPython" not in executed_plan(cleaned)
    got = {r.doc_id: (r.text_clean, r.n_removed) for r in cleaned.collect()}

    # hand-computed rebuilds: spans (1,2,8),(1,13,6),(2,1,8),(3,0,6)
    assert got[1] == ("u1 u2 z1 z2 z3", 14)
    assert got[2] == ("b1 b2", 8)
    assert got[3] == ("c1 c2", 6)
    assert got[4] == (f"{U} filler1 filler2 {U}", 0)  # untouched

    # exactness: text_clean is EXACTLY the words at positions not
    # covered by any reported span, in order — recomputed here
    # independently from the duplicate_spans evidence
    spans = duplicate_spans(df, k=3, min_words=5).collect()
    words = {r.doc_id: r.text.split() for r in df.collect()}
    covered: dict[int, set[int]] = {}
    for s in spans:
        covered.setdefault(s.doc_id, set()).update(
            range(s.span_start, s.span_start + s.span_words)
        )
    for doc_id, ws in words.items():
        cov = covered.get(doc_id, set())
        expect = " ".join(w for i, w in enumerate(ws) if i not in cov)
        if cov:
            assert got[doc_id] == (expect, len(cov))
        else:
            # span-free docs pass through byte-identical (no rebuild)
            assert got[doc_id] == (dict(rows)[doc_id], 0)

    # round-trip: the cleaned corpus has no qualifying spans left
    re_df = spark.createDataFrame(
        [(k, v[0]) for k, v in got.items()], "doc_id long, text string"
    )
    assert duplicate_spans(re_df, k=3, min_words=5).count() == 0

    # min_words raises the bar: only the 8-word S regions are cut
    cleaned7 = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in remove_duplicate_spans(df, k=3, min_words=7).collect()
    }
    assert cleaned7[1] == (f"u1 u2 z1 z2 z3 {T}", 8)
    assert cleaned7[3] == (f"{T} c1 c2", 0)

    # mask mode: word count and offsets preserved, covered words
    # replaced, n_removed counts the masked words
    masked = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in remove_duplicate_spans(
            df, k=3, min_words=5, mask_token="<dup>"
        ).collect()
    }
    m1 = masked[1][0].split()
    assert len(m1) == len(rows[0][1].split())
    assert m1[:2] == ["u1", "u2"] and m1[10:13] == ["z1", "z2", "z3"]
    assert set(m1[2:10]) == {"<dup>"} and set(m1[13:]) == {"<dup>"}
    assert masked[1][1] == 14
    assert masked[4] == (rows[3][1], 0)

    # untouched docs keep their ORIGINAL bytes — tabs, newlines, runs
    # of spaces are NOT collapsed by a needless rebuild
    df_ws = spark.createDataFrame(
        [(10, "solo\tdoc  with\nirregular   spacing")],
        "doc_id long, text string",
    )
    r = remove_duplicate_spans(df_ws, k=3, min_words=5).collect()[0]
    assert (r.text_clean, r.n_removed) == (
        "solo\tdoc  with\nirregular   spacing",
        0,
    )


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_remove_duplicate_spans_fp_reaches_fixed_point(spark):
    """Fixed-point excision: cutting the duplicated middles makes docs
    1 and 3 identical — a NEW qualifying run only a second pass can
    see. The fp operator cuts it; single-pass provably cannot."""
    from sarkac_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
        remove_duplicate_spans_fp,
    )

    Q1 = "q1a q1b q1c q1d"
    Q2 = "q2a q2b q2c q2d"
    D = "d1 d2 d3 d4 d5 d6 d7"
    rows = [(1, f"{Q1} {D} {Q2}"), (2, f"e1 {D} e2"), (3, f"{Q1} {Q2}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # pass 1 cuts only D (the sole >=7-word cross-doc run): docs 1 and
    # 3 become identical, doc 2 keeps its unique frame
    one = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in remove_duplicate_spans(df, k=3, min_words=7).collect()
    }
    assert one[1] == (f"{Q1} {Q2}", 7)
    assert one[2] == ("e1 e2", 7)
    assert one[3] == (f"{Q1} {Q2}", 0)

    got = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in remove_duplicate_spans_fp(
            df, k=3, min_words=7, max_iters=3
        ).collect()
    }
    assert got[1] == ("", 15)   # 7 (pass 1: D) + 8 (pass 2: Q1 Q2)
    assert got[2] == ("e1 e2", 7)
    assert got[3] == ("", 8)

    # the fixed point holds: no qualifying span remains at the same
    # k / min_words / min_doc_df
    re_df = spark.createDataFrame(
        [(i, t) for i, (t, _) in got.items()], "doc_id long, text string"
    )
    assert duplicate_spans(re_df, k=3, min_words=7).count() == 0

    # max_iters=1 degenerates to the single-pass operator
    lim = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in remove_duplicate_spans_fp(
            df, k=3, min_words=7, max_iters=1
        ).collect()
    }
    assert lim == one


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_remove_duplicate_spans_fp_restricted_equals_full_rerun(spark):
    """The r12 restricted fixed point (pass >= 2 recomputes grams only
    for touched docs + updates gram doc-df incrementally) is
    row-identical to ``restricted=False`` (the literal full re-run) —
    on the two documented hazard corpora and on randomized high-
    duplication corpora at max_iters 2 and 3.

    Hazard (a): gram df must be counted over the FULL current corpus —
    a subset-restricted recount undercounts grams shared with untouched
    docs. Hazard (b): an UNtouched doc can gain a qualifying span in
    pass 2 when a touched doc's excision seam assembles a gram the
    untouched doc already held at df = min_doc_df - 1."""
    import random

    from sarkac_spark.operators.dedup import remove_duplicate_spans_fp

    def run(df, **kw):
        return sorted(
            (r.doc_id, r.text_clean, r.n_removed)
            for r in remove_duplicate_spans_fp(df, **kw).collect()
        )

    # hazard corpus: cutting D makes docs 1 and 3 identical; doc 3 is
    # UNTOUCHED in pass 1 (n_removed=0) and is cut in pass 2 only via
    # doc 1's seam grams raising its bridge grams' df to 2 (hazard b);
    # the bridge grams' df=2 count needs doc 3 itself (hazard a)
    Q1, Q2, D = "q1a q1b q1c q1d", "q2a q2b q2c q2d", "d1 d2 d3 d4 d5 d6 d7"
    rows = [(1, f"{Q1} {D} {Q2}"), (2, f"e1 {D} e2"), (3, f"{Q1} {Q2}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for mi in (1, 2, 3):
        kw = dict(k=3, min_words=7, max_iters=mi)
        assert run(df, restricted=True, **kw) == run(
            df, restricted=False, **kw
        ), f"hazard corpus diverged at max_iters={mi}"

    # randomized: tiny vocab + short docs => dense duplication, lots of
    # threshold crossings in both directions across passes
    rng = random.Random(12)
    for trial in range(4):
        rows = [
            (
                i,
                " ".join(
                    rng.choice("t0 t1 t2 t3 t4 t5 t6 t7".split())
                    for _ in range(rng.randint(4, 24))
                ),
            )
            for i in range(40)
        ]
        rdf = spark.createDataFrame(rows, "doc_id long, text string")
        for mi in (2, 3):
            kw = dict(k=2, min_words=4, min_doc_df=3, max_iters=mi)
            assert run(rdf, restricted=True, **kw) == run(
                rdf, restricted=False, **kw
            ), f"random corpus trial={trial} diverged at max_iters={mi}"


def test_pca_rotation_decorrelates_and_composes(spark):
    """pca_rotation/apply_rotation: orthonormal deterministic-sign
    basis; the rotated store has (near-)diagonal covariance with
    variances descending; centered norms are preserved (rotation, not a
    scaling); truncation keeps the top-k axes; and the projection stays
    JVM-side (no Python stage in the plan)."""
    import numpy as np

    from sarkac_spark.operators.similarity import (
        apply_rotation,
        embedding_covariance,
        pca_rotation,
    )
    from sarkac_spark.plans import executed_plan

    rng = np.random.default_rng(5)
    # anisotropic, correlated 6-dim cloud
    base = rng.standard_normal((300, 2))
    mix = np.hstack(
        [base @ rng.standard_normal((2, 4)) * [3.0, 1.5, 0.8, 0.3],
         rng.standard_normal((300, 2)) * 0.1]
    ) + [1.0, -2.0, 0.5, 0.0, 3.0, -1.0]
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mix)],
        "vec_id long, embedding array<float>",
    )

    comps, mu = pca_rotation(df)
    C = np.array(comps)
    assert np.allclose(C @ C.T, np.eye(6), atol=1e-8)  # orthonormal
    # deterministic sign: largest-|coeff| entry positive per component
    for row in C:
        assert row[np.argmax(np.abs(row))] > 0

    rot = apply_rotation(df, comps, mu)
    assert "BatchEvalPython" not in executed_plan(rot)
    X = np.array([r.rotated for r in rot.select("rotated").collect()])
    cov = np.cov(X.T, bias=True)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-6  # decorrelated
    d = np.diag(cov)
    assert np.all(np.diff(d) <= 1e-9)  # variance descending
    centered = np.array(mix, dtype=np.float32) - np.array(mu)
    assert np.allclose(
        np.linalg.norm(X, axis=1), np.linalg.norm(centered, axis=1),
        rtol=1e-5,
    )  # norms preserved

    top2 = apply_rotation(df, comps, mu, n_components=2)
    X2 = np.array([r.rotated for r in top2.select("rotated").collect()])
    assert X2.shape == (300, 2)
    assert np.allclose(X2, X[:, :2], atol=1e-9)

    # the covariance relation itself agrees with numpy on this corpus
    got = {
        (r.i, r.j): r.cov for r in embedding_covariance(df).collect()
    }
    want = np.cov(np.array(mix, dtype=np.float32).T, bias=True)
    for (i, j), v in got.items():
        assert abs(v - want[i, j]) < 1e-4, (i, j, v, want[i, j])

    # shift-invariance: centering by any sample vector leaves the
    # rounded covariance unchanged (and tames naive-form cancellation)
    shift = [float(x) for x in mix[0]]
    got_shifted = {
        (r.i, r.j): r.cov
        for r in embedding_covariance(df, shift=shift).collect()
    }
    for k, v in got.items():
        assert abs(got_shifted[k] - v) < 1e-6, (k, v, got_shifted[k])
    comps_s, mu_s = pca_rotation(df, shift=shift)
    assert np.allclose(np.array(mu_s), np.array(mu), atol=1e-6)
    # only the well-separated axes: the two 0.1-noise dims form a
    # near-degenerate eigenvalue pair whose basis is unstable under
    # the 1e-12 perturbation the shift introduces
    assert np.allclose(np.array(comps_s)[:4], C[:4], atol=1e-4)


def test_balanced_subspace_order_balances_products():
    """OPQ parametric allocation: descending eigenvalues are dealt so
    each subspace's variance PRODUCT is near-equal; permutation is
    complete; non-divisible d refuses."""
    import math

    import pytest as _pytest

    from sarkac_spark.operators.similarity import balanced_subspace_order

    order = balanced_subspace_order([8.0, 4.0, 2.0, 1.0], m=2)
    assert sorted(order) == [0, 1, 2, 3]
    assert order == [0, 3, 1, 2]  # products: 8*1 == 4*2
    evals = [float(2 ** -i) for i in range(8)]
    order8 = balanced_subspace_order(evals, m=4)
    assert sorted(order8) == list(range(8))
    prods = [
        math.prod(evals[a] for a in order8[i * 2 : i * 2 + 2])
        for i in range(4)
    ]
    assert max(prods) / min(prods) <= 4.0  # geometric deal stays tight
    with _pytest.raises(ValueError, match="divisible"):
        balanced_subspace_order([1.0, 2.0, 3.0], m=2)


def test_opq_rotation_decision_gate(spark):
    """opq_rotation_decision (r11 ask #4): near-isotropic stores stay
    unrotated (the re-confirmed null regime); anisotropic stores get
    rotate=True with a balanced-permuted orthonormal basis ready for
    apply_rotation. Audit numbers ride along either way."""
    import sys
    from pathlib import Path

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from gen_scale_data import gen_embeddings

    from sarkac_spark.operators.similarity import opq_rotation_decision

    def to_df(table):
        return spark.createDataFrame(
            table.to_pandas(), "vec_id long, embedding array<float>, label int"
        )

    iso = opq_rotation_decision(
        to_df(gen_embeddings(400, np.random.default_rng(3))), m=8
    )
    assert iso["rotate"] is False
    assert iso["eig_spread"] < 20 and iso["offdiag_mass"] < 3
    assert "components" not in iso

    aniso = opq_rotation_decision(
        to_df(gen_embeddings(400, np.random.default_rng(3), anisotropy=200)),
        m=8,
    )
    assert aniso["rotate"] is True
    assert aniso["eig_spread"] > 20
    C = np.array(aniso["components"])
    assert C.shape == (64, 64)
    assert np.allclose(C @ C.T, np.eye(64), atol=1e-8)  # still a rotation
    assert len(aniso["mean"]) == 64


def test_embedding_covariance_signed_zero_normalized(spark):
    """r11 driver red-row pin: a covariance that rounds to zero from
    the NEGATIVE side must come out +0.0 on BOTH engines. Spark's
    round() already drops the sign; the oracle's `round(...) + 0` must
    strip DuckDB's preserved -0.0 (IEEE: -0.0 + 0.0 = +0.0). Also pins
    that the hardened moments (shift) don't break the zero case."""
    import math

    import duckdb

    from sarkac_spark.operators.similarity import embedding_covariance

    # dim 0 and dim 1 engineered so cov(0,1) = -1e-9 exactly in
    # population form: x = [-1, 1], y = [1e-9, -1e-9], n = 2
    # -> cov = (sum(xy) - sum(x)sum(y)/n)/n = (-2e-9 - 0)/2 = -1e-9
    df = spark.createDataFrame(
        [(0, [-1.0, 1e-9]), (1, [1.0, -1e-9])],
        "vec_id long, embedding array<double>",
    )
    rows = {(r.i, r.j): r.cov for r in embedding_covariance(df).collect()}
    assert rows[(0, 1)] == 0.0
    assert math.copysign(1.0, rows[(0, 1)]) > 0, "Spark emitted -0.0"
    # same data, shifted moments: zero stays unsigned
    rows_s = {
        (r.i, r.j): r.cov
        for r in embedding_covariance(df, shift=[-1.0, 1e-9]).collect()
    }
    assert rows_s[(0, 1)] == 0.0
    assert math.copysign(1.0, rows_s[(0, 1)]) > 0

    # the registered oracle emits +0.0 for the same construction
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        "(0, [CAST(-1.0 AS DOUBLE), CAST(1e-9 AS DOUBLE)], 0), "
        "(1, [CAST(1.0 AS DOUBLE), CAST(-1e-9 AS DOUBLE)], 0)"
        ") t(vec_id, embedding, label)"
    )
    from sarkac_spark.queries.llm import ORACLE

    oracle = {(i, j): c for i, j, c in con.sql(
        ORACLE["embedding_covariance"]
    ).fetchall()}
    assert oracle[(0, 1)] == 0.0
    assert math.copysign(1.0, oracle[(0, 1)]) > 0, "oracle emitted -0.0"

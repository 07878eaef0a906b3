"""Classifier-based quality filtering: integer-logit scoring semantics
and the MLlib fit -> quantize -> relational-score round trip."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sarkac_spark.operators.classify import (
    DEFAULT_BIAS_MILLI,
    DEFAULT_WEIGHTS_MILLI,
    FEATURES,
    fit_quality_lr,
    logistic_quality_score,
    quality_feature_frame,
)

GOOD = (
    "the river carried cold water past the quiet village while farmers "
    "walked along the bank discussing the coming harvest and the roads "
    "they would need before winter arrived in the northern valley"
)
BAD_DIGITS = "4823 9911 3004 77 120391 555 23 881 0 42 17 93 5550 123456 777"
BAD_PUNCT = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) ;;; ::: ,,, ... ---"
BAD_SHORT = "ok"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(40):
        rows.append((i, f"{GOOD} variant {chr(97 + i % 26)}"))
    for i in range(40, 60):
        rows.append((i, BAD_DIGITS))
    for i in range(60, 80):
        rows.append((i, BAD_PUNCT))
    for i in range(80, 90):
        rows.append((i, BAD_SHORT))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_logit_matches_manual_computation(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    feats = {
        r: v
        for r, v in zip(
            FEATURES,
            quality_feature_frame(df).select(*FEATURES).first(),
        )
    }
    expected = DEFAULT_BIAS_MILLI * 1_000_000 + sum(
        DEFAULT_WEIGHTS_MILLI[f] * feats[f] for f in FEATURES
    )
    row = logistic_quality_score(df).first()
    assert row.logit_nano == expected
    assert row.keep == (expected >= 0)


def test_default_weights_separate_planted_quality(corpus):
    got = {r.doc_id: r.keep for r in logistic_quality_score(corpus).collect()}
    for i in range(40):
        assert got[i], f"good doc {i} was dropped"
    for i in range(40, 90):
        assert not got[i], f"junk doc {i} was kept"


def test_threshold_is_monotone_in_logit(corpus):
    scored = logistic_quality_score(corpus, threshold_nano=0)
    strict = logistic_quality_score(corpus, threshold_nano=2_000_000_000)
    kept = {r.doc_id for r in scored.filter("keep").collect()}
    kept_strict = {r.doc_id for r in strict.filter("keep").collect()}
    assert kept_strict <= kept  # raising the bar can only shrink the set


def test_unknown_weight_feature_raises(corpus):
    with pytest.raises(ValueError, match="unknown features"):
        logistic_quality_score(corpus, weights_milli={"not_a_feature": 1})


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_fit_quantize_score_round_trip(corpus):
    """The distillation loop: fit MLlib LR on gopher weak labels, feed
    the quantized milli-weights back into the relational scorer, and
    check the scorer reproduces the MLlib model's own decisions (the
    planted margins dwarf the 1e-3 quantization error)."""
    weights_milli, bias_milli = fit_quality_lr(corpus)
    scored = {
        r.doc_id: r.keep
        for r in logistic_quality_score(
            corpus, weights_milli=weights_milli, bias_milli=bias_milli
        ).collect()
    }
    # MLlib's own sigmoid decision, recomputed driver-side from the
    # exact float weights on the same micro-unit features
    feats = quality_feature_frame(corpus).collect()
    for row in feats:
        logit = bias_milli / 1000 + sum(
            (weights_milli[f] / 1000) * (row[f] / 1_000_000) for f in FEATURES
        )
        assert scored[row.doc_id] == (logit >= 0) or abs(logit) < 0.01

    # and the fit actually learned the planted separation
    assert all(scored[i] for i in range(40))
    assert not any(scored[i] for i in range(40, 80))


@pytest.mark.slow  # measured >=14 s in the r13 duration profile
def test_fit_fraction_subsamples_deterministically(corpus):
    w1, b1 = fit_quality_lr(corpus, fit_fraction=0.7)
    w2, b2 = fit_quality_lr(corpus, fit_fraction=0.7)
    assert (w1, b1) == (w2, b2)  # hash sample + seeded fit => reproducible


def test_curator_classifier_stage(spark, corpus):
    """The Curator 'classifier' quality stage equals the hand-built
    gate and preserves the input schema."""
    from sarkac_spark.curator import Curator

    cur = Curator(spark, {"quality": {"classifier": True}})
    out = cur.apply(corpus)
    assert out.columns == corpus.columns
    kept = {r.doc_id for r in out.collect()}
    expect = {
        r.doc_id
        for r in logistic_quality_score(corpus).filter("keep").collect()
    }
    assert kept == expect and kept  # equal and non-trivial

    rep = cur.report(corpus)
    assert rep["input"] == 90 and rep["quality"] == len(kept)


def test_quality_gate_runs_on_streams(spark, tmp_path):
    """quality_gate is stateless map-only, so the SAME call works on a
    streaming DataFrame — stream result == batch result."""
    from sarkac_spark.operators.classify import quality_gate

    rows = [(1, GOOD), (2, BAD_DIGITS), (3, BAD_PUNCT), (4, BAD_SHORT)]
    schema = "doc_id long, text string"
    src = tmp_path / "qgate_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        quality_gate(stream)
        .filter("keep")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("qgate_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM qgate_out").collect()}
    batch = {
        r.doc_id
        for r in quality_gate(spark.createDataFrame(rows, schema))
        .filter("keep")
        .collect()
    }
    assert got == batch == {1}


def test_curator_mixture_stage(spark):
    """The Curator 'mixture' stage equals hand-applied apply_mixture and
    may grow the row count (epochs > 1 repeats)."""
    from sarkac_spark.curator import Curator
    from sarkac_spark.operators.sampling import apply_mixture

    rows = [(i, "a", "text body") for i in range(40)] + [
        (i, "b", "text body") for i in range(40, 60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, stratum string, text string")
    targets = {"a": 0.5, "b": 0.5}
    cur = Curator(
        spark, {"mixture": {"targets": targets, "stratum_col": "stratum"}}
    )
    out = cur.apply(df)
    assert out.columns == df.columns + ["epoch_copy"]
    expect = apply_mixture(df, "doc_id", "stratum", targets)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_calibration_table_realizes_target_rates(spark, corpus):
    from sarkac_spark.operators.classify import calibration_table

    out = {r.keep_rate: r for r in calibration_table(corpus).collect()}
    assert set(out) == {0.25, 0.5, 0.75}
    n = corpus.count()
    for rate, row in out.items():
        # the percentile threshold guarantees AT LEAST the target rate;
        # tied logits (the fixture's 40 near-identical good docs) can
        # only push the realized count above it, never below
        assert row.n_kept >= rate * n - 2
    # monotone: a higher keep rate can only lower the threshold and
    # grow the kept set
    assert (
        out[0.25].threshold_nano
        >= out[0.5].threshold_nano
        >= out[0.75].threshold_nano
    )
    assert out[0.25].n_kept <= out[0.5].n_kept <= out[0.75].n_kept

"""Classifier-based quality filtering — the distilled-classifier stage
of modern pretraining pipelines (the fastText quality filter of
CCNet/LLaMA, FineWeb-Edu's learned scorer): cheap heuristic labels
train a small model once, and the model's SCORING pass is what runs
corpus-wide.

The two halves are deliberately split along the oracle boundary, the
same contract as the MLlib anomaly family (`operators/mllib_anomaly.py`):

- ``logistic_quality_score`` — the corpus-wide scoring pass. Pure
  relational arithmetic over ``quality_features`` (map-only, no
  shuffle, no Python), with the logit computed in EXACT INTEGER
  nano-units so a DuckDB oracle matches bit-for-bit: features are
  6-decimal ratios (scale 1e6, long), weights are integer milli-units,
  and the logit is emitted as the BIGINT ``logit_nano`` (divide by 1e9
  for the real-valued logit) — float summation never happens, so
  cross-engine rounding cannot flip a hash. The keep decision
  ``logit >= threshold`` is identical to thresholding the sigmoid
  probability at ``1/(1+exp(-threshold))`` because the sigmoid is
  monotone — emitting the logit instead of the probability avoids
  cross-engine ``exp`` entirely.

- ``fit_quality_lr`` — the fit: MLlib ``LogisticRegression`` over the
  same feature vector, weak-labeled by ``gopher_rules``' conjunction
  (heuristic labels standing in for the human/LLM labels real
  pipelines distill from). Iterative training is not SQL-expressible,
  so like the MLlib anomaly fits it is pytest-proven
  (fit->quantize->score equivalence in `tests/test_classify.py`), not
  oracle-checked; the returned weights quantize straight into
  ``logistic_quality_score``'s milli-unit contract.

Scale shape: scoring is a scan (one map-only projection — survives any
corpus that scans, no skew surface). Fitting runs on a SAMPLE by
design (`fit_fraction`): a distilled classifier never needs 100 TB of
labels, and the deterministic hash-sample keeps the fit reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sarkac_spark.operators.text import gopher_rules, quality_features

# Feature contract: name -> (micro-unit column builder over the
# quality_features relation). All features are dimensionless and
# bounded so hand-set default weights are sane:
#   unique_ratio   in [0,1]   lexical diversity
#   len_term       in [0,1]   min(n_words/100, 1) — length credit, capped
#   mean_word_len  in [0,~12] typical natural text sits near 4-6
#   punct_ratio    in [0,1]   punctuation noise
#   digit_ratio    in [0,1]   digit spam
FEATURES = ("unique_ratio", "len_term", "mean_word_len", "punct_ratio", "digit_ratio")

# Hand-set default milli-weights (the "shipped model"): reward
# diversity and length, mildly reward word length, punish noise.
# mean_word_len's weight is per unit length (so 125 ~= 1.5 over the
# 12-char cap, without ever dividing by 12 — keeps the logit integer).
# Calibrated so a median natural-prose doc sits just above 0 while
# one-word stubs, digit spam, and punctuation floods land well below
# (margins >= ~0.2 in logit units — see tests/test_classify.py).
DEFAULT_WEIGHTS_MILLI = {
    "unique_ratio": 1500,
    "len_term": 2500,
    "mean_word_len": 125,
    "punct_ratio": -3000,
    "digit_ratio": -3000,
}
DEFAULT_BIAS_MILLI = -2500

_MICRO = 1_000_000


def _micro(col) -> F.Column:
    """6-decimal ratio -> exact integer micro-units (the value was
    already rounded to 6 decimals, so round() here only strips the
    float representation error of that rounding)."""
    return F.round(F.col(col) * _MICRO).cast("long")


def _micro_features() -> dict[str, F.Column]:
    """Feature-name -> micro-unit Column, over a quality_features
    relation."""
    return {
        "unique_ratio": _micro("unique_ratio"),
        "len_term": F.least(F.col("n_words") * 10_000, F.lit(_MICRO)).cast("long"),
        "mean_word_len": _micro("mean_word_len"),
        "punct_ratio": _micro("punct_ratio"),
        "digit_ratio": _micro("digit_ratio"),
    }


def _logit_col(
    weights_milli: dict[str, int] | None,
    bias_milli: int,
    features: dict[str, F.Column],
) -> F.Column:
    w = dict(DEFAULT_WEIGHTS_MILLI if weights_milli is None else weights_milli)
    unknown = set(w) - set(FEATURES)
    if unknown:
        raise ValueError(f"unknown features in weights: {sorted(unknown)}")
    logit = F.lit(int(bias_milli) * _MICRO).cast("long")
    for name, milli in sorted(w.items()):
        logit = logit + F.lit(int(milli)).cast("long") * features[name]
    return logit


def quality_feature_frame(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, feature micro-units) — the shared projection both the fit
    and the scorer consume. Map-only."""
    feats = quality_features(df, text_col)
    return feats.select(
        F.col(id_col),
        *[expr.alias(name) for name, expr in _micro_features().items()],
    )


def logistic_quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights_milli: dict[str, int] | None = None,
    bias_milli: int = DEFAULT_BIAS_MILLI,
    threshold_nano: int = 0,
) -> DataFrame:
    """Score every document with a logistic quality classifier and gate
    at ``threshold_nano`` (0 == probability 0.5).

    Output: (id, logit_nano BIGINT, keep BOOLEAN). logit_nano is the
    exact integer ``bias_milli*1e6 + sum(w_milli * feature_micro)``;
    the real-valued logit is logit_nano/1e9 and the probability is
    ``sigmoid(logit_nano/1e9)`` — monotone, so the keep gate is the
    same set either way.

    Integer bound: |logit_nano| <= (|bias| + sum|w| * max_feat) * 1e6
    ~ 1.3e10 for the defaults — far inside BIGINT, no overflow at any
    corpus size (the bound is per-row, not per-corpus).
    """
    return quality_gate(
        df, id_col, text_col, weights_milli, bias_milli, threshold_nano
    ).select(id_col, "logit_nano", "keep")


def quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights_milli: dict[str, int] | None = None,
    bias_milli: int = DEFAULT_BIAS_MILLI,
    threshold_nano: int = 0,
) -> DataFrame:
    """``df`` with ``logit_nano``/``keep`` APPENDED (all original
    columns preserved) — the map-only filter form the Curator stage
    and streaming pipelines consume: ``quality_gate(df).filter("keep")``
    adds zero shuffles and zero joins, and being stateless it runs
    unchanged on a streaming DataFrame (no watermark, no state store).
    Same integer-logit semantics as ``logistic_quality_score``.

    Raises on input columns that collide with the computed feature /
    output names: ``quality_features``'s withColumns would silently
    OVERWRITE them, and the preserved-passthrough promise would return
    recomputed features instead of the caller's data.
    """
    reserved = {
        "n_words",
        "n_unique_words",
        "unique_ratio",
        "mean_word_len",
        "punct_ratio",
        "digit_ratio",
        "logit_nano",
        "keep",
    }
    clash = sorted(reserved.intersection(df.columns))
    if clash:
        raise ValueError(
            f"quality_gate: input columns {clash} collide with computed "
            "feature/output names and would be silently overwritten - "
            "rename them first"
        )
    feats = quality_features(df, text_col)
    logit = _logit_col(weights_milli, bias_milli, _micro_features())
    return feats.select(
        *df.columns,
        logit.alias("logit_nano"),
        (logit >= F.lit(int(threshold_nano))).alias("keep"),
    )


def fit_quality_lr(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fit_fraction: float = 1.0,
    salt: str = "qlr_fit",
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> tuple[dict[str, int], int]:
    """Distill ``gopher_rules``' pass/fail conjunction into a logistic
    model over the quality features (MLlib LogisticRegression), and
    return ``(weights_milli, bias_milli)`` quantized straight into
    ``logistic_quality_score``'s integer contract.

    The model is fit on micro-unit features SCALED BACK to their real
    ranges (x/1e6), so a returned weight of w means "w per unit of the
    documented feature" and quantizes as round(w*1000) milli-units —
    the same convention as DEFAULT_WEIGHTS_MILLI.

    ``fit_fraction < 1`` samples the fit set with the deterministic
    hash variate (retry-safe, engine-stable) — at 100 TB the fit never
    reads the full corpus; only scoring does.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from sarkac_spark.operators.sampling import SAMPLE_MOD, sample_hash

    base = df
    if fit_fraction < 1.0:
        cutoff = int(round(fit_fraction * SAMPLE_MOD))
        base = df.filter(sample_hash(id_col, salt) < F.lit(cutoff))

    labels = gopher_rules(base, text_col).select(
        F.col(id_col), F.col("passes").cast("double").alias("label")
    )
    feats = quality_feature_frame(base, id_col, text_col)
    scaled = feats.select(
        id_col,
        *[(F.col(c) / F.lit(float(_MICRO))).alias(c) for c in FEATURES],
    )
    train = scaled.join(labels, id_col)
    assembled = VectorAssembler(
        inputCols=list(FEATURES), outputCol="features"
    ).transform(train)
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=True
    ).fit(assembled)
    weights_milli = {
        name: int(round(float(coef) * 1000))
        for name, coef in zip(FEATURES, model.coefficients)
    }
    return weights_milli, int(round(float(model.intercept) * 1000))


def calibration_table(
    df: DataFrame,
    keep_rates: tuple[float, ...] = (0.25, 0.5, 0.75),
    id_col: str = "doc_id",
    text_col: str = "text",
    weights_milli: dict[str, int] | None = None,
    bias_milli: int = DEFAULT_BIAS_MILLI,
) -> DataFrame:
    """Threshold calibration for the quality gate: for each target
    ``keep_rate``, the exact logit percentile that realizes it
    (``threshold_nano`` = percentile(logit, 1-rate)) and the keep count
    that threshold actually yields — what an operator reads before
    setting ``threshold_nano`` for a corpus-wide pass ("keep the best
    half" instead of trusting the shipped 0 cutoff on a shifted corpus).

    Output: (keep_rate, threshold_nano, n_kept), one row per rate.

    Scale shape: one scoring scan (map-only), one exact-percentile
    aggregation per rate over the SAME relation (conditional aggs, no
    re-scan), then a broadcast of the |rates|-row threshold dim back
    over the logits for the realized counts. Exact percentiles buffer
    the logit column per group on the reducer — at true 100 TB swap in
    approx_percentile; the calibration question tolerates sketch error.
    """
    scored = logistic_quality_score(
        df, id_col, text_col, weights_milli, bias_milli
    ).select("logit_nano")
    # percentile fractions must be literals (both engines), so all rates
    # compute in ONE aggregation pass over the same relation
    aggs = [
        F.round(
            F.expr(f"percentile(logit_nano, {1.0 - float(r)!r})").cast("double"),
            6,
        ).alias(f"__t{i}")
        for i, r in enumerate(keep_rates)
    ]
    one = scored.agg(*aggs)
    thr = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(r)).alias("keep_rate"),
                        F.col(f"__t{i}").alias("threshold_nano"),
                    )
                    for i, r in enumerate(keep_rates)
                ]
            )
        ).alias("s")
    ).select("s.*")
    return (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("keep_rate", "threshold_nano")
        .agg(
            F.sum(
                F.when(F.col("logit_nano") >= F.col("threshold_nano"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_kept")
        )
    )

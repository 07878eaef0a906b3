"""Deterministic sampling operators: reproducibility, stratification,
and split disjointness are the contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from sarkac_spark.operators.sampling import (
    hash_sample,
    sample_hash,
    stratified_sample,
    train_eval_split,
)


def _corpus(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("lang"),
    )


def test_hash_sample_deterministic_and_calibrated(spark):
    d = _corpus(spark)
    a = hash_sample(d, "doc_id", 0.3, salt="s1")
    assert a.count() == hash_sample(d, "doc_id", 0.3, salt="s1").count()
    ids_a = {r.doc_id for r in a.collect()}
    ids_b = {r.doc_id for r in hash_sample(d, "doc_id", 0.3, salt="s2").collect()}
    assert ids_a != ids_b  # independent draw per salt
    rate = len(ids_a) / 2000
    assert 0.25 < rate < 0.35  # calibration within binomial noise

    # monotone: a smaller rate is a subset of a larger one (same salt)
    small = {r.doc_id for r in hash_sample(d, "doc_id", 0.1, salt="s1").collect()}
    assert small <= ids_a


def test_stratified_sample_rates_and_default(spark):
    d = _corpus(spark)
    out = stratified_sample(
        d, "doc_id", "lang", {"en": 0.2, "de": 1.0}, default_rate=0.0
    )
    by_lang = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("de") == 400  # rate 1.0 keeps every row
    assert "fr" not in by_lang  # default 0.0 drops unlisted strata
    assert 0.12 < by_lang["en"] / 1200 < 0.28


def test_train_eval_split_disjoint_and_stable(spark):
    d = _corpus(spark, n=1000)
    s = train_eval_split(d, "doc_id", eval_rate=0.2)
    counts = {r.split: r.n for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["eval"] + counts["train"] == 1000
    assert 0.14 < counts["eval"] / 1000 < 0.26
    # same rows land in the same split on recompute
    again = {(r.doc_id, r.split) for r in train_eval_split(d, "doc_id", eval_rate=0.2).collect()}
    assert {(r.doc_id, r.split) for r in s.collect()} == again


def test_sampling_filter_is_map_only(spark):
    from sarkac_spark.plans import shuffle_count

    d = _corpus(spark)
    assert shuffle_count(hash_sample(d, "doc_id", 0.5)) == 0
    # the rate dim must broadcast, never shuffle the fact side
    assert (
        shuffle_count(stratified_sample(d, "doc_id", "lang", {"en": 0.5})) == 0
    )


def test_sample_per_group(spark):
    from sarkac_spark.operators.sampling import sample_per_group

    d = _corpus(spark, n=1000)  # 200 docs per lang
    out = sample_per_group(d, "doc_id", "lang", 50)
    by = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(by.values()) == {50}  # exact budget per group
    # deterministic: identical id set across invocations
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {r.doc_id for r in sample_per_group(d, "doc_id", "lang", 50).collect()}
    assert ids1 == ids2
    # a group smaller than the budget survives whole
    tiny = sample_per_group(d.filter(F.col("doc_id") < 20), "doc_id", "lang", 50)
    assert tiny.count() == 20


def test_weighted_mix_replication(spark):
    from sarkac_spark.operators.sampling import weighted_mix

    d = _corpus(spark, n=1000)
    out = weighted_mix(
        d, "doc_id", "lang", {"de": 3.0, "fr": 0.0}, default_weight=1.0
    )
    by = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by["de"] == 600  # integer weight: exactly 3 copies of 200 rows
    assert "fr" not in by  # weight 0 drops the source
    assert by["en"] == 600  # default 1.0 passes through
    # copies are labeled 1..n and deterministic across reruns
    copies = {r.copy for r in out.filter(F.col("lang") == "de").collect()}
    assert copies == {1, 2, 3}
    again = weighted_mix(
        d, "doc_id", "lang", {"de": 3.0, "fr": 0.0}, default_weight=1.0
    ).count()
    assert again == out.count()


def test_weighted_mix_fractional_calibration(spark):
    from sarkac_spark.operators.sampling import weighted_mix

    d = _corpus(spark, n=2000)
    out = weighted_mix(d, "doc_id", "lang", {"en": 1.5}, default_weight=1.0)
    n_en = out.filter(F.col("lang") == "en").count()
    assert 1600 < n_en < 2000  # 1200 x 1.5 = 1800 +/- binomial noise


def test_temperature_mix_rates_temper_head(spark):
    from sarkac_spark.operators.sampling import temperature_mix_rates

    rows = [(i, "en" if i < 900 else ("de" if i < 990 else "sw")) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {r.lang: r for r in temperature_mix_rates(df, "lang", alpha=0.5).collect()}
    # sqrt tempering: head thinned, tail kept whole
    assert rates["en"].sample_rate < 1.0
    assert rates["sw"].sample_rate == 1.0
    # mixture weights ordered but compressed vs natural proportions
    assert rates["en"].mix_weight > rates["de"].mix_weight > rates["sw"].mix_weight
    assert rates["en"].mix_weight < 0.9  # natural share was 0.9
    total_w = sum(r.mix_weight for r in rates.values())
    assert abs(total_w - 1.0) < 1e-4


def test_temperature_sample_is_deterministic_subset(spark):
    from sarkac_spark.operators.sampling import temperature_sample

    rows = [(i, "en" if i % 10 else "sw") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = {r.doc_id for r in temperature_sample(df, "doc_id", "lang", alpha=0.5).collect()}
    b = {r.doc_id for r in temperature_sample(df, "doc_id", "lang", alpha=0.5).collect()}
    assert a == b and a  # reproducible
    # tail stratum survives whole (rate 1), head is thinned
    assert {i for i in range(500) if i % 10 == 0} <= a
    assert len(a) < 500


def test_pack_sequences_budget_and_determinism(spark):
    from pyspark.sql import functions as F

    from sarkac_spark.operators.sampling import pack_sequences

    rows = [(i, 40) for i in range(200)]  # uniform 40-token docs
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_sequences(df, "doc_id", F.col("n_tok"), budget=100, n_groups=4)
    got = out.collect()
    assert len(got) == 200  # every doc packed exactly once

    # per-sequence totals: greedy concat-then-split means each sequence
    # holds >= budget tokens except the tail of each group, and overflows
    # by at most one document
    seqs = {}
    for r in got:
        seqs.setdefault((r.pack_group, r.seq_id), []).append(r)
    for (g, s), members in seqs.items():
        tot = 40 * len(members)
        assert tot < 100 + 40  # budget + one doc max
    # seq_pos is a dense 1..n ordinal within each sequence
    for members in seqs.values():
        assert sorted(m.seq_pos for m in members) == list(
            range(1, len(members) + 1)
        )

    again = pack_sequences(
        df, "doc_id", F.col("n_tok"), budget=100, n_groups=4
    ).collect()
    assert {(r.doc_id, r.seq_id, r.seq_pos) for r in again} == {
        (r.doc_id, r.seq_id, r.seq_pos) for r in got
    }


def test_pack_sequences_single_shuffle(spark):
    from pyspark.sql import functions as F

    from sarkac_spark.operators.sampling import pack_sequences
    from sarkac_spark.plans import shuffle_count

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit(32).alias("n_tok")
    )
    out = pack_sequences(df, "doc_id", F.col("n_tok"), budget=256, n_groups=4)
    # the (group, seq) window must reuse the group-hash exchange: one
    # shuffle total, or packing 100 TB pays a second full-data exchange
    assert shuffle_count(out) == 1


def test_domain_cap_keeps_best_per_domain(spark):
    from sarkac_spark.operators.sampling import domain_cap

    d = _corpus(spark).withColumn("n_chars", (F.col("doc_id") * 37) % 500)
    out = domain_cap(d, "lang", 3, "n_chars", "doc_id")
    rows = out.collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == {"en", "de", "fr"}
    for lang, kept in by_lang.items():
        assert len(kept) == 3
        assert sorted(r.domain_rank for r in kept) == [1, 2, 3]
        # kept docs are the 3 largest n_chars within the domain
        # (ties broken to smallest doc_id)
        full = sorted(
            (r.n_chars, -r.doc_id)
            for r in d.filter(F.col("lang") == lang).collect()
        )[-3:]
        assert sorted((r.n_chars, -r.doc_id) for r in kept) == full

    # cap larger than the domain keeps everything
    assert domain_cap(d, "lang", 10_000, "n_chars", "doc_id").count() == 2000


def test_weighted_sample_es(spark):
    from sarkac_spark.operators.sampling import weighted_sample

    # one overwhelming weight among uniform ones: A-ES keeps it
    d = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("src"),
        F.when(F.col("id") == 7, F.lit(100000.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    top = weighted_sample(d, "doc_id", "w", 50)  # global draw
    ids = {r.doc_id for r in top.collect()}
    assert len(ids) == 50 and 7 in ids
    assert sorted(r.sample_rank for r in top.collect()) == list(range(1, 51))

    # per-stratum draw: exact budget per stratum, heavy doc ranks first
    # in its stratum
    per = weighted_sample(d, "doc_id", "w", 10, stratum_col="src")
    rows = per.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r)
    assert all(len(v) == 10 for v in by_src.values())
    heavy = [r for r in rows if r.doc_id == 7]
    assert heavy and heavy[0].sample_rank == 1

    # deterministic under repartitioning; zero/negative weights excluded
    re_ids = {
        r.doc_id
        for r in weighted_sample(d.repartition(17, "doc_id"), "doc_id", "w", 50).collect()
    }
    assert re_ids == ids
    dz = d.withColumn("w", F.when(F.col("doc_id") < 990, F.lit(0.0)).otherwise(F.col("w")))
    kept = {r.doc_id for r in weighted_sample(dz, "doc_id", "w", 50).collect()}
    assert kept == {i for i in range(990, 1000)}


def test_assign_shards_deterministic_uniform_and_map_only(spark):
    from sarkac_spark.operators.sampling import assign_shards

    df = _corpus(spark)
    a = assign_shards(df, "doc_id", 16).select("doc_id", "shard_id")
    b = assign_shards(df.repartition(7), "doc_id", 16).select("doc_id", "shard_id")
    # pure function of (id, salt): partitioning-independent, stable
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    counts = [r.n for r in a.groupBy("shard_id").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 16
    # uniform deal: 2000 rows / 16 shards = 125 expected, allow 4 sigma
    assert max(counts) - min(counts) < 90
    # different salt draws an independent deal
    c = assign_shards(df, "doc_id", 16, salt="other")
    moved = (
        a.join(c.withColumnRenamed("shard_id", "s2"), "doc_id")
        .filter("shard_id != s2")
        .count()
    )
    assert moved > 1500  # ~15/16 of rows should move
    # map-only: no exchange in the assignment plan
    assert "Exchange" not in a._jdf.queryExecution().executedPlan().toString()


def test_shard_manifest_balance_audit(spark):
    from sarkac_spark.operators.sampling import shard_manifest

    df = _corpus(spark).withColumn("n_chars", F.lit(10) + F.col("doc_id") % 7)
    m = shard_manifest(
        df, "doc_id", 8, weights={"n_chars": F.col("n_chars")}
    ).collect()
    assert len(m) == 8
    assert sum(r.n_docs for r in m) == 2000
    total = sum(r.n_chars for r in m)
    # load_ratio is load / (total/n_shards): mean over shards is exactly 1
    mean_ratio = sum(r.load_ratio for r in m) / 8
    assert abs(mean_ratio - 1.0) < 1e-4
    for r in m:
        assert abs(r.load_ratio - r.n_chars / (total / 8)) < 1e-5
    # no weights: audit on doc counts
    m2 = shard_manifest(df, "doc_id", 8).collect()
    assert {r.shard_id for r in m2} == {r.shard_id for r in m}
    assert all(abs(r.load_ratio - r.n_docs / 250) < 1e-5 for r in m2)


def test_mixture_plan_epochs_identity_and_unknown_stratum(spark):
    from sarkac_spark.operators.sampling import mixture_plan

    df = _corpus(spark)
    targets = {"en": 0.5, "de": 0.3, "xx": 0.2}  # fr absent -> weight 0
    plan = {r.lang: r for r in mixture_plan(df, "lang", targets).collect()}
    assert set(plan) == {"en", "de", "fr"}  # strata from data, not spec
    total = sum(r.n_tokens for r in plan.values())
    for lang, r in plan.items():
        # epochs realizes the target: epochs * load / total == target_w
        assert abs(r.epochs * r.n_tokens / total - r.target_weight) < 1e-4
        assert abs(r.natural_share - r.n_tokens / total) < 1e-5
    assert plan["fr"].target_weight == 0.0 and plan["fr"].epochs == 0.0
    # en is 60% of rows but targeted at 50% -> downsample; de upsamples
    assert plan["en"].epochs < 1.0 < plan["de"].epochs
    # explicit budget scales epochs linearly
    half = {r.lang: r for r in mixture_plan(df, "lang", targets, budget=total // 2).collect()}
    assert abs(half["de"].epochs - plan["de"].epochs / 2) < 1e-3


def test_cluster_split_no_pair_straddles_and_degrades_to_per_doc(spark):
    from sarkac_spark.operators.sampling import cluster_split

    df = _corpus(spark, n=1000)
    # planted near-dup graph: chains {i, i+1000->no..} use triples
    # {3k, 3k+1, 3k+2} for k < 100 as A~B, B~C pairs (closure must
    # merge them); docs >= 300 are singletons
    pairs = spark.range(100).selectExpr(
        "id * 3 AS id_a", "id * 3 + 1 AS id_b"
    ).union(spark.range(100).selectExpr("id * 3 + 1", "id * 3 + 2"))
    out = cluster_split(df, "doc_id", pairs, eval_rate=0.3)
    assert out.count() == 1000

    # THE invariant: no planted pair straddles the split
    sides = out.select("doc_id", "split")
    a = pairs.join(sides.withColumnRenamed("doc_id", "id_a"), "id_a")
    ab = a.join(
        sides.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
            "split", "split_b"
        ),
        "id_b",
    )
    assert ab.filter("split != split_b").count() == 0
    # and each triple shares one split_key = min id of the triple
    keys = {r.doc_id: r.split_key for r in out.collect()}
    for k in range(100):
        assert keys[3 * k] == keys[3 * k + 1] == keys[3 * k + 2] == 3 * k

    # the naive per-doc split DOES leak on the same fixture (the
    # failure mode this operator exists to close)
    naive = train_eval_split(df, "doc_id", eval_rate=0.3).select(
        "doc_id", "split"
    )
    na = pairs.join(naive.withColumnRenamed("doc_id", "id_a"), "id_a")
    nab = na.join(
        naive.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
            "split", "split_b"
        ),
        "id_b",
    )
    assert nab.filter("split != split_b").count() > 0

    # singletons: draw on own id == train_eval_split's assignment
    single = out.filter("doc_id >= 300")
    ref = train_eval_split(df.filter("doc_id >= 300"), "doc_id", eval_rate=0.3)
    diff = (
        single.join(ref.withColumnRenamed("split", "ref_split"), "doc_id")
        .filter("split != ref_split")
        .count()
    )
    assert diff == 0
    # calibration survives clustering (draws are per-key, rate ~0.3)
    n_eval = out.filter("split = 'eval'").count()
    assert 0.2 < n_eval / 1000 < 0.4


def test_apply_mixture_realizes_expected_load(spark):
    from pyspark.sql import functions as F

    from sarkac_spark.operators.sampling import apply_mixture

    rows = [(i, "a") for i in range(400)] + [(i, "b") for i in range(400, 600)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    # loads: a=400, b=200, total=600; targets 50/50 =>
    # epochs_a = 600*.5/400 = 0.75 (downsample), epochs_b = 1.5 (repeat)
    out = apply_mixture(df, "doc_id", "stratum", {"a": 0.5, "b": 0.5})
    assert out.columns == ["doc_id", "stratum", "epoch_copy"]

    per = {
        r.stratum: r.n
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    # expectation 300 each; hash Bernoulli over 200-400 draws — ±20%
    assert abs(per["a"] - 300) < 60 and abs(per["b"] - 300) < 60

    # epochs>1: every b doc keeps its guaranteed full copy (epoch_copy 0)
    b_copy0 = out.filter("stratum = 'b' and epoch_copy = 0").count()
    assert b_copy0 == 200
    # epochs<1: a docs never repeat
    assert out.filter("stratum = 'a' and epoch_copy > 0").count() == 0

    # deterministic: the realized schedule is a pure function of inputs
    again = apply_mixture(df, "doc_id", "stratum", {"a": 0.5, "b": 0.5})
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_apply_mixture_integer_epochs_exact(spark):
    from sarkac_spark.operators.sampling import apply_mixture

    df = spark.createDataFrame(
        [(i, "only") for i in range(50)], "doc_id long, stratum string"
    )
    # one stratum at weight 1.0 => epochs exactly 1.0 => identity, copy 0
    out = apply_mixture(df, "doc_id", "stratum", {"only": 1.0}).collect()
    assert len(out) == 50 and all(r.epoch_copy == 0 for r in out)

    # absent stratum => epochs 0 => dropped entirely
    none = apply_mixture(df, "doc_id", "stratum", {"other": 1.0})
    assert none.count() == 0

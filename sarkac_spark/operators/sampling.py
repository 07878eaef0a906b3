"""Deterministic sampling operators for training-data curation.

A 100 TB corpus pipeline needs *reproducible* sampling — `RAND()` is
banned (re-runs and retried tasks would see different rows; Spark task
retries make nondeterministic filters actively dangerous). Everything
here derives a uniform variate from a 60-bit md5 prefix of the row id
(same construction as operators/dedup._h60, identical in DuckDB), so:

- the sample is a pure function of (id, salt) — stable across runs,
  engines, partitionings, and task retries;
- changing the salt draws an independent sample;
- every operator is a map-only filter: no shuffle, fully pushed into
  the scan stage, scale-free.

Ops:
- ``hash_sample``        — Bernoulli p-sample of a table.
- ``stratified_sample``  — per-stratum rates (broadcast dim join),
  the "rebalance languages / sources" curation move.
- ``train_eval_split``   — disjoint deterministic split labels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# u = h60(salt|id) % MOD gives ~6 significant digits of rate
# resolution; cutoff comparison stays in integers (bit-identical
# across engines, no float rounding at the boundary)
SAMPLE_MOD = 1_000_000
_HASH_HEX_LEN = 15


def sample_hash(id_col, salt: str) -> F.Column:
    """The shared variate: 60-bit md5 prefix of 'salt|id', mod 1e6.
    ``id_col`` may be a column name or any Column expression (e.g. a
    cluster representative id for group-level draws)."""
    key = F.col(id_col) if isinstance(id_col, str) else id_col
    payload = F.concat_ws("|", F.lit(salt), key.cast("string"))
    h = F.conv(F.substring(F.md5(payload), 1, _HASH_HEX_LEN), 16, 10).cast("long")
    return h % SAMPLE_MOD


def _cutoff(rate: float) -> int:
    return int(round(rate * SAMPLE_MOD))


def hash_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Keep each row iff hash(salt|id) falls below the rate cutoff."""
    return df.filter(sample_hash(id_col, salt) < F.lit(_cutoff(rate)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum Bernoulli rates — downsample dominant strata, keep
    rare ones (the language/source-rebalancing curation op). The rate
    table is a literal broadcast dim; the filter itself never shuffles
    the fact side."""
    spark = df.sparkSession
    rate_df = spark.createDataFrame(
        [(k, _cutoff(v)) for k, v in rates.items()],
        f"{stratum_col} string, __cutoff long",
    )
    return (
        df.join(F.broadcast(rate_df), on=stratum_col, how="left")
        .filter(
            sample_hash(id_col, salt)
            < F.coalesce(F.col("__cutoff"), F.lit(_cutoff(default_rate)))
        )
        .drop("__cutoff")
    )


def train_eval_split(
    df: DataFrame, id_col: str, eval_rate: float = 0.01, salt: str = "split"
) -> DataFrame:
    """Label every row 'eval' or 'train', disjoint and deterministic —
    the same doc never leaks across the split on any rerun."""
    return df.withColumn(
        "split",
        F.when(
            sample_hash(id_col, salt) < F.lit(_cutoff(eval_rate)), F.lit("eval")
        ).otherwise(F.lit("train")),
    )


def weighted_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Weighted corpus mixing — the epoch-composition curation op:
    weight w replicates each row floor(w) times plus one more with
    probability frac(w) (hash-deterministic, same variate construction
    as the samplers). w < 1 downsamples, w > 1 oversamples; the output
    carries ``copy`` (1-based) so downstream shuffles spread replicas.

    Map-side explode only — the expected output is |rows| x mean(w),
    and no shuffle is introduced; the weight table is a literal
    broadcast dim.
    """
    spark = df.sparkSession
    w_df = spark.createDataFrame(
        [(k, int(v), _cutoff(v - int(v))) for k, v in weights.items()],
        f"{source_col} string, __whole int, __frac_cutoff long",
    )
    whole = F.coalesce(F.col("__whole"), F.lit(int(default_weight)))
    frac_cutoff = F.coalesce(
        F.col("__frac_cutoff"), F.lit(_cutoff(default_weight - int(default_weight)))
    )
    n_copies = whole + F.when(
        sample_hash(id_col, salt) < frac_cutoff, F.lit(1)
    ).otherwise(F.lit(0))
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(1), n_copies.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.join(F.broadcast(w_df), on=source_col, how="left")
        .withColumn("copy", F.explode(copies))
        .drop("__whole", "__frac_cutoff")
    )


def sample_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n_per_group: int,
    salt: str = "pergroup",
) -> DataFrame:
    """Deterministic fixed-budget sample per group: the n rows with the
    smallest hash rank within each group — "give me exactly 100 docs per
    language", reproducible across runs/retries/engines (the same
    no-rand() contract as the other samplers; a distributed reservoir
    sample without the nondeterminism).

    One shuffle on the group key; the row_number window orders by the
    60-bit hash variate with the id as total-order tiebreak. Skew note:
    a giant group sorts its partition — for heavy-hitter groups at
    100 TB pre-filter with ``hash_sample`` at ~(n/|group|) rate first
    and top up, keeping the window input bounded.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        sample_hash(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n_per_group)
        .drop("__rank")
    )


def temperature_mix_rates(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
    budget: int | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Temperature-balanced mixture rates (the multilingual-LM sampling
    rule: p_l ∝ count_l^alpha). alpha=1 keeps natural proportions,
    alpha=0 is uniform over strata; 0.3-0.7 is the usual band that stops
    head languages drowning the tail.

    Returns one row per stratum: (stratum, n_rows, mix_weight,
    sample_rate) where sample_rate = min(1, budget * mix_weight / n_rows)
    — the per-stratum Bernoulli rate that realizes the target mixture in
    expectation under ``budget`` total rows (default: corpus size).

    Shape: one grouped count + a 1-row total broadcast back — the rate
    table is |strata| rows, always broadcastable to the sampler join.
    Rates are rounded so the downstream integer cutoffs are identical
    across engines.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_rows"))
    powed = counts.withColumn(
        "__pw", F.pow(F.col("n_rows").cast("double"), F.lit(alpha))
    )
    tot = powed.agg(
        F.sum("__pw").alias("__pw_sum"), F.sum("n_rows").alias("__n_total")
    )
    budget_col = F.lit(budget) if budget is not None else F.col("__n_total")
    return (
        powed.crossJoin(F.broadcast(tot))
        .withColumn("mix_weight", F.round(F.col("__pw") / F.col("__pw_sum"), round_digits))
        .withColumn(
            "sample_rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    budget_col * F.col("mix_weight") / F.col("n_rows"),
                ),
                round_digits,
            ),
        )
        .select(stratum_col, "n_rows", "mix_weight", "sample_rate")
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    alpha: float = 0.5,
    budget: int | None = None,
    salt: str = "temp",
) -> DataFrame:
    """Apply ``temperature_mix_rates`` as a deterministic hash-Bernoulli
    sample: the head strata are thinned toward the alpha-tempered
    mixture, tail strata kept (rate caps at 1). Same no-rand() contract
    as every sampler here; the rate table rides as a broadcast dim, the
    filter itself is map-only on the fact side."""
    rates = temperature_mix_rates(df, stratum_col, alpha=alpha, budget=budget)
    cutoff = F.round(F.col("sample_rate") * SAMPLE_MOD).cast("long")
    return (
        df.join(
            F.broadcast(rates.select(stratum_col, cutoff.alias("__cutoff"))),
            on=stratum_col,
        )
        .filter(sample_hash(id_col, salt) < F.col("__cutoff"))
        .drop("__cutoff")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col,
    budget: int = 2048,
    n_groups: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Deterministic sequence-packing plan: assign every document to a
    training sequence of ~``budget`` tokens — the pretraining-efficiency
    move that turns ragged documents into dense fixed-length batches.

    Documents are dealt into ``n_groups`` hash groups (deterministic,
    uniform), ordered within each group by the hash variate (a stable
    pseudo-shuffle: no rand(), so retries/re-runs pack identically), and
    cut at running-token-count boundaries: a document starting before a
    budget multiple joins that sequence, so sequences target ``budget``
    tokens and overflow by at most one document (the standard greedy
    concat-then-split packing; callers that need hard caps split the
    overflowing tail document downstream).

    Shape: one shuffle on the group key; the running sum is a window
    per group (bounded: |corpus| / n_groups rows), never a global sort.
    At 100 TB size n_groups to executor count x a few — packing quality
    is unaffected by the group count, only sequence ids change.

    Output: input columns + (pack_group, seq_id, seq_pos).
    """
    from pyspark.sql.window import Window

    tokens = (
        token_count_col
        if isinstance(token_count_col, Column)
        else F.col(token_count_col)
    )
    h = sample_hash(id_col, salt)
    grouped = df.withColumn("pack_group", (h % n_groups).cast("int")).withColumn(
        "__tok", tokens.cast("long")
    )
    w = Window.partitionBy("pack_group").orderBy(
        sample_hash(id_col, f"{salt}|order"), F.col(id_col)
    )
    cum = F.sum("__tok").over(w)
    seq = F.floor((cum - F.col("__tok")) / F.lit(budget)).cast("long")
    with_seq = grouped.withColumn("seq_id", seq)
    # (pack_group, seq_id) clustering is a refinement of the pack_group
    # hash partitioning, so this second window adds a sort but NO new
    # exchange (Catalyst: HashPartitioning(pack_group) satisfies the
    # subset ClusteredDistribution) — one shuffle total for the operator
    pos = F.row_number().over(
        Window.partitionBy("pack_group", "seq_id").orderBy(
            sample_hash(id_col, f"{salt}|order"), F.col(id_col)
        )
    )
    return with_seq.withColumn("seq_pos", pos.cast("long")).drop("__tok")


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    quality_col: str,
    id_col: str,
) -> DataFrame:
    """Per-domain document quota, quality-ordered: keep the ``cap`` BEST
    documents per domain (highest ``quality_col``, ties to smallest id) —
    the web-curation move that stops any one site from dominating the
    corpus while keeping its best pages, vs ``sample_per_group`` which
    keeps a *random* fixed budget.

    Shape: one shuffle on the domain key; the rank is a window
    partitioned by domain, fully parallel across domains (web corpora
    have millions of them, so partitions stay small). A single
    heavy-hitter domain sorts its partition — same mitigation as
    ``sample_per_group``: pre-thin it with ``hash_sample`` at
    ~(c*cap/|domain|) and rank the survivors.

    Output: input columns + ``domain_rank`` (1 = best kept doc).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(domain_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return df.withColumn("domain_rank", F.row_number().over(w)).filter(
        F.col("domain_rank") <= cap
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    stratum_col: str | None = None,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, algorithm A-ES): each row gets key = ln(u)/w — the monotone
    log of u^(1/w), with u the deterministic hash variate — and the n
    largest keys are the sample. Inclusion probability is proportional
    to weight across the whole draw (not per-trial like a Bernoulli
    thinning), which is the "sample 10k docs per source, favoring high
    quality_score" curation move.

    Same no-rand() contract as every sampler here: the draw is a pure
    function of (id, salt, weights) — stable across runs, retries,
    partitionings, and engines. Rows with weight <= 0 are excluded
    (A-ES requires positive weights).

    Shape: with ``stratum_col``, one shuffle + a per-stratum rank
    window (parallel across strata; the usual hot-stratum pre-thin
    applies). Without it, the global top-n runs as a distributed
    TakeOrdered — no single-partition window.

    Output: input columns + ``sample_rank`` (1..n within the draw).
    """
    from pyspark.sql.window import Window

    u = (sample_hash(id_col, salt) + 1) / F.lit(float(SAMPLE_MOD + 1))
    key = F.log(u) / F.col(weight_col)
    pos = df.filter(F.col(weight_col) > 0).withColumn("__key", key)
    if stratum_col is not None:
        w = Window.partitionBy(stratum_col).orderBy(
            F.col("__key").desc(), F.col(id_col)
        )
        return (
            pos.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= n)
            .drop("__key")
        )
    from sarkac_spark.functions.ranking import rank_topk

    top = pos.orderBy(F.col("__key").desc(), F.col(id_col)).limit(n)
    return (
        rank_topk(top, "__key", id_col, rank_col="sample_rank")
        .drop("__key")
    )


def assign_shards(
    df: DataFrame, id_col: str, n_shards: int, salt: str = "shard",
    out_col: str = "shard_id",
) -> DataFrame:
    """Deterministic training-shard deal: shard = h60(salt|id) % 1e6
    % n_shards — the output-sharding move of a training-data pipeline
    (each shard becomes one dataloader file group). Same engine-portable
    md5 variate as every sampler here, so the assignment is a pure
    function of (id, salt): stable across runs, task retries, engines,
    and input partitionings — re-running the pipeline never migrates a
    document between shards. Map-only (no shuffle); the grouping that
    usually follows shuffles on ``out_col``, which is uniform by
    construction — no skew at any corpus size. Exactly uniform when
    ``n_shards`` divides 1e6 (powers of 2 up to 64, powers of 10);
    otherwise biased by at most 1 part in 1e6/n_shards.

    Long-typed to match BIGINT modulo arithmetic in SQL oracles.
    """
    return df.withColumn(
        out_col, sample_hash(id_col, salt) % F.lit(int(n_shards))
    )


def shard_manifest(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    weights: dict[str, Column] | None = None,
    salt: str = "shard",
    round_digits: int = 6,
) -> DataFrame:
    """Per-shard manifest + balance audit: deal rows into ``n_shards``
    deterministic hash shards (``assign_shards``) and aggregate one row
    per shard — doc count plus a summed column per ``weights`` entry
    (e.g. token counts, byte sizes). ``load_ratio`` compares each
    shard's first-weight load (doc count if no weights) to the ideal
    sum/n_shards — the number a dataloader balancer actually reads; a
    healthy manifest sits within a few percent of 1.0.

    Shape: one map-side-combined groupBy on the uniform shard key
    (n_shards result rows), then a 1-row total broadcast back — no
    second scan, no skew, identical cost at any corpus size.
    """
    weights = weights or {}
    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.sum(c).cast("long").alias(name) for name, c in weights.items()
    ]
    load = next(iter(weights), "n_docs")
    g = assign_shards(df, id_col, n_shards, salt=salt).groupBy("shard_id").agg(*aggs)
    tot = g.agg((F.sum(load) / F.lit(int(n_shards))).alias("__ideal"))
    return (
        g.crossJoin(F.broadcast(tot))
        .withColumn(
            "load_ratio", F.round(F.col(load) / F.col("__ideal"), round_digits)
        )
        .drop("__ideal")
    )


def mixture_plan(
    df: DataFrame,
    stratum_col: str,
    targets: dict[str, float],
    weight_col: Column | str | None = None,
    budget: int | None = None,
    load_name: str = "n_tokens",
    round_digits: int = 6,
) -> DataFrame:
    """Target-mixture planning (the Pile/DoReMi domain-reweighting
    move): given explicit target mixture ``targets`` (stratum ->
    weight), report per stratum its measured load (``weight_col`` sum,
    row count if None), natural share, target weight, and ``epochs`` —
    the sampling factor that realizes the target mixture in expectation
    under ``budget`` total load (default: corpus load). epochs < 1 is a
    ``hash_sample`` downsampling rate; epochs > 1 means the stratum
    must repeat (upsample) — the audit signal that a target is
    infeasible without duplication. Strata absent from ``targets`` get
    weight 0 (epochs 0 → dropped by the realizing sampler).

    Unlike ``temperature_mix_rates`` (weights *derived* from counts),
    the targets here are an explicit spec — the operator is the planning
    /audit half of a mixture change, meant to be reviewed before
    ``stratified_sample`` applies the rates.

    Shape: one map-side-combined grouped sum, |strata|-row broadcast
    joins for the target table and the 1-row total — scale-free.
    """
    if weight_col is None:
        w: Column = F.lit(1)
    elif isinstance(weight_col, str):
        w = F.col(weight_col)
    else:
        w = weight_col
    counts = df.groupBy(stratum_col).agg(F.sum(w).cast("long").alias(load_name))
    tgt = df.sparkSession.createDataFrame(
        [(str(k), float(v)) for k, v in targets.items()],
        schema=f"{stratum_col} string, target_weight double",
    )
    tot = counts.agg(F.sum(load_name).alias("__total"))
    budget_col = F.lit(budget) if budget is not None else F.col("__total")
    return (
        counts.join(F.broadcast(tgt), on=stratum_col, how="left")
        .na.fill({"target_weight": 0.0})
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "natural_share",
            F.round(F.col(load_name) / F.col("__total"), round_digits),
        )
        .withColumn(
            "epochs",
            F.round(
                budget_col * F.col("target_weight") / F.col(load_name),
                round_digits,
            ),
        )
        .select(stratum_col, load_name, "natural_share", "target_weight", "epochs")
    )


def cluster_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    eval_rate: float = 0.01,
    salt: str = "split",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Leakage-safe train/eval split: the Bernoulli draw happens on the
    near-duplicate CLUSTER, not the document, so two near-duplicates can
    never land on opposite sides of the split. ``train_eval_split``'s
    per-doc hash is correct only for an already-deduplicated corpus —
    on a raw corpus it puts ~eval_rate of every near-dup cluster into
    eval while the rest of the cluster trains, which is exactly the
    eval-set contamination (memorized paraphrase) decontamination
    exists to prevent.

    ``pairs`` is any near-dup pair relation (``dedup_minhash``,
    ``dedup_simhash``, ``ngram_jaccard_pairs``, embedding near-dup);
    transitive closure turns it into clusters (A~B, B~C => {A,B,C}
    split together) and the split key is the cluster representative
    (min reachable id) — singletons draw on their own id, so the
    operator degrades to ``train_eval_split`` on a clean corpus.

    Output: ``id_col``, ``split_key`` (the id the draw was made on),
    ``split`` ('train'/'eval').

    Scale shape: components run over the PAIR relation only (orders of
    magnitude smaller than the corpus after banding); the corpus sees
    one left equi-join against the (node, component) labels and a
    map-only hash — no corpus-side shuffle beyond that join, which AQE
    can broadcast whenever the duplicate population is small.
    """
    from sarkac_spark.operators.graph import connected_components

    cc = connected_components(pairs, src=src, dst=dst).select(
        F.col("node").alias(id_col), F.col("component").alias("__component")
    )
    key = F.coalesce(F.col("__component"), F.col(id_col))
    return (
        df.join(cc, id_col, "left")
        .select(
            id_col,
            key.alias("split_key"),
            F.when(
                sample_hash(key, salt) < F.lit(_cutoff(eval_rate)), F.lit("eval")
            )
            .otherwise(F.lit("train"))
            .alias("split"),
        )
    )


def apply_mixture(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    targets: dict[str, float],
    weight_col: Column | str | None = None,
    budget: int | None = None,
    salt: str = "mix_epochs",
) -> DataFrame:
    """Realize a ``mixture_plan``: each document appears
    floor(epochs) times plus one more with probability frac(epochs) —
    the Bernoulli draw is the deterministic hash variate over
    (salt, id, copy), so the expected per-stratum load hits the target
    mixture exactly while staying retry-safe and engine-stable (the
    repetition schedule is a pure function of the corpus and the spec,
    not of task scheduling).

    Output: ``df`` columns + ``epoch_copy`` (0-based copy ordinal, the
    column a dataloader shards on — repeats of a doc carry distinct
    ordinals so a downstream pseudo-shuffle spreads them apart).
    epochs < 1 degrades to plain hash downsampling; epochs = 0 (stratum
    absent from ``targets``) drops the stratum.

    Scale shape: ``mixture_plan``'s scale-free aggregations + ONE
    broadcast join of the |strata|-row epochs dim onto the corpus + a
    map-only explode of ceil(epochs) copies — no corpus-sized shuffle
    anywhere; output volume is exactly the planned training load.
    """
    plan = mixture_plan(
        df, stratum_col, targets, weight_col=weight_col, budget=budget
    )
    dim = plan.select(stratum_col, "epochs")
    joined = df.join(F.broadcast(dim), stratum_col)
    n_full = F.floor(F.col("epochs")).cast("int")
    frac_cutoff = (
        F.round((F.col("epochs") - F.floor(F.col("epochs"))) * SAMPLE_MOD)
        .cast("long")
    )
    exploded = joined.withColumn(
        "epoch_copy", F.explode(F.sequence(F.lit(0), n_full))
    ).withColumn("epoch_copy", F.col("epoch_copy").cast("long"))
    copy_key = F.concat_ws(
        "#", F.col(id_col).cast("string"), F.col("epoch_copy").cast("string")
    )
    keep = (F.col("epoch_copy") < n_full.cast("long")) | (
        sample_hash(copy_key, salt) < frac_cutoff
    )
    return exploded.filter(keep).select(*df.columns, "epoch_copy")

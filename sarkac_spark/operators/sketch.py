"""Bounded-memory sketches: frequency (count-min), distinct-count
(HyperLogLog), and quantiles (fixed-bin histogram).

The shared scale problem: exact answers over 100 TB need key-sized
shuffles and key-sized state (vocab counts, distinct URLs, sorted
quantiles), and those key spaces are unbounded on a web corpus. Each
sketch here holds a FIXED number of counters regardless of input size,
with a quantified error bound:

- ``count_min_sketch``: depth x width counters; one-sided — never
  undercounts, overcounts by <= 2N/width w.p. 1-(1/2)^depth (Cormode &
  Muthukrishnan 2005). Heavy-hitter / hot-key detection feeding skew
  mitigation.
- ``hll_distinct``: 2^b max-rank registers; ~1.04/sqrt(2^b) relative
  error (Flajolet et al. 2007). Cardinality (unique tokens/URLs/users).
- ``histogram_quantiles``: k bins per group; error <= one bin width,
  never undershoots. p50/p95/p99 without a sort.

Spark shape, common to all three: the only data-sized work is ONE
grouped aggregation whose key space is the sketch grid — map-side
partial aggregation collapses the corpus to sketch-sized rows per task
before the exchange. Hashing is md5-derived (the engine-portability
contract shared with operators/dedup) and float-order-sensitive sums
are carried as exact integers, so every estimate is bit-identical in
DuckDB and oracle-checkable — unlike the engine-private internals of
``approx_count_distinct`` (HLL++) and ``approx_percentile`` (t-digest).
CMS and HLL have streaming twins in ``streaming/pipeline.py`` emitting
the same mergeable state contracts per event-time window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HASH_HEX_LEN = 15  # 60-bit prefix fits a signed 64-bit long in both engines


def _row_hash(col: Column, d: int, width: int) -> Column:
    """Row d's bucket for a value: md5-derived 60-bit hash of the
    d-salted value, mod width. Independent rows come from the salt."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{d}:"), col)), 1, _HASH_HEX_LEN),
        16,
        10,
    ).cast("long")
    return (h % width).cast("long")


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) — at most ``depth x width``
    rows whatever the input size. Each input row lands in one bucket
    per sketch row; ``weight_col`` makes it a weighted sketch (e.g.
    bytes per key instead of occurrences).

    One scan, one sketch-sized shuffle (the explode factor is
    ``depth``, collapsed by map-side combine before the exchange).

    NULL values are dropped up front: md5(concat(...)) of a NULL is
    NULL, so null rows would otherwise pile weight into a (d, NULL)
    bucket no probe can ever read — silently inflating nothing and
    distorting totals. Same filter on the probe side (`cms_estimate`),
    so NULL never appears as an item there either.
    """
    df = df.filter(F.col(col).isNotNull())
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                _row_hash(F.col(col), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"), w.alias("__w"))
        .groupBy(F.col("rb.d").alias("d"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated count per item: min over the sketch rows of the item's
    bucket counter. ``depth`` and ``width`` must match the build call
    (they are the sketch's identity — a deployment stores them with it).

    Scale shape: items explode by ``depth`` (probe side, usually tiny),
    equi-join the sketch on (d, bucket) — the sketch side is at most
    depth x width rows, so AQE broadcasts it — then one min-aggregate
    per item. Missing buckets are true zero counts.

    Output: (<col>, est_count) with the one-sided guarantee
    est_count >= true count.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                _row_hash(F.col(col), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    probes = items.filter(F.col(col).isNotNull()).select(
        F.col(col), F.explode(rows).alias("rb")
    ).select(
        col, F.col("rb.d").alias("d"), F.col("rb.bucket").alias("bucket")
    )
    return (
        probes.join(sketch, ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count"))
    )


def _hll_alpha(m: int) -> float:
    """Bias-correction constant from the HyperLogLog paper (Flajolet
    et al. 2007) for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    b: int = 10,
) -> DataFrame:
    """HyperLogLog distinct-count estimate, md5-derived and therefore
    bit-identical in DuckDB (unlike ``approx_count_distinct``, whose
    HLL++ internals are engine-private — this one is oracle-checkable).

    The scale problem: exact distinct counts (URLs, tokens, users) need
    a key-sized shuffle; HLL needs ``m = 2^b`` registers — KBs, fixed
    whatever the corpus — at ~1.04/sqrt(m) relative error.

    Construction: the 60-bit md5 hash splits into a register index
    (low ``b`` bits) and a ``60-b``-bit suffix; the register keeps the
    max leading-zero rank of the suffix. The estimate is the classic
    alpha_m * m^2 / sum(2^-M_j), with the paper's linear-counting
    correction in the small regime. The register sum is carried as an
    EXACT integer (terms scaled by 2^(61-b)), so no float-summation
    order can flip the result between engines or partitionings.

    Spark shape: one scan; the only shuffle is register-sized
    (groupBy on (groups, idx), ``m`` rows per group max, map-side
    combined), then a per-group metadata agg. Rank extraction is pure
    JVM expressions (conv-to-binary bit length — no Python).

    Output: group_cols + est_distinct (long).
    """
    groups = list(group_cols or [])
    regs = hll_registers(df, col, groups, b=b)
    return hll_estimate(regs, groups, b=b)


def hll_rho(col: str | Column, b: int = 10) -> tuple[Column, Column]:
    """(register index, rank) pair for a value: the 60-bit md5 hash
    splits into the low ``b`` index bits and a ``60-b``-bit suffix;
    rank = leading zeros of the suffix + 1, via base-2 string bit
    length (exact in both engines; conv/bin render "0" for 0)."""
    c = F.col(col) if isinstance(col, str) else col
    m = 1 << b
    rho_max = 60 - b + 1
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), c)), 1, _HASH_HEX_LEN),
        16,
        10,
    ).cast("long")
    idx = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftright(h, b)
    rho = F.when(w == 0, F.lit(rho_max)).otherwise(
        F.lit(rho_max) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return idx, rho


def hll_registers(
    df: DataFrame, col: str, group_cols: list[str], b: int = 10
) -> DataFrame:
    """The mergeable sketch state: (groups..., idx, M) with
    M = max rank per register — at most ``2^b`` rows per group. Merging
    two register sets is ``max`` per idx, which is why the streaming
    twin can emit these incrementally. NULL values are dropped up
    front (a NULL hashes to a NULL register index whose NULL rank
    would skew the estimate's register count) — SQL COUNT(DISTINCT)
    ignores NULLs too, so this matches the exact semantics."""
    idx, rho = hll_rho(col, b)
    return (
        df.filter(F.col(col).isNotNull())
        .select(*group_cols, idx.alias("idx"), rho.alias("__rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("__rho").alias("M"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str], b: int = 10
) -> DataFrame:
    """Registers -> cardinality estimate. The register sum is carried
    as an EXACT integer (terms scaled by 2^(61-b)), so no float
    summation order can flip the rounded result between engines or
    partitionings; the division happens once on a single precomputed
    double numerator."""
    m = 1 << b
    rho_max = 60 - b + 1
    scale = 1 << rho_max
    # term = 2^(rho_max - M) >= 1 since M <= rho_max; untouched
    # registers would contribute 2^rho_max
    term = F.pow(F.lit(2.0), F.lit(rho_max) - F.col("M")).cast("long")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(term).alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    numer = _hll_alpha(m) * (m * m) * scale
    s_total = F.col("__s") + (F.lit(m) - F.col("__n")) * F.lit(scale)
    est_raw = F.lit(numer) / s_total
    zeros = (F.lit(m) - F.col("__n")).cast("long")
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(est_raw)
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("est_distinct")
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    k: int = 256,
) -> DataFrame:
    """Fixed-bin histogram quantile estimate — the bounded-memory member
    of the quantile family (``trailing_percentiles`` is exact but
    buffers each group's values on the reducer; this holds ``k``
    counters per group whatever the data volume, with error <= one bin
    width = (max-min)/k).

    Two agg-only passes, no sort: (1) per-group min/max/count (metadata-
    sized), broadcast back; (2) per-(group, bin) counts — the only
    data-sized shuffle, map-side combined to <= k rows per group — then
    a cumulative window over <= k rows and, per q, the smallest bin
    whose cumulative count reaches q*n. The estimate is that bin's
    UPPER edge (never undershoots the true quantile by more than a bin).
    All arithmetic is the same double expression in DuckDB, so results
    are oracle-checkable (vs ``approx_percentile``'s engine-private
    t-digest).

    Output: group_cols + n + one ``p<q>_est`` column per q.
    """
    from pyspark.sql.window import Window

    groups = list(group_cols or [])
    v = F.col(col).cast("double")
    # NULLs out up front: count(v) already ignores them, but a NULL bin
    # row would sort first under the cumulative window and shift every
    # quantile edge
    df = df.filter(F.col(col).isNotNull())
    bounds = df.groupBy(*groups).agg(
        F.min(v).alias("__mn"),
        F.max(v).alias("__mx"),
        F.count(v).alias("__n"),
    )
    joined = (
        df.join(F.broadcast(bounds), on=groups) if groups
        else df.crossJoin(F.broadcast(bounds))
    )
    span = F.col("__mx") - F.col("__mn")
    bin_ = F.when(span == 0, F.lit(0)).otherwise(
        F.least(
            F.floor((v - F.col("__mn")) * k / span), F.lit(k - 1)
        )
    ).cast("long")
    hist = (
        joined.select(*groups, bin_.alias("__bin"), "__mn", "__mx", "__n")
        .groupBy(*groups, "__bin", "__mn", "__mx", "__n")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = (
        Window.partitionBy(*groups).orderBy("__bin")
        if groups
        else Window.partitionBy(F.lit(1)).orderBy("__bin")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.withColumn("__cum", F.sum("__c").over(w))
    aggs = [F.first("__mn").alias("__mn"), F.first("__mx").alias("__mx")]
    for q in qs:
        qb = F.min(
            F.when(F.col("__cum") >= F.lit(q) * F.col("__n"), F.col("__bin"))
        )
        aggs.append(qb.alias(f"__qb_{_q_tag(q)}"))
    est = cum.groupBy(*groups, "__n").agg(*aggs)
    out_cols = [*groups, F.col("__n").alias("n")]
    for q in qs:
        edge = F.col("__mn") + (F.col(f"__qb_{_q_tag(q)}") + 1) * (
            F.col("__mx") - F.col("__mn")
        ) / F.lit(float(k))
        out_cols.append(
            F.round(F.least(edge, F.col("__mx")), 6).alias(f"p{_q_tag(q)}_est")
        )
    return est.select(*out_cols)


def _q_tag(q: float) -> str:
    """0.5 -> "50", 0.95 -> "95", 0.99 -> "99" — percent-scale column
    tags (p50_est), so q=0.5 never reads as a 5th percentile."""
    return str(int(round(q * 100)))


def fixed_histogram_estimate(
    hist: DataFrame,
    group_cols: list[str],
    lo: float,
    hi: float,
    k: int = 256,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """(groups..., bin, c) histogram rows -> quantile estimates, for
    histograms built over FIXED [lo, hi) bounds (the streaming twin's
    contract, where a per-group min/max pre-pass is impossible).
    Same upper-edge estimator as ``histogram_quantiles``; values
    clamped into the edge bins keep the never-undershoot guarantee
    only while lo/hi actually bound the data — pick them from the
    metric's physical range (latency floors/timeouts, 0..1 ratios).

    Output: group_cols + n + one ``p<q>_est`` column per q.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*group_cols).orderBy("bin")
        if group_cols
        else Window.partitionBy(F.lit(1)).orderBy("bin")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n = (
        Window.partitionBy(*group_cols)
        if group_cols
        else Window.partitionBy(F.lit(1))
    )
    cum = hist.withColumn("__cum", F.sum("c").over(w)).withColumn(
        "__n", F.sum("c").over(n)
    )
    aggs = [F.first("__n").alias("__n")]
    for q in qs:
        qb = F.min(
            F.when(F.col("__cum") >= F.lit(q) * F.col("__n"), F.col("bin"))
        )
        aggs.append(qb.alias(f"__qb_{_q_tag(q)}"))
    est = cum.groupBy(*group_cols).agg(*aggs)
    width = (hi - lo) / float(k)
    out_cols = [*group_cols, F.col("__n").alias("n")]
    for q in qs:
        edge = F.lit(lo) + (F.col(f"__qb_{_q_tag(q)}") + 1) * F.lit(width)
        out_cols.append(
            F.round(F.least(edge, F.lit(float(hi))), 6).alias(f"p{_q_tag(q)}_est")
        )
    return est.select(*out_cols)


# --- Bloom filter -------------------------------------------------------------


def _bloom_pos(col: Column, i: int, m_bits: int) -> Column:
    """Bit position i for a value: md5-derived 60-bit hash of the
    i-salted value, mod m_bits — same engine-portable hashing contract
    as the CMS/HLL sketches."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"bloom{i}:"), col)), 1, _HASH_HEX_LEN),
        16,
        10,
    ).cast("long")
    return (h % m_bits).cast("long")


def bloom_build(
    df: DataFrame, col: str, m_bits: int = 16384, k_hashes: int = 4
) -> DataFrame:
    """Bloom filter over a column, as the sparse relation of SET bit
    positions: (pos) distinct — at most ``m_bits`` rows whatever the
    input size. The operational 100 TB role is the INGEST PRE-GATE for
    incremental dedup: probe a new batch's digests against the bloom of
    everything kept so far; "definitely unseen" rows (any unset
    position) skip the exact anti-join entirely, "maybe seen" rows
    (expected fraction ~(1-e^(-kn/m))^k) go on to it — membership has NO
    FALSE NEGATIVES, so the gate can never drop a genuinely new row or
    admit a duplicate past the exact check.

    Shape: one scan, one sketch-sized distinct (explode factor
    ``k_hashes``, map-side combined). Merging two blooms is relation
    UNION — same mergeable-state contract as the other sketches. NULLs
    dropped up front (same rationale as count_min_sketch).
    """
    df = df.filter(F.col(col).isNotNull())
    poss = F.array(*[_bloom_pos(F.col(col), i, m_bits) for i in range(k_hashes)])
    return df.select(F.explode(poss).alias("pos")).distinct()


def bloom_might_contain(
    bloom: DataFrame,
    items: DataFrame,
    col: str,
    m_bits: int = 16384,
    k_hashes: int = 4,
) -> DataFrame:
    """Membership probe per DISTINCT item value: might_contain is true
    iff ALL the value's (distinct) bit positions are set. ``m_bits`` /
    ``k_hashes`` must match the build call (the sketch's identity).

    Shape: probes explode by <= k_hashes; the bloom side is at most
    ``m_bits`` rows so it broadcasts; one aggregate per value. The
    position array is materialized in its own projection before
    ``size``/``explode`` read it (no CSE across the HOF boundary).

    Output: (<col>, might_contain boolean) — no false negatives.
    """
    poss = F.array(*[_bloom_pos(F.col(col), i, m_bits) for i in range(k_hashes)])
    staged = (
        items.filter(F.col(col).isNotNull())
        .select(col)
        .distinct()
        .select(F.col(col), F.array_distinct(poss).alias("__pp"))
    )
    probes = staged.select(
        F.col(col), F.size(F.col("__pp")).alias("__need"), F.explode("__pp").alias("pos")
    )
    marked = bloom.withColumn("__set", F.lit(1))
    return (
        probes.join(F.broadcast(marked), "pos", "left")
        .groupBy(col)
        .agg(
            F.sum(F.coalesce(F.col("__set"), F.lit(0))).alias("__got"),
            F.first("__need").alias("__need"),
        )
        .select(F.col(col), (F.col("__got") == F.col("__need")).alias("might_contain"))
    )


def bloom_gated_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 262144,
    k_hashes: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Inner/semi join where the FACT side is pre-gated by a Bloom
    filter of the dim's keyset BEFORE any join machinery touches it —
    the runtime-filter pattern (a hand-rolled twin of Spark's internal
    ``InjectRuntimeFilter``, whose ``might_contain`` expression is not
    exposed to the public API).

    Why this matters at 100 TB: when the dim relation (with payload
    columns) is too big to broadcast, a plain join SHUFFLES THE WHOLE
    FACT. Its keyset bloom is ``m_bits/8`` bytes regardless of dim
    width or row count, so it still broadcasts — and every fact row
    failing the gate ("definitely not in dim") is dropped map-side,
    before the exchange. No false negatives, so the result EQUALS the
    plain join exactly (the oracle); false positives (expected
    ~(1-e^(-kn/m))^k) just ride through to the real join.

    Shape: bloom positions -> m/64 bitset words (``pos div 64``,
    bit_or) -> ONE map row broadcast via the 1-row crossJoin class;
    the per-row gate is k ``element_at`` + shift/AND expressions, all
    inside whole-stage codegen. NULL fact keys fail the gate — exactly
    the rows an equi-join drops anyway.

    Guard rails (both protect the equals-the-plain-join contract):
    only ``inner``/``semi`` are accepted — an outer join must emit the
    very rows the gate exists to drop; and the key DATA TYPES must
    match exactly, because the bloom hashes each side's own string
    rendering (DOUBLE ``5.0`` vs BIGINT ``5`` would hash apart and
    false-negative every match).
    """
    if how not in ("inner", "semi"):
        raise ValueError(
            f"bloom_gated_join supports how='inner'/'semi', got {how!r}: "
            "an outer join must emit the fact rows the gate drops"
        )
    ft = fact.schema[fact_key].dataType
    dt = dim.schema[dim_key].dataType
    if ft != dt:
        raise ValueError(
            f"bloom_gated_join key types must match exactly (fact "
            f"{fact_key}: {ft.simpleString()}, dim {dim_key}: "
            f"{dt.simpleString()}): the bloom hashes each side's own "
            "string rendering, so 5.0 and 5 would never match — cast "
            "one side first"
        )
    gated = _bloom_gate(fact, dim, fact_key, dim_key, m_bits, k_hashes)
    if how == "semi":
        return gated.join(
            dim.select(F.col(dim_key).alias(fact_key)), fact_key, "left_semi"
        )
    return gated.join(dim, gated[fact_key] == dim[dim_key], "inner")


def _bloom_gate(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int,
    k_hashes: int,
) -> DataFrame:
    """The map-side gate alone: fact rows whose key MIGHT be in dim's
    keyset (matches + bloom false positives). Exposed separately so the
    thinning property — rows dropped before any exchange — is directly
    measurable (and tested) without the downstream exact join masking
    a broken gate.

    Hash choice: the sketch family's md5 positions exist for DuckDB
    oracle parity, but THIS operator's oracle is the plain join (the
    bloom is invisible to results) — so the gate uses JVM-native
    seeded xxhash64, ~an order of magnitude cheaper per probe on the
    fact hot path. Both sides must use the same positions, hence the
    local build instead of bloom_build."""

    def _fast_pos(c, i):
        return F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m_bits)).cast("long")

    bloom = (
        dim.select(dim_key)
        .filter(F.col(dim_key).isNotNull())
        .select(
            F.explode(
                F.array(*[_fast_pos(F.col(dim_key), i) for i in range(k_hashes)])
            ).alias("pos")
        )
        .distinct()
    )
    words = bloom.groupBy(
        F.expr("pos div 64").alias("__w")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
        ).alias("__bits")
    )
    bitset = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("__w", "__bits"))
        ).alias("__bloom")
    )
    # positions materialized as columns first (shift amounts must be
    # column exprs -> SQL shiftleft/shiftright, and no CSE across
    # repeated inline position trees)
    staged = fact.crossJoin(F.broadcast(bitset))
    pos_cols = [f"__p{i}" for i in range(k_hashes)]
    for i, pc in enumerate(pos_cols):
        staged = staged.withColumn(pc, _fast_pos(F.col(fact_key), i))
    # NULL keys must fail the gate explicitly: xxhash64 SKIPS null
    # inputs, so every NULL-keyed row would otherwise hash to the k
    # fixed positions of the seed literal alone and pass whenever those
    # bits happen to be set in a dense bloom. Equi-join semantics drop
    # NULL keys, so the gate does too.
    gate = F.col(fact_key).isNotNull()
    for pc in pos_cols:
        # absent word -> NULL -> comparison NULL -> row dropped, which
        # is exactly "definitely not in dim"
        gate = gate & (
            F.expr(
                f"shiftright(element_at(__bloom, {pc} div 64),"
                f" CAST({pc} % 64 AS INT)) & 1"
            )
            == 1
        )
    return staged.filter(gate).drop("__bloom", *pos_cols)


# --- HLL set algebra ----------------------------------------------------------


def hll_merge(regs_list: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Union of HLL sketches: max per register across the inputs — the
    merge algebra that makes registers the right stored/streamed state
    (register(union) == max(register_a, register_b), exactly)."""
    out = regs_list[0]
    for r in regs_list[1:]:
        out = out.unionByName(r)
    return out.groupBy(*group_cols, "idx").agg(F.max("M").alias("M"))


def hll_overlap(
    df_a: DataFrame, df_b: DataFrame, col: str, b: int = 12
) -> DataFrame:
    """Set-overlap estimate by inclusion-exclusion over HLL:
    |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B), where est(A ∪ B) comes from
    max-merging the two register relations — no re-scan of the union.
    The 100 TB use: estimate train/eval or corpus/corpus contamination
    BEFORE paying for the exact inverted-index decontamination pass —
    three register-sized sketches instead of a key-sized distinct join.
    Error compounds (three ±1.04/sqrt(m) estimates), so size ``b`` for
    the expected overlap magnitude; a deployment persists the per-corpus
    register relations (KBs) rather than recomputing them as this
    single-query form does.

    Output: one row (est_a, est_b, est_union, est_overlap), all longs.
    """
    ra = hll_registers(df_a, col, [], b=b)
    rb = hll_registers(df_b, col, [], b=b)
    ru = hll_merge([ra, rb], [])
    ea = hll_estimate(ra, [], b=b).select(F.col("est_distinct").alias("est_a"))
    eb = hll_estimate(rb, [], b=b).select(F.col("est_distinct").alias("est_b"))
    eu = hll_estimate(ru, [], b=b).select(F.col("est_distinct").alias("est_union"))
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .withColumn(
            "est_overlap",
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
                F.lit(0).cast("long"),
            ),
        )
    )

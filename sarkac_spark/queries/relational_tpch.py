"""TPC-H-shape relational queries over the star schema — the
canonical join/agg/top-k plan shapes (all 22: Q1-Q22
analogues plus the bloom-gated runtime-filter join), split out of
``relational.py`` (round-9 size pass; the ``llm.py`` split precedent).
``relational.py`` star-imports this module and owns the merged
driver-facing QUERIES/ORACLE dicts, so registry keys are unchanged.

Float policy: monetary sums rounded to 2 or carried as exact integer
cents (the tie-free contract); averages to 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sarkac_spark.functions.ranking import rank_topk
from sarkac_spark.sources.tables import load_table


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation; Catalyst gives
    map-side partial aggregation, so the shuffle carries |groups| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by order revenue. orderBy().limit() compiles to
    TakeOrderedAndProject — per-partition top-k merged on the driver —
    instead of a global unpartitioned rank window (which would move the
    whole per-customer relation to ONE partition; Spark even warns).
    Rank is assigned afterwards on the 5 surviving rows."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    top5 = per_cust.orderBy(F.col("total_spent").desc(), F.col("o_custkey")).limit(5)
    ranked = rank_topk(top5, "total_spent", "o_custkey")
    return ranked.join(
        F.broadcast(customer.select("c_custkey", "c_name", "c_mktsegment")),
        ranked.o_custkey == F.col("c_custkey"),
    ).select("rank", "c_custkey", "c_name", "c_mktsegment", "total_spent", "n_orders")

def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dimension chain: orders ⋈ customer ⋈ nation ⋈
    region, revenue per region — dims broadcast, one fact shuffle for the
    final group-by only."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    return (
        orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )

def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact ⋈ broadcast(part) + conditional aggregation
    → one row. The part side is a pure broadcast (no fact shuffle at
    all: map-side join, partial agg, single-row final)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_type")),
                li.l_partkey == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc_price), 4).alias("promo_pct"),
            F.round(F.sum(disc_price), 2).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )

def q_supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per supplier nation: lineitem ⋈ broadcast(supplier ⋈
    nation). The dimension chain collapses driver-side into one small
    broadcast; the only shuffle is the |nations|-row group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    dims = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy(F.col("n_name").alias("supplier_nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )

def q_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join coverage (EXISTS): customers with at least one
    big-ticket order — LEFT SEMI emits each probe row at most once and
    moves no payload columns from the build side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > BIG_ORDER_CUTOFF).select("o_custkey")
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


BIG_ORDER_CUTOFF = 300_000  # ~top order-price decile in the synthetic data

def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join coverage (TPC-H Q22 flavor): customers with no
    big-ticket order. LEFT ANTI shuffles both sides on the key and
    emits only the probe side — no fact columns move; the price filter
    is pushed below the join (build side shrinks before the shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > BIG_ORDER_CUTOFF).select("o_custkey")
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )

def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS over the fact table — orders with at
    least one returned lineitem, counted by priority. The semi-join
    dedups build-side matches before the count and the returnflag
    filter is pushed to the lineitem scan, so the join moves only the
    surviving 8-byte keys."""
    o = load_table(spark, sf_dir, "orders")
    ret = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(ret, o.o_orderkey == ret.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )

def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer-join count distribution — how many
    customers placed exactly N orders, INCLUDING the zero bucket (the
    left outer join keeps orderless customers; count(o_orderkey) skips
    their null). Two aggregations: per-customer count (shuffle on
    custkey), then the tiny distribution rollup."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )

def q_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-aggregate after a key join — supplier
    variety per (brand, type), computed from lineitem since the
    fixture ships no partsupp. count(DISTINCT) expands to a two-phase
    aggregate (partial distinct per partition, then merge) — no
    driver-side set."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(p.select("p_partkey", "p_brand", "p_type"),
               l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )

def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-aggregate subquery (lineitems
    below a fraction of THEIR part's average quantity), decorrelated the
    scale-correct way — one grouped per-part average joined back (the
    rewrite every optimizer wants: the naive correlated form re-scans
    lineitem per part). Brand dim filter broadcasts; the per-part avg
    relation is |parts|-sized, also broadcastable at any SF where parts
    fit (Catalyst/AQE picks it up)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    )
    per_part_avg = li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("__aq")
    )
    small = (
        li.join(F.broadcast(part.select("p_partkey")),
                li["l_partkey"] == F.col("p_partkey"))
        .join(per_part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("__aq"))
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small_lineitems"),
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
    )

def q_top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate-of-aggregate equality — the supplier(s)
    whose windowed revenue EQUALS the maximum revenue (ties all
    returned, unlike rank-based top-k). The max is a 1-row relation
    broadcast against the |suppliers|-sized revenue agg: no global sort,
    no second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(sup.select("s_suppkey", "s_name")),
              rev["l_suppkey"] == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "total_revenue",
        )
    )

def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery — for every part (of one
    type) the supplier(s) offering the minimum cost, restricted to one
    region via the supplier→nation→region dim chain. (This schema has
    no partsupp table, so lineitem prices stand in for supply cost; the
    plan shape is Q2's.) Decorrelated the scale-correct way: ONE
    grouped per-(part, supplier) cost relation, ONE per-part min joined
    back on (partkey, cost) equality — never a per-part re-scan. The
    dim chain (supplier⋈nation⋈region) broadcasts; the min-cost
    relation is |parts|-sized and joins the costs agg with AQE free to
    broadcast it. Ties (several suppliers at the min) all return, as in
    Q2. Costs are integer cents end-to-end — no float-rounding hash
    risk."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), F.col("n_regionkey") == reg["r_regionkey"])
        .select("s_suppkey", "s_name", "n_name")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    costs = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .join(F.broadcast(eur), li["l_suppkey"] == F.col("s_suppkey"))
        .select(
            "l_partkey", "l_suppkey", "s_name", "n_name",
            cents.alias("__cents"),
        )
        .groupBy("l_partkey", "l_suppkey", "s_name", "n_name")
        .agg(F.min("__cents").alias("cost_cents"))
    )
    mn = costs.groupBy("l_partkey").agg(F.min("cost_cents").alias("__mn"))
    return (
        costs.join(mn, "l_partkey")
        .filter(F.col("cost_cents") == F.col("__mn"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "n_name",
            "cost_cents",
        )
    )

def q_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — suppliers who, inside
    one ship-date year, shipped MORE than half of a part's total
    shipped quantity (the availqty-vs-half-of-shipped predicate of Q20,
    re-expressed without partsupp: a supplier dominating a part's flow
    is the 'excess stock holder'). Decorrelated: ONE per-(part,
    supplier) quantity agg, ONE per-part total derived FROM it (agg of
    the agg — never a second lineitem scan), the dominance filter, then
    a per-supplier rollup joined to the broadcast supplier⋈nation dim.
    Quantities are integer centi-units; the dominance test is
    2*q > total in pure longs."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    qcents = F.round(F.col("l_quantity") * 100).cast("long")
    ps = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .select("l_partkey", "l_suppkey", qcents.alias("__q"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("__q").alias("q_cents"))
    )
    tot = ps.groupBy("l_partkey").agg(F.sum("q_cents").alias("__t"))
    dom = ps.join(tot, "l_partkey").filter(
        F.col("q_cents") * 2 > F.col("__t")
    )
    sdim = sup.join(
        F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey", "s_name", "n_name")
    return (
        dom.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_dominated_parts"),
            F.sum("q_cents").alias("dom_qty_cents"),
        )
        .join(F.broadcast(sdim), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "n_name",
            "n_dominated_parts",
            "dom_qty_cents",
        )
    )

def q_blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS correlated pair — suppliers
    who were the ONLY supplier with a returned lineitem in a
    multi-supplier order (Q21's 'kept the order waiting' predicate,
    re-keyed on l_returnflag since this schema has no receipt/commit
    dates). Decorrelated the scale-correct way: ONE grouped pass per
    (order, supplier) with a returned-flag max, ONE per-order rollup
    (suppliers, suppliers-with-returns) derived FROM it — the
    EXISTS/NOT-EXISTS pair becomes two columns of the same aggregate,
    never a re-scan per subquery. Supplier dim broadcasts at the end.
    Output: per-supplier count of blocked orders."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("__ret")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_sup"),
        F.sum("__ret").alias("__n_ret_sup"),
    )
    blocked = (
        per_os.filter(F.col("__ret") == 1)
        .join(per_o, "l_orderkey")
        .filter((F.col("__n_sup") >= 2) & (F.col("__n_ret_sup") == 1))
    )
    return (
        blocked.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "numwait",
        )
    )

def q_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-average subquery + NOT EXISTS —
    customers with an account balance above the average POSITIVE
    balance who placed no RECENT orders (none since 2000-06-01 — the
    lapsed-but-funded segment Q22 targets), rolled up per nation.
    Decorrelated: the global average is a 1-row broadcast; the NOT
    EXISTS is one left-anti join against the distinct recent-order
    custkeys (the filter pushes into the orders scan). Balances are
    integer cents end-to-end."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp_ntz")
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    c = cust.select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("nationkey"),
        cents.alias("bal_cents"),
    )
    # avg positive balance as exact integer micro-cents: sum*1e4 div n
    # (integral div on longs — no float mean, the quality_score lesson)
    avg_pos = (
        c.filter(F.col("bal_cents") > 0)
        .agg(
            F.expr("(sum(bal_cents) * 10000L) div count(1)").alias("__avg_tc")
        )
    )
    idle = c.join(
        orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_anti",
    )
    return (
        idle.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("bal_cents") * 10000 > F.col("__avg_tc"))
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").alias("totacctbal_cents"),
        )
    )

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter + fact-fact join + global
    top-10. The segment filter broadcasts customer keys into orders;
    unshipped-revenue rolls up per order; the top-10 is orderBy+limit,
    which Spark executes as TakeOrderedAndProject — every partition
    keeps a 10-row heap and only the heads travel to the driver, never
    a global sort. Ties are impossible at the boundary because the
    sort key ends with the unique orderkey. Revenue is integer cents."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                orders["o_custkey"] == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(cents).alias("revenue_cents"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue_cents",
        )
        .orderBy(F.desc("revenue_cents"), "l_orderkey")
        .limit(10)
    )

def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share inside a region, per
    order year — the CASE-sum ratio over a snowflake join (lineitem ⋈
    orders ⋈ customer→nation→region on the demand side, supplier→nation
    on the supply side; part filters the fact). Every dim chain
    broadcasts; the fact is scanned once and the share is two
    conditional sums of the SAME grouped aggregate, emitted as exact
    parts-per-million via integral div (no float ratio)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    eur_cust = (
        cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), F.col("n_regionkey") == reg["r_regionkey"])
        .select("c_custkey")
    )
    sup_nat = sup.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        sup["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    eur_orders = orders.join(
        F.broadcast(eur_cust), orders["o_custkey"] == F.col("c_custkey")
    ).select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    vol = (
        li.join(F.broadcast(part.select("p_partkey")),
                li["l_partkey"] == F.col("p_partkey"))
        .join(eur_orders, li["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(sup_nat), li["l_suppkey"] == F.col("s_suppkey"))
        .select("o_year", "supp_nation", cents.alias("__c"))
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("__c")
                       ).otherwise(F.lit(0))
            ).alias("__nat"),
            F.sum("__c").alias("total_cents"),
        )
    )
    # widen through DECIMAL(38,0) before the ppm multiply: a long
    # multiply overflows (ANSI: ARITHMETIC_OVERFLOW) once one
    # year/nation slice exceeds ~9.2e12 cents — inside the 100 TB
    # target. DuckDB's side is HUGEINT by construction, so both
    # engines floor-divide exactly.
    return vol.select(
        "o_year",
        F.expr(
            "CAST((CAST(__nat AS DECIMAL(38,0)) * 1000000)"
            " DIV total_cents AS BIGINT)"
        ).alias("mkt_share_ppm"),
        "total_cents",
    )

def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a GLOBAL scalar — parts whose
    revenue exceeds 1.5x the mean per-part revenue (a fraction-of-total
    threshold keyed to the part count, so the gate stays non-vacuous at
    every SF — TPC-H itself scales Q11's fraction by 1/SF for the same
    reason). The scalar is an aggregate OF the per-part aggregate
    (never a second fact scan), broadcast as a 1-row relation; the
    comparison is exact long arithmetic (rev * n * 2 > total * 3)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    per_part = li.select("l_partkey", cents.alias("__c")).groupBy(
        "l_partkey"
    ).agg(F.sum("__c").alias("revenue_cents"))
    total = per_part.agg(
        F.sum("revenue_cents").alias("__t"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("revenue_cents") * F.col("__n") * 2 > F.col("__t") * 3
        )
        .select(F.col("l_partkey").alias("p_partkey"), "revenue_cents")
    )

def q_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact equi-join + CASE-split counts — for
    each returnflag (this schema's stand-in for shipmode), how many
    LATE lineitems (shipped ≥ 90 days after the order date) belong to
    high- vs low-priority orders. The join is the canonical
    co-partitioned orderkey join: at 100 TB both sides bucket on
    orderkey and the shuffle disappears; here AQE picks the strategy.
    The priority split is two conditional sums of one aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).filter(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    # coalesce: a NULL priority must count as LOW exactly like the
    # oracle's CASE ... ELSE 1 (bare isin would skip it in BOTH sums)
    hi = F.coalesce(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(False)
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.sum(hi.cast("long")).alias("high_line_count"),
            F.sum((~hi).cast("long")).alias("low_line_count"),
        )
    )

def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions spanning both join sides —
    revenue from three (brand, size-range, quantity-range) channels.
    The scale trap: the raw disjunction references both tables, so a
    naive plan joins EVERYTHING and filters after. The per-side
    supersets (brand ∈ {...} ∧ size ≤ 15 on part; quantity ≤ 30 on
    lineitem) are therefore stated explicitly so they reach the parquet
    scans as PushedFilters — the rewrite Catalyst's CNF pushdown aims
    for, made deterministic. One row out: line count + revenue cents."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#6", "Brand#9")
        & (F.col("p_size") >= 1) & (F.col("p_size") <= 15)
    )
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    channel = (
        ((brand == "Brand#1") & (size <= 5) & (qty >= 1) & (qty <= 11))
        | ((brand == "Brand#6") & (size <= 10) & (qty >= 10) & (qty <= 20))
        | ((brand == "Brand#9") & (size <= 15) & (qty >= 20) & (qty <= 30))
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .filter(channel)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(cents).alias("revenue_cents"),
        )
    )

def q_bloom_gated_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join: revenue per brand for one part type, with
    the fact side pre-gated by a Bloom of the dim's keyset BEFORE the
    join (``operators/sketch.py::bloom_gated_join``) — the pattern that
    keeps a 100 TB fact from shuffling rows that cannot match when the
    dim is too wide to broadcast. No false negatives, so the result —
    and the DuckDB oracle — is exactly the plain join."""
    from sarkac_spark.operators.sketch import bloom_gated_join

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "LARGE"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    j = bloom_gated_join(
        li.select("l_partkey", cents.alias("__c")),
        part.select("p_partkey", "p_brand"),
        "l_partkey",
        "p_partkey",
    )
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("__c").alias("revenue_cents"),
    )


def q_two_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between TWO nations in either
    direction, per ship year — the OR'd nation-pair predicate spans both
    join sides, so (the Q19 lesson applied to dims) each side carries
    its superset filter ``nation IN (A, B)`` explicitly: both dim chains
    shrink to two nations BEFORE broadcasting, and the cross-side
    disjunction (A->B or B->A) evaluates after the join on rows that
    already passed both supersets. Fact scanned once; both dims
    broadcast; revenue is exact integer cents."""
    pair = ("NATION_1", "NATION_3")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*pair)
    )
    sup_nat = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust_nat = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("__cnk"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("__cnk"),
        )
        .select("c_custkey", "cust_nation")
    )
    ord_nat = (
        load_table(spark, sf_dir, "orders")
        .join(F.broadcast(cust_nat), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(F.broadcast(sup_nat), li["l_suppkey"] == F.col("s_suppkey"))
        .join(ord_nat, li["l_orderkey"] == F.col("o_orderkey"))
        .filter(
            (
                (F.col("supp_nation") == pair[0])
                & (F.col("cust_nation") == pair[1])
            )
            | (
                (F.col("supp_nation") == pair[1])
                & (F.col("cust_nation") == pair[0])
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(cents).alias("revenue_cents"))
    )


def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit decomposition over the classic multi-dim
    star — revenue minus supply cost per supplier nation per year, for
    parts matching a name pattern. (No partsupp table in this schema:
    supply cost is re-keyed as 80% of ``p_retailprice * l_quantity`` —
    the p_retailprice column exists for exactly this.) The fact is
    scanned once; part (name-filtered), supplier, and nation all
    broadcast; profit is exact integer cents so the hash gate holds at
    any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    sup_nat = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    # exact cents: revenue rounds once; cost rounds once (the 80% factor
    # folds into the multiply BEFORE rounding — one round per term, same
    # as the oracle)
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    cost_cents = F.round(
        F.col("l_quantity") * F.col("p_retailprice") * 80
    ).cast("long")
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .join(F.broadcast(sup_nat), li["l_suppkey"] == F.col("s_suppkey"))
        .select(
            "nation",
            F.year("l_shipdate").alias("o_year"),
            (rev_cents - cost_cents).alias("__p"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("__p").alias("profit_cents"))
    )


def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue LOST to returns in
    one quarter — a selective returnflag filter pushed to the lineitem
    scan, the quarter filter pushed to orders, a group-by over customer
    attributes, then orderBy+limit which Spark executes as
    TakeOrderedAndProject (per-partition 20-row heaps, no global sort).
    The customer relation rides the group-by key set; nation broadcasts.
    The sort key ends with the unique custkey so the top-20 boundary is
    tie-free."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nat = load_table(spark, sf_dir, "nation")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    cust_n = cust.join(
        F.broadcast(nat.select("n_nationkey", "n_name")),
        cust["c_nationkey"] == F.col("n_nationkey"),
    ).select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        "n_name",
        "c_mktsegment",
    )
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("revenue_cents"))
        .join(cust_n, F.col("o_custkey") == cust_n["c_custkey"])
        .select(
            "c_custkey", "c_name", "revenue_cents", "acctbal_cents",
            "n_name", "c_mktsegment",
        )
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(20)
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the local-supplier volume query — its signature
    is the NON-join-key equality c_nationkey = s_nationkey, which ties
    the two dimension arms of the star together. The supplier arm
    (supplier ⋈ nation ⋈ region, region-filtered) collapses into one
    broadcast BEFORE touching the fact, so the region filter prunes
    lineitem rows map-side; orders carries the pushed year filter; the
    customer join then only has to enforce the same-nation equality.
    One fact shuffle per fact-fact join, |region nations| output rows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"],
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(
            orders.select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(
            cust.select("c_custkey", "c_nationkey"),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter aggregate — no join at all.
    All three predicates (ship year, discount band, quantity cap) land
    as PushedFilters on the parquet scan, ReadSchema carries only the
    four referenced columns, and the whole plan is one map-side partial
    agg + a single-row final: the minimal possible 100 TB query (I/O
    bound by construction, zero shuffle rows)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    cents = F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
        "long"
    )
    return li.agg(
        F.sum(cents).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a fact-wide group-by, joined back to
    the order/customer attributes — the large-volume-customer query.
    The quantity rollup is one lineitem shuffle on l_orderkey with full
    partial aggregation; the HAVING filter shrinks it to a tiny key set
    BEFORE any join, so both join-backs probe with the survivors (AQE
    broadcasts them at any realistic threshold). The final top-100 is
    TakeOrderedAndProject — per-partition heaps, no global sort; the
    boundary is tie-free because the sort ends on the unique orderkey.
    Quantities are integral by data contract, so the sum casts to long
    losslessly (hash-stable vs the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .join(
            cust.select("c_custkey", "c_name"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias(
                "totalprice_cents"
            ),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


QUERIES = {
    "local_supplier_volume": q_local_supplier_volume,
    "forecast_revenue": q_forecast_revenue,
    "large_volume_customers": q_large_volume_customers,
    "two_nation_volume": q_two_nation_volume,
    "nation_profit": q_nation_profit,
    "returned_item_customers": q_returned_item_customers,
    "bloom_gated_revenue": q_bloom_gated_revenue,
    "shipping_priority": q_shipping_priority,
    "nation_market_share": q_nation_market_share,
    "important_parts": q_important_parts,
    "late_priority_lines": q_late_priority_lines,
    "disjunctive_revenue": q_disjunctive_revenue,
    "blocking_suppliers": q_blocking_suppliers,
    "rich_idle_customers": q_rich_idle_customers,
    "min_cost_supplier": q_min_cost_supplier,
    "excess_shipments": q_excess_shipments,
    "top_supplier_by_revenue": q_top_supplier_by_revenue,
    "small_qty_revenue": q_small_qty_revenue,
    "pricing_summary": q_pricing_summary,
    "promo_revenue": q_promo_revenue,
    "supplier_nation_revenue": q_supplier_nation_revenue,
    "big_order_customers": q_big_order_customers,
    "customers_without_orders": q_customers_without_orders,
    "top_customers": q_top_customers,
    "region_revenue": q_region_revenue,
    "order_priority_counts": q_order_priority_counts,
    "customer_order_distribution": q_customer_order_distribution,
    "part_supplier_variety": q_part_supplier_variety,
}

ORACLE = {
    "local_supplier_volume": """
SELECT n.n_name AS nation,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_lines
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
                AND c.c_nationkey = s.s_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
""",
    "forecast_revenue": """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    "large_volume_customers": """
WITH big AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING CAST(sum(l_quantity) AS BIGINT) > 150
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY b.total_qty DESC, o.o_orderkey
LIMIT 100
""",
    "two_nation_volume": """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_3')
    OR (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
""",
    "nation_profit": """
SELECT n.n_name AS nation, year(l.l_shipdate) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)
                - CAST(round(l.l_quantity * p.p_retailprice * 80)
                       AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2
""",
    "returned_item_customers": """
WITH rev AS (
  SELECT o.o_custkey,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT)) AS revenue_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT c.c_custkey, c.c_name, CAST(r.revenue_cents AS BIGINT) AS revenue_cents,
       CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       n.n_name, c.c_mktsegment
FROM rev r
JOIN customer c ON c.c_custkey = r.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY revenue_cents DESC, c.c_custkey
LIMIT 20
""",
    "bloom_gated_revenue": """
SELECT p.p_brand,
       count(*) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'LARGE'
GROUP BY 1
""",
    "shipping_priority": """
SELECT l.l_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, l.l_orderkey
LIMIT 10
""",
    "nation_market_share": """
WITH eur_cust AS (
  SELECT c.c_custkey
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
),
vol AS (
  SELECT year(o.o_orderdate) AS o_year,
         sum(CASE WHEN sn.n_name = 'NATION_3'
                  THEN CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 100) AS BIGINT)
                  ELSE 0 END) AS nat_cents,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT)) AS total_cents
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'STANDARD'
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN eur_cust ec ON ec.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  GROUP BY 1
)
SELECT o_year,
       CAST((nat_cents * 1000000) // total_cents AS BIGINT) AS mkt_share_ppm,
       CAST(total_cents AS BIGINT) AS total_cents
FROM vol
""",
    "important_parts": """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS revenue_cents
  FROM lineitem GROUP BY 1
),
total AS (SELECT sum(revenue_cents) AS t, count(*) AS n FROM per_part)
SELECT l_partkey AS p_partkey, CAST(revenue_cents AS BIGINT) AS revenue_cents
FROM per_part, total
WHERE revenue_cents * n * 2 > t * 3
""",
    "late_priority_lines": """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
GROUP BY 1
""",
    "disjunctive_revenue": """
SELECT count(*) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#6' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    "blocking_suppliers": """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
  FROM lineitem GROUP BY 1, 2
),
per_o AS (
  SELECT l_orderkey, count(*) AS n_sup, sum(ret) AS n_ret_sup
  FROM per_os GROUP BY 1
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       count(*) AS numwait
FROM per_os p
JOIN per_o o ON o.l_orderkey = p.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.ret = 1 AND o.n_sup >= 2 AND o.n_ret_sup = 1
GROUP BY 1, 2
""",
    "rich_idle_customers": """
WITH c AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
avg_pos AS (
  SELECT (sum(bal_cents) * 10000) // count(*) AS avg_tc
  FROM c WHERE bal_cents > 0
)
SELECT nationkey, count(*) AS numcust,
       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
FROM c, avg_pos
WHERE bal_cents * 10000 > avg_tc
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY nationkey
""",
    "min_cost_supplier": """
WITH eur AS (
  SELECT s.s_suppkey, s.s_name, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
),
costs AS (
  SELECT l.l_partkey, l.l_suppkey, e.s_name, e.n_name,
         min(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cost_cents
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'LARGE'
  JOIN eur e ON e.s_suppkey = l.l_suppkey
  GROUP BY 1, 2, 3, 4
),
mn AS (SELECT l_partkey, min(cost_cents) AS mnc FROM costs GROUP BY 1)
SELECT c.l_partkey AS p_partkey, CAST(c.l_suppkey AS BIGINT) AS s_suppkey,
       c.s_name, c.n_name, c.cost_cents
FROM costs c JOIN mn ON mn.l_partkey = c.l_partkey
WHERE c.cost_cents = mn.mnc
""",
    "excess_shipments": """
WITH ps AS (
  SELECT l.l_partkey, l.l_suppkey,
         sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS q_cents
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
tot AS (SELECT l_partkey, sum(q_cents) AS t FROM ps GROUP BY 1),
dom AS (
  SELECT ps.l_suppkey, ps.q_cents
  FROM ps JOIN tot ON tot.l_partkey = ps.l_partkey
  WHERE ps.q_cents * 2 > tot.t
)
SELECT CAST(d.l_suppkey AS BIGINT) AS s_suppkey, s.s_name, n.n_name,
       CAST(count(*) AS BIGINT) AS n_dominated_parts,
       CAST(sum(d.q_cents) AS BIGINT) AS dom_qty_cents
FROM dom d
JOIN supplier s ON s.s_suppkey = d.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2, 3
""",
    "top_supplier_by_revenue": """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY 1
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
""",
    "small_qty_revenue": """
WITH pa AS (SELECT l_partkey, avg(l_quantity) AS aq FROM lineitem GROUP BY 1)
SELECT count(*) AS n_small_lineitems,
       round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE l.l_quantity < 0.5 * pa.aq
""",
    "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    "promo_revenue": """
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue,
       count(*) AS n_lineitems
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
""",
    "supplier_nation_revenue": """
SELECT n.n_name AS supplier_nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1
""",
    "big_order_customers": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
""",
    "customers_without_orders": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
""",
    "top_customers": """
WITH per_cust AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spent,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY total_spent DESC, o_custkey) AS rank
  FROM per_cust
)
SELECT r.rank, c.c_custkey, c.c_name, c.c_mktsegment, r.total_spent, r.n_orders
FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
WHERE r.rank <= 5
""",
    "region_revenue": """
SELECT r.r_name AS region,
       round(sum(o.o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
    "order_priority_counts": """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    "customer_order_distribution": """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT n_orders, count(*) AS n_customers FROM per_cust GROUP BY n_orders
""",
    "part_supplier_variety": """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p_brand, p_type
""",
}

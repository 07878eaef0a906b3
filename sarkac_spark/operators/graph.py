"""Distributed connected components — the clustering step that turns
near-duplicate PAIRS into duplicate GROUPS (pick one canonical doc per
group, drop the rest). Pair emission (minhash/simhash/cosine) is only
half of dedup; without the transitive closure, A~B and B~C dedup to
two overlapping pairs instead of one {A,B,C} group.

Algorithm: iterative min-label propagation. Each round every node
takes the minimum label among itself and its neighbors — a join with
the symmetrized edge list plus one grouped min. Deterministic: the
fixpoint labels every node with the minimum node id reachable from it,
independent of iteration schedule or partitioning.

Scale notes:
- Rounds needed = graph diameter. Near-dup components are near-cliques
  (every member similar to most others), so 2-4 rounds in practice; the
  ``max_iter`` guard raises rather than silently returning partial
  labels. For adversarial long-path graphs use
  ``connected_components_star`` below (alternating large-star/
  small-star, Kiveris et al.) — O(log^2 n) rounds regardless of
  diameter.
- Each round's result is ``localCheckpoint``-ed: iterative DataFrame
  loops otherwise grow the lineage/plan exponentially and re-derive
  every prior round per action. On a cluster prefer
  ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` for
  fault-tolerant truncation.
- The convergence test is an aggregate (count of changed labels), one
  tiny action per round on the label relation (|nodes| rows), never on
  the fact stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    star_fallback: bool = True,
) -> DataFrame:
    """Labels every node appearing in ``edges`` with its component id
    (the minimum node id in the component). Returns (node, component).

    If ``max_iter`` min-label rounds don't reach the fixpoint (component
    diameter exceeds the bound — adversarial chain-shaped graphs, not
    the near-clique dedup case), the operator automatically restarts as
    ``connected_components_star`` (O(log^2 n) rounds regardless of
    diameter) rather than failing the job; the partial labels are
    discarded. Set ``star_fallback=False`` to raise instead — the mode
    for pipelines that treat an unexpected long-diameter graph as a data
    quality signal worth stopping on.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select("u").distinct().withColumn("lbl", F.col("u"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("u").alias("v"), F.col("lbl").alias("__vlbl")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("__vlbl").alias("__nbl"))
        )
        new_labels = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("__nbl"), F.col("lbl"))
                ).alias("lbl"),
                (F.coalesce(F.col("__nbl"), F.col("lbl")) < F.col("lbl")).alias(
                    "__chg"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("__chg")).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            return labels.select(F.col("u").alias("node"), F.col("lbl").alias("component"))
    if star_fallback:
        return connected_components_star(edges, src=src, dst=dst)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the bound; raise max_iter or switch "
        "to connected_components_star"
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """(v, m(u)) for every neighbor v > u, where m(u) = min(N(u) ∪ {u})."""
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("__m")
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("__m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient each edge large→small, then hang every member of
    N(u) ∪ {u} off the neighborhood minimum."""
    o = (
        e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = o.groupBy("u").agg(F.min("v").alias("__m"))  # min(v) < u always
    members = o.join(mins, "u").select(
        F.col("v").alias("node"), F.col("__m").alias("root")
    )
    selfs = mins.select(F.col("u").alias("node"), F.col("__m").alias("root"))
    return (
        members.unionByName(selfs)
        .filter(F.col("node") != F.col("root"))
        .select(F.col("node").alias("u"), F.col("root").alias("v"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the adversarial-diameter path next to ``connected_components``:
    min-label propagation needs *diameter* rounds (a 1e6-node chain
    would need 1e6 shuffles), star contraction converges in O(log^2 n)
    rounds regardless of shape. Same output contract: (node, component)
    with component = min reachable id.

    Per round: two grouped mins + two projection joins over the edge
    relation (which only shrinks toward one star edge per non-root
    node), each round localCheckpoint-ed; convergence is detected with a
    2-scalar signature (edge count + hash sum — one tiny action), not an
    edge-set join. Prefer the min-label operator for near-clique dedup
    graphs (2-4 rounds, fewer ops/round); prefer this one when diameter
    is unknown or unbounded (web graphs, co-occurrence chains).
    """
    base = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        base.select(F.col("u").alias("node"))
        .union(base.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def signature(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # xor: order-independent and overflow-free under ANSI mode
            F.coalesce(
                F.bit_xor(F.xxhash64(F.col("u"), F.col("v"))), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return row.n, row.h

    e = base
    prev = None
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        e = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        sig = signature(e)
        if sig == prev:
            roots = e.groupBy("u").agg(F.min("v").alias("__root"))
            return (
                nodes.join(roots, nodes.node == roots.u, "left")
                .select(
                    "node",
                    F.coalesce(F.col("__root"), F.col("node")).alias("component"),
                )
            )
        prev = sig
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )

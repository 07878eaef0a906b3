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
  labels. For adversarial long-path graphs use the alternating
  large-star/small-star formulation (Kiveris et al., "Connected
  Components in MapReduce and Beyond") — same join primitives,
  O(log^2 n) rounds.
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
) -> DataFrame:
    """Labels every node appearing in ``edges`` with its component id
    (the minimum node id in the component). Returns (node, component).
    Raises if ``max_iter`` rounds don't reach the fixpoint."""
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
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the bound; raise max_iter or switch "
        "to the large-star/small-star formulation"
    )

"""Keyed-state streaming IVF top-k — the retrieval-side twin of
``streaming_semantic_dedup`` (which covers the ingest-dedup side): as
embedding vectors ARRIVE, maintain each standing query's current
top-k nearest neighbors, probing only the query's IVF buckets.

The deployment shape this models: a training-data store indexes
embeddings incrementally (IVF assignment at ingest) while standing
retrieval queries (eval-set probes, hard-negative miners, dedup
sentinels) keep live top-k result sets — re-running batch ``ivf_topk``
over the whole corpus per ingest batch is O(corpus)/trigger, the same
non-starter as the sigma rescan engine.

Plan shape, all shared with batch (stream buckets == batch buckets by
construction, same ``assign_buckets`` expression code):

1. bucket-assign the arriving vectors: map-only argmax fold over the
   broadcast centroid array (stream-static broadcast, no shuffle);
2. stream-static equi-join on ``bucket`` against the (tiny) standing
   query relation, pre-assigned to its ``nprobe`` probe buckets —
   per-trigger candidate work is O(|batch| x queries-per-bucket),
   never O(corpus);
3. score candidates with the shared rounded-cosine expressions
   (JVM-side);
4. ``applyInPandasWithState`` keyed by ``query_id``: merge the batch's
   candidates into the query's retained top-k and emit the refreshed
   snapshot.

State is bounded BY CONSTRUCTION: |queries| keys x k (score, id)
pairs — independent of corpus size and stream length; no watermark
needed for boundedness.

Snapshot semantics: every trigger emits each updated query's FULL
current top-k, tagged with ``n_seen`` (total candidates that query has
scored so far) so downstream consumers (and the stream≡batch test) can
pick the latest snapshot per query: after the stream drains, the
snapshot with max ``n_seen`` equals batch ``ivf_topk`` over the full
corpus row-for-row (same rounding, same (cos_sim desc, neighbor_id)
tiebreak; pinned in tests/test_stateful_ivf.py). Sole exception:
zero-norm vectors score NULL-cosine and are dropped from the stream's
candidate flow (see the inline note) — batch pads trailing ranks with
null-score rows only in buckets with fewer than k finite candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from sarkac_spark.operators.similarity import (
    assign_buckets,
    cosine_with_norms,
    norm,
)

STATE_SCHEMA = "scores array<double>, ids array<long>, n_seen long"
OUT_SCHEMA = (
    "query_id long, neighbor_id long, cos_sim double, rank long, n_seen long"
)


def streaming_ivf_topk(
    stream: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 1,
) -> DataFrame:
    """Standing-query IVF retrieval over an embedding stream; see the
    module docstring. ``queries``/``centroids`` are static (batch)
    relations; ``stream`` is a streaming DataFrame with ``id_col`` and
    ``vec_col`` columns. Returns a streaming DataFrame of OUT_SCHEMA
    snapshots (use outputMode("append"))."""
    assigned = assign_buckets(stream, centroids, id_col, vec_col)
    q_assigned = (
        assign_buckets(queries, centroids, id_col, vec_col, n_best=nprobe)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("bucket"),
            F.col("vec").alias("q_vec"),
        )
        .withColumn("q_norm", norm(F.col("q_vec")))
    )
    scored = (
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            "bucket",
            F.col("vec").alias("c_vec"),
        )
        .withColumn("c_norm", norm(F.col("c_vec")))
        .join(F.broadcast(q_assigned), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_with_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
                ),
                6,
            ).alias("cos_sim"),
        )
        # zero-norm vectors score NULL (try_divide contract) -> NaN in
        # the Arrow batch; Python's sort is undefined under NaN keys, so
        # a NaN could silently occupy a top-k state slot forever. Drop
        # them here: a null-cosine candidate can never beat a real score
        # (batch's desc window sorts nulls LAST), so the only divergence
        # from batch ivf_topk is the degenerate bucket with fewer than k
        # finite-scored candidates, where batch pads trailing ranks with
        # null-score rows and the stream emits the shorter honest list.
        .filter(F.col("cos_sim").isNotNull())
    )

    def merge_topk(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (query_id,) = key
        if state.exists:
            scores, ids, n_seen = state.get
            scores, ids = list(scores), list(ids)
        else:
            scores, ids, n_seen = [], [], 0
        for pdf in pdfs:
            n_seen += len(pdf)
            scores.extend(float(s) for s in pdf["cos_sim"])
            ids.extend(int(i) for i in pdf["neighbor_id"])
            # batch tiebreak contract == batch ivf_topk's window order:
            # cos_sim desc, neighbor_id asc
            order = sorted(range(len(scores)), key=lambda j: (-scores[j], ids[j]))[:k]
            scores = [scores[j] for j in order]
            ids = [ids[j] for j in order]
        state.update((scores, ids, n_seen))
        yield pd.DataFrame(
            {
                "query_id": [query_id] * len(ids),
                "neighbor_id": ids,
                "cos_sim": scores,
                "rank": list(range(1, len(ids) + 1)),
                "n_seen": [n_seen] * len(ids),
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return scored.groupBy("query_id").applyInPandasWithState(
        merge_topk,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

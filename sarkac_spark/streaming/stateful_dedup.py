"""Keyed-state streaming semantic dedup — the in-flight twin of
``operators/similarity.semantic_dedup`` for a live training-data ingest:
drop each arriving embedding that is a near-duplicate (cosine > tau) of
an earlier-kept vector in its sign-LSH bucket.

Why a custom stateful operator: near-dup needs the *vectors* of prior
survivors, not just their keys, so ``dropDuplicatesWithinWatermark``
(exact-key dedup) cannot express it. ``applyInPandasWithState`` keyed by
bucket holds the kept representatives per bucket.

Semantics vs batch: the batch operator keeps the LOWEST id of each
duplicate group (retrospective, needs the whole corpus) and drops on
ANY lower-id mate above tau; the stream keeps the FIRST ARRIVAL and
compares only against KEPT representatives (SemDeDup's
compare-to-representative rule — the only causal choice in-flight).
The two agree exactly when duplicate groups are cliques at tau (exact
duplicates always are; pinned by test on id-ordered arrival). A chain
A–B–C where B duplicates A and C is near only B diverges: batch drops
C, the stream keeps it — the stream can only ever keep MORE, never
false-drop. Zero-norm vectors are never dropped and never become
representatives — the batch rule.

Scale shape: bucket assignment is the same map-only expression code as
batch (shared ``sign_dots``/``bucket_from_dots``, so stream buckets ==
batch buckets); the shuffle is the groupBy(bucket) the state operator
needs. State is bounded BY CONSTRUCTION: at most 2^n_bits keys (the
bucket space) x ``max_reps_per_bucket`` x dim doubles — no watermark
eviction required for boundedness. When a bucket's rep list hits the
cap, new arrivals are still *checked* (and droppable) but no longer
*added* as representatives — the documented degradation is missed dups
against post-cap arrivals, never false drops. Scoring per batch is one
numpy matmul per bucket-group: O(|batch| x reps x dim), vectorized.

Compatibility (round 5): OUT_SCHEMA gained the ``saturated`` column
(bucket-cap observability). This is CHECKPOINT/SINK-BREAKING for
queries deployed on the pre-change schema: resuming from an existing
checkpoint into a previously-written parquet sink hits an output schema
mismatch with the old files, and downstream readers of the old output
see a new column. Migrate by starting a NEW sink directory (+ fresh
checkpoint), or one-time rewrite the old sink adding ``saturated`` as
NULL; never mix the two schemas under one sink path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "rep_vecs array<array<double>>"
OUT_SCHEMA = (
    "vec_id long, bucket long, kept long, saturated long, event_ts_us long"
)


def streaming_semantic_dedup(
    stream: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ts_col: str = "ts",
    dim: int = 64,
    n_bits: int = 8,
    tau: float = 0.9,
    salt: str = "semdedup",
    max_reps_per_bucket: int = 4096,
    round_digits: int = 6,
) -> DataFrame:
    """Output (append): (vec_id, bucket, kept, saturated, event_ts_us) —
    kept=0 rows are the near-duplicates to discard downstream.
    ``saturated=1`` marks a kept row that arrived while its bucket's rep
    list was at ``max_reps_per_bucket`` and therefore was NOT added as a
    representative: future duplicates of THAT row can no longer be
    caught (the documented cap degradation — missed dups only, never
    false drops). ``sum(saturated)`` per bucket is the operator-visible
    saturation meter: non-zero means grow the cap or shrink tau."""
    from sarkac_spark.operators.similarity import (
        _as_double,
        bucket_from_dots,
        sign_dots,
    )

    staged = stream.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(ts_col).alias("__ts"),
        _as_double(vec_col).alias("__v"),
    ).withColumn("__dots", sign_dots(F.col("__v"), dim, n_bits, salt))
    assigned = staged.select(
        "vec_id",
        "__ts",
        "__v",
        bucket_from_dots(F.col("__dots"), n_bits).alias("bucket"),
    )

    def scan(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        reps: list[list[float]] = (
            [list(v) for v in state.get[0]] if state.exists else []
        )
        rep_mat = (
            np.asarray(reps, dtype=np.float64)
            if reps
            else np.empty((0, 0), dtype=np.float64)
        )
        rep_norms = (
            np.linalg.norm(rep_mat, axis=1) if reps else np.empty(0)
        )
        for pdf in pdfs:
            # event-time order; ties broken by id — deterministic
            # whatever the physical arrival order inside the batch
            pdf = pdf.sort_values(["__ts", "vec_id"], kind="stable")
            ser = pdf["__ts"]
            if isinstance(ser.dtype, pd.DatetimeTZDtype):
                ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
            ts_us = ser.astype("datetime64[us]").astype("int64").to_numpy()
            vecs = np.asarray(list(pdf["__v"]), dtype=np.float64)
            kept_flags = np.ones(len(pdf), dtype=np.int64)
            sat_flags = np.zeros(len(pdf), dtype=np.int64)
            for i in range(len(pdf)):
                v = vecs[i]
                nv = float(np.linalg.norm(v))
                if nv == 0.0:
                    continue  # zero-norm: kept, never a representative
                if rep_mat.size:
                    sims = (rep_mat @ v) / (rep_norms * nv)
                    sims = np.round(sims, round_digits)
                    if np.nanmax(sims) > tau:
                        kept_flags[i] = 0
                        continue
                if len(reps) < max_reps_per_bucket:
                    reps.append([float(x) for x in v])
                    rep_mat = (
                        np.vstack([rep_mat, v[None, :]])
                        if rep_mat.size
                        else v[None, :].copy()
                    )
                    rep_norms = np.append(rep_norms, nv)
                else:
                    # cap degradation, made observable: kept but NOT
                    # representing — its future dups go undetected
                    sat_flags[i] = 1
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "bucket": np.full(len(pdf), key[0], dtype=np.int64),
                    "kept": kept_flags,
                    "saturated": sat_flags,
                    "event_ts_us": ts_us,
                }
            )
        state.update((reps,))

    return assigned.groupBy("bucket").applyInPandasWithState(
        scan,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""StatefulDedupPipeline — the keyed-state ingest-dedup engine: true
O(batch) per-trigger cost at ANY committed-corpus size.

Why this engine exists: the parquet-store arm
(``IncrementalDedupPipeline`` / ``StreamingCuratorPipeline``) keeps
dedup signatures in a columnar store and re-SCANS the signature columns
every trigger. That scan is column-pruned and shuffle-free, but it is
still O(store) I/O — ``BENCH_STREAM_DECADE`` measured the curator's
per-trigger wall at 2.2x across a 100x store decade, attributed to the
``sh_set`` verify column (the shingle sets are the same order as the
text itself). At 10^10 committed docs no per-trigger scan survives.

The Spark-native fix is the same one the sigma engine uses
(``stateful_sigma``): move the membership structure into KEYED
STREAMING STATE, where the state store (RocksDB at scale —
``session.get_spark(rocksdb_state=True)``) does POINT LOOKUPS for
exactly the keys present in the batch instead of scanning the corpus:

- key   = LSH band key (plus one ``xh|<md5>`` exact band per doc, so
  byte-identical replays die even for docs too short to shingle),
- state = the band's seen members: (id, shingle-hash set), df-capped,
- op    = ``applyInPandasWithState``: each batch doc is verified
  (exact Jaccard, or the union-bottom-k estimator when ``max_sh_set``
  truncation is on) against ONLY its own bands' members.

Per-trigger cost: O(batch x bands) state lookups + a batch-sized
verdict aggregation. Committed-corpus size never appears.

Semantics vs the parquet arm (both pinned by tests):

- WITHIN a batch: identical — drop a doc iff it pairs (band collision
  + Jaccard >= threshold) with a LOWER-id batch mate, dropped or not
  (``incremental_minhash_drop_ids_sigs``'s exact within-batch rule).
- ACROSS triggers: this engine is SEEN-corpus (a new doc matching any
  previously OBSERVED doc — kept or dropped — is dropped), while the
  parquet arm is COMMITTED-corpus (dropped docs leave no trace). The
  engines diverge only on near-dup CHAINS (A kept, B dropped as ~A, C
  arrives ~B but not ~A: parquet keeps C, this engine drops C —
  ``test_chain_divergence_is_the_documented_contract``). Seen-corpus
  is the stricter and cheaper contract (state append needs no global
  kept-verdict, which a per-key operator cannot see), and is what
  Bloom-style production ingest dedup implements.
- Hot bands: a band whose ALL-TIME df reaches ``max_band_df`` stops
  matching AND stops growing (the parquet arm caps on CURRENT-relation
  df). Both bound per-row work at cap; docs still pair via their other
  bands.

Exactly-once: band state commits transactionally with the epoch (the
state store is versioned by batch id, so a replayed epoch re-runs
against its PRE-batch state and re-emits identical verdicts), and the
downstream text/quota/funnel stores follow the house per-epoch-
overwrite discipline. Same precondition as every ingest store: doc ids
unique across the stream.

Composition: quality gates are stateless — apply them to the stream
BEFORE ``start()`` (``Curator._quality_stage`` closures work as-is).
``domain_cap`` uses the SHARED ``apply_domain_quota`` admission rule,
so quota semantics cannot diverge from ``StreamingCuratorPipeline``.
Funnel stages recorded per epoch: ``input`` (post-quality), ``dedup``,
``domain_cap``.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import BooleanType, StructField, StructType

from sarkac_spark.operators.dedup import (
    MINHASH_MAX_BAND_DF,
    row_signatures,
)
from sarkac_spark.streaming.incremental_dedup import _is_empty_store_error
from sarkac_spark.streaming.storeutil import atomic_swap, raise_if_half_swapped
from sarkac_spark.streaming.streaming_curator import apply_domain_quota

STATE_SCHEMA = "ids array<long>, lens array<int>, shs array<long>"
_EXACT_PREFIX = "xh|"


def _band_verdicts(
    id_col: str,
    threshold: float,
    max_band_df: int | None,
    bottom_k: int | None,
):
    """The per-band stateful function: verify each new doc against the
    band's seen members (state) and its lower-id batch mates, emit the
    payload row + ``__dropped``, append the batch to state (seen-corpus
    semantics; see module docstring). Exact bands (``xh|`` prefix)
    match on presence — same text hash IS the same text."""

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        exact = key[0].startswith(_EXACT_PREFIX)
        if state.exists:
            ids, lens, shs = state.get
            ids, lens, shs = list(ids), list(lens), list(shs)
        else:
            ids, lens, shs = [], [], []

        # band groups are df-capped small: concat so the lower-id-mate
        # rule sees the whole group, not one Arrow chunk at a time
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(id_col, kind="stable", ignore_index=True)
        n = len(pdf)
        dropped = np.zeros(n, dtype=bool)

        hot = max_band_df is not None and len(ids) >= max_band_df
        if exact:
            # presence match: any prior member, or any lower-id batch
            # mate (identical digest => identical text)
            if ids:
                dropped[:] = True
            else:
                dropped[1:] = True
        elif not hot:
            offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            prior_sets = [
                frozenset(shs[offs[j]:offs[j + 1]]) for j in range(len(ids))
            ]
            batch_sets = [frozenset(x) for x in pdf["sh_set"]]
            for r in range(n):
                a = batch_sets[r]
                if not a:
                    continue
                for b in prior_sets:
                    if _jaccard(a, b, bottom_k) >= threshold:
                        dropped[r] = True
                        break
                if dropped[r]:
                    continue
                for m in range(r):
                    if _jaccard(a, batch_sets[m], bottom_k) >= threshold:
                        dropped[r] = True
                        break

        # seen-corpus append, bounded at the df cap; an exact band only
        # ever needs its FIRST member (presence is the whole verdict),
        # so its state stays one entry however many replays land on it
        for r in range(n):
            if exact and ids:
                break
            if max_band_df is not None and len(ids) >= max_band_df:
                break
            ids.append(int(pdf[id_col].iloc[r]))
            s = [] if exact else sorted(pdf["sh_set"].iloc[r])
            lens.append(len(s))
            shs.extend(int(x) for x in s)
        state.update((ids, lens, shs))

        out = pdf.drop(columns=["sh_set", "band_key"])
        out["__dropped"] = dropped
        yield out

    return fn


def _jaccard(a: frozenset, b: frozenset, bottom_k: int | None) -> float:
    """Exact Jaccard, or the union-bottom-k estimator when the stored
    sets are ``max_sh_set``-truncated (k smallest of A∪B, fraction in
    both — the ``incremental_minhash_drop_ids_sigs(max_sh_set=...)``
    estimator, exact whenever |A∪B| <= k and unbiased otherwise)."""
    if not a or not b:
        return 0.0
    if bottom_k is None:
        inter = len(a & b)
        return inter / (len(a) + len(b) - inter)
    union_bottom = sorted(a | b)[:bottom_k]
    both = sum(1 for h in union_bottom if h in a and h in b)
    return both / len(union_bottom)


class StatefulDedupPipeline:
    """``minhash`` dict (``k``, ``bands``, ``threshold``, ``shingle_n``,
    ``max_band_df``, ``max_sh_set``) configures near-dup dropping; None
    runs exact-only (the ``xh|`` bands alone). ``domain_cap``
    (``{"domain_col", "cap", "quality_col"?}``) adds the shared quota
    stage. Stores: ``store_dir`` (committed corpus, epoch partitions),
    ``_quota`` / ``_funnel`` siblings — NO signature store: the band
    state inside the streaming checkpoint replaces it."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        minhash: dict | None = None,
        domain_cap: dict | None = None,
    ) -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.quota_dir = store_dir.rstrip("/") + "_quota"
        self.funnel_dir = store_dir.rstrip("/") + "_funnel"
        self.id_col = id_col
        self.text_col = text_col
        self.minhash = minhash
        self.domain_cap = domain_cap

    # --- the streaming DAG ---------------------------------------------------

    def verdict_stream(self, doc_stream: DataFrame) -> DataFrame:
        """doc rows -> per-band verdict rows (payload + ``__dropped``).
        Stateless signature projection, band explode, then ONE
        ``applyInPandasWithState`` keyed by band key."""
        mh = self.minhash or {}
        if self.minhash is None:
            # exact-only: no shingle work at all — text_hash IS the
            # whole signature (the IncrementalDedupPipeline contract)
            sigs = doc_stream.withColumn(
                "text_hash", F.md5(F.col(self.text_col))
            ).withColumn("sh_set", F.array().cast("array<long>"))
        else:
            sigs = row_signatures(
                doc_stream,
                self.id_col,
                self.text_col,
                k=int(mh.get("k", 16)),
                bands=int(mh.get("bands", 4)),
                shingle_n=int(mh.get("shingle_n", 3)),
                max_sh_set=mh.get("max_sh_set"),
            )
        # null texts share one exact band (sentinel): the parquet arm's
        # batch-first window groups null digests together the same way
        exact_band = F.array(
            F.concat(
                F.lit(_EXACT_PREFIX), F.coalesce(F.col("text_hash"), F.lit("∅"))
            )
        )
        all_bands = (
            exact_band
            if self.minhash is None
            else F.concat(exact_band, F.col("band_keys"))
        )
        exploded = sigs.withColumn("band_key", F.explode(all_bands)).drop(
            "text_hash", "band_keys"
        )
        out_schema = StructType(
            list(doc_stream.schema) + [StructField("__dropped", BooleanType())]
        )
        fn = _band_verdicts(
            self.id_col,
            float(mh.get("threshold", 0.5)),
            mh.get("max_band_df", MINHASH_MAX_BAND_DF),
            mh.get("max_sh_set"),
        )
        return exploded.groupBy("band_key").applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def commit_batch(self, verdicts: DataFrame, epoch_id: int) -> None:
        """foreachBatch half: fold per-band verdicts to per-doc (drop if
        ANY band dropped it), apply the shared quota, write the text /
        quota / funnel stores per-epoch. Every relation here is
        batch-sized."""
        verdicts = verdicts.localCheckpoint(eager=True)
        per_doc = (
            verdicts.groupBy(self.id_col)
            .agg(
                F.max("__dropped").alias("__dropped"),
                *[
                    F.first(c).alias(c)
                    for c in verdicts.columns
                    if c not in (self.id_col, "__dropped")
                ],
            )
        ).localCheckpoint(eager=True)
        counts = [("input", per_doc.count())]
        kept = per_doc.filter(~F.col("__dropped")).drop("__dropped")
        counts.append(("dedup", kept.count()))
        if self.domain_cap is not None:
            kept = apply_domain_quota(
                kept,
                self._prior_quota(exclude_epoch=epoch_id),
                self.domain_cap,
                self.id_col,
            ).localCheckpoint(eager=True)
            counts.append(("domain_cap", kept.count()))
            domain_col = self.domain_cap.get("domain_col", "source")
            kept.groupBy(domain_col).agg(
                F.count(F.lit(1)).alias("n_admitted")
            ).write.mode("overwrite").parquet(
                os.path.join(self.quota_dir, f"epoch={epoch_id}")
            )
        kept.write.mode("overwrite").parquet(
            os.path.join(self.store_dir, f"epoch={epoch_id}")
        )
        self.spark.createDataFrame(
            counts, "stage string, n_docs long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.funnel_dir, f"epoch={epoch_id}")
        )

    def start(
        self,
        doc_stream: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int | None = None,
    ):
        writer = (
            self.verdict_stream(doc_stream)
            .writeStream.foreachBatch(self.commit_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger_seconds is None:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()

    # --- reads / maintenance -------------------------------------------------

    def _read_or_none(self, path: str) -> DataFrame | None:
        try:
            return self.spark.read.parquet(path)
        except AnalysisException as e:
            if _is_empty_store_error(e):
                raise_if_half_swapped(path)
                return None
            raise

    def _prior_quota(self, exclude_epoch: int) -> DataFrame | None:
        q = self._read_or_none(self.quota_dir)
        if q is None or self.domain_cap is None:
            return None
        domain_col = self.domain_cap.get("domain_col", "source")
        return (
            q.filter(F.col("epoch") != exclude_epoch)
            .groupBy(domain_col)
            .agg(F.sum("n_admitted").alias("__prior"))
        )

    def committed(self) -> DataFrame:
        """The deduped corpus so far (full input schema)."""
        return self.spark.read.parquet(self.store_dir).drop("epoch")

    def funnel(self) -> DataFrame:
        """(epoch, stage, n_docs) counters."""
        return self.spark.read.parquet(self.funnel_dir)

    def compact(self, target_partitions: int | None = None) -> int:
        """Fold the text/quota/funnel epoch partitions into one base
        partition each (``epoch=-1``; run while the stream is STOPPED —
        the ``IncrementalDedupPipeline.compact`` contract). Band state
        needs NO compaction: RocksDB/HDFS state files are maintained by
        the streaming checkpoint itself. ``target_partitions=None``
        auto-sizes the folded text store (~250k rows per file) so
        later scans keep their parallelism at any corpus size."""
        n_docs = 0
        docs = self._read_or_none(self.store_dir)
        if docs is not None:
            folded = docs.drop("epoch")
            n_docs = folded.count()
            parts = target_partitions or max(1, n_docs // 250_000)
            tmp = self.store_dir.rstrip("/") + ".compact"
            folded.repartition(parts).write.mode("overwrite").parquet(
                os.path.join(tmp, "epoch=-1")
            )
            atomic_swap(tmp, self.store_dir)
        q = self._read_or_none(self.quota_dir)
        if q is not None:
            fold_cols = [c for c in q.columns if c not in ("n_admitted", "epoch")]
            folded = (
                q.drop("epoch")
                .groupBy(*fold_cols)
                .agg(F.sum("n_admitted").alias("n_admitted"))
                .coalesce(1)
            )
            tmp = self.quota_dir + ".compact"
            folded.write.mode("overwrite").parquet(os.path.join(tmp, "epoch=-1"))
            atomic_swap(tmp, self.quota_dir)
        f = self._read_or_none(self.funnel_dir)
        if f is not None:
            folded = (
                f.drop("epoch")
                .groupBy("stage")
                .agg(F.sum("n_docs").alias("n_docs"))
                .coalesce(1)
            )
            tmp = self.funnel_dir + ".compact"
            folded.write.mode("overwrite").parquet(os.path.join(tmp, "epoch=-1"))
            atomic_swap(tmp, self.funnel_dir)
        return n_docs

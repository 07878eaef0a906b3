"""Streaming ingest-time corpus dedup: each micro-batch is deduped
against the committed corpus store with the PROVEN batch operators
(``incremental_exact_dedup`` + ``incremental_minhash_drop_ids_sigs``),
and the survivors are committed — the foreachBatch twin of the
Curator's incremental dedup stage, and the near-dup member of the
streaming dedup family (exact: ``streaming_dedup_exact``; span:
``streaming_span_dedup``; semantic: ``streaming_semantic_dedup``).

Why foreachBatch and not a keyed-state operator: MinHash near-dedup
keys a doc by ALL of its LSH bands, so a pure keyed-state formulation
needs per-band verdicts recombined per doc — a second stateful
aggregation after ``applyInPandasWithState``, which Structured
Streaming does not allow in one query. The foreachBatch shape keeps
the semantics of the batch operator exactly (old×old pairs never
generated, per-trigger cost O(batch × bucket occupancy)) and lets the
corpus store live as plain partitioned parquet any batch job can read.

Exactly-once under at-least-once replay: survivors land in a PER-EPOCH
directory written with overwrite (the ``SigmaStreamPipeline`` store
trick — a replayed epoch rewrites its own partition instead of
appending duplicates), and the corpus side of the dedup EXCLUDES the
current epoch's partition, so a replayed batch never dedups against
its own half-committed rows. The signature store follows the same
per-epoch-overwrite discipline, so text and signatures converge
together on replay.

PRECONDITION (inherited from ``dedup_minhash_incremental``): document
ids are unique across the stream — a replayed epoch re-presents the
same ids, which is exactly the case the epoch exclusion handles, but
two DIFFERENT documents must never share an id.

100 TB shape: the corpus participates ONLY through its materialized
SIGNATURE store (``dedup_signatures``: id, text_hash, LSH band keys,
shingle-hash set — written once per epoch, when the text was already
in memory). Per trigger, the batch is shingled once and joined against
signature-sized corpus data; corpus TEXT is never re-read, so
per-trigger scan bytes are independent of corpus text size (the text
store could be deleted and dedup would not notice — pinned by test).
The band-df cap bounds hot-band fanout in the corpus dimension.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from sarkac_spark.operators.dedup import (
    MINHASH_MAX_BAND_DF,
    dedup_signatures,
    incremental_exact_dedup,
    incremental_minhash_drop_ids_sigs,
)
from sarkac_spark.streaming.storeutil import atomic_swap, raise_if_half_swapped

# AnalysisException error classes that mean "nothing committed yet" —
# the ONLY quiet path. Anything else (corrupt footer, permissions,
# transient FS failure) must fail the trigger loudly: treating a broken
# store as empty would commit the batch UNdeduped, and the damage is
# permanent (a later retry replays only its own epoch).
_EMPTY_STORE_CLASSES = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")

# Signature-store FORMAT version, recorded as a `_FORMAT` marker file
# (underscore prefix: invisible to Spark's parquet reader, like
# _SUCCESS) and checked on every read. Version 2 = sh_set carries
# 60-bit shingle hashes; version 1 stores (mod-P values) are silently
# incompatible — array_intersect over the disjoint value domains is
# empty, so every near-dup would be ADMITTED with zero diagnostics.
# The marker turns that permanent-damage scenario into a loud error.
SIG_STORE_FORMAT = 2


def _is_empty_store_error(e: AnalysisException) -> bool:
    cls = e.getCondition() if hasattr(e, "getCondition") else None
    if cls is None and hasattr(e, "getErrorClass"):
        cls = e.getErrorClass()
    if cls in _EMPTY_STORE_CLASSES:
        return True
    msg = str(e)
    return "Path does not exist" in msg or "Unable to infer schema" in msg


class IncrementalDedupPipeline:
    """``minhash=None`` runs exact-only dedup; a dict (``k``, ``bands``,
    ``threshold``, ``max_band_df``) adds near-dup dropping after the
    exact pass.

    Stores (both plain partitioned parquet, epoch=N partitions):

    - ``store_dir`` — the committed (id, text) corpus, what a training
      job reads via ``committed()``.
    - ``sig_dir`` (default ``store_dir + "_sigs"``) — the
      ``dedup_signatures`` relation for the SAME rows; the only thing
      the per-trigger dedup reads back. Exact-only mode stores just
      (id, text_hash).
    """

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        minhash: dict | None = None,
        sig_dir: str | None = None,
    ) -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.sig_dir = sig_dir or store_dir.rstrip("/") + "_sigs"
        self.id_col = id_col
        self.text_col = text_col
        self.minhash = minhash

    def _read_sigs(self, exclude_epoch: int) -> DataFrame | None:
        """Committed signature rows, excluding ``exclude_epoch``'s
        partition (replay safety). None when nothing is committed yet;
        any OTHER read failure propagates (see _EMPTY_STORE_CLASSES).

        The existence probe IS the read attempt — no driver-local
        ``os.path.exists``, so the store may live on HDFS/S3/anything
        the session's Hadoop conf can reach."""
        try:
            sigs = self.spark.read.parquet(self.sig_dir)
        except AnalysisException as e:
            if _is_empty_store_error(e):
                # not quite quiet: a missing store with a .old remnant
                # means a compact() swap crashed mid-flight — fail loud.
                raise_if_half_swapped(self.sig_dir)
                return None
            raise
        self._check_sig_format()
        return sigs.filter(F.col("epoch") != exclude_epoch).drop("epoch")

    def _check_sig_format(self) -> None:
        """A readable store without a matching `_FORMAT` marker is a
        legacy or foreign store whose sh_set values would compare as
        disjoint — refuse it instead of admitting every near-dup."""
        marker = os.path.join(self.sig_dir, "_FORMAT")
        try:
            with open(marker) as f:
                found = f.read().strip()
        except FileNotFoundError:
            found = None
        if found is None and not os.path.isdir(self.sig_dir):
            # Spark read the store but the local FS can't see it: the
            # store lives on HDFS/S3 etc., where this driver-local
            # marker (like compact()'s shutil swaps) doesn't apply.
            return
        if found != str(SIG_STORE_FORMAT):
            raise RuntimeError(
                f"signature store {self.sig_dir!r} has format "
                f"{found!r}, this engine writes format {SIG_STORE_FORMAT} "
                "(sh_set = 60-bit shingle hashes); rebuild the store by "
                "re-running dedup_signatures over committed() text"
            )

    def _write_sig_format(self) -> None:
        if not os.path.isdir(self.sig_dir):
            return  # remote FS: see _check_sig_format
        with open(os.path.join(self.sig_dir, "_FORMAT"), "w") as f:
            f.write(str(SIG_STORE_FORMAT))

    def committed(self) -> DataFrame:
        """The deduped corpus so far (id, text) — what a training job
        reads."""
        return self.spark.read.parquet(self.store_dir).select(
            self.id_col, self.text_col
        )

    def _batch_sigs(self, kept: DataFrame) -> DataFrame:
        if self.minhash is None:
            # exact-only: text_hash is the whole signature
            return kept.select(
                self.id_col, F.md5(F.col(self.text_col)).alias("text_hash")
            )
        mh = self.minhash
        return dedup_signatures(
            kept,
            self.id_col,
            self.text_col,
            k=int(mh.get("k", 16)),
            bands=int(mh.get("bands", 4)),
            shingle_n=int(mh.get("shingle_n", 3)),
            # the 100 TB sh_set knob (bottom-k sketch; None = exact sets)
            # — see dedup_signatures. Must stay constant for a store's
            # lifetime: capped and uncapped sets don't compare.
            max_sh_set=mh.get("max_sh_set"),
        )

    def dedup_batch(self, fresh: DataFrame, epoch_id: int) -> DataFrame:
        """Dedup VERDICTS for one batch against the committed signature
        store — no store writes. Extra columns on ``fresh`` (beyond
        id/text) ride through untouched, so composed pipelines
        (``StreamingCuratorPipeline``) can quota on them afterwards.
        Split from ``process_batch`` so a composer can insert stages
        between the verdict and the commit; callers that drop further
        rows MUST commit the final survivor set via ``commit_batch`` so
        the stores only ever describe committed rows."""
        corpus_sigs = self._read_sigs(exclude_epoch=epoch_id)
        seen = (
            corpus_sigs.select("text_hash")
            if corpus_sigs is not None
            else self.spark.createDataFrame([], "text_hash string")
        )
        kept = incremental_exact_dedup(
            fresh, seen, self.id_col, self.text_col
        ).drop("text_hash")
        if self.minhash is not None:
            mh = self.minhash
            drop = incremental_minhash_drop_ids_sigs(
                corpus_sigs,
                self._batch_sigs(kept),
                self.id_col,
                threshold=float(mh.get("threshold", 0.5)),
                max_band_df=mh.get("max_band_df", MINHASH_MAX_BAND_DF),
                # must match the signature build above: truncated sets
                # switch the verify step to the union-bottom-k estimator
                max_sh_set=mh.get("max_sh_set"),
            )
            kept = kept.join(drop, self.id_col, "left_anti")
        return kept

    def commit_batch(self, kept: DataFrame, epoch_id: int) -> DataFrame:
        """Commit one batch's survivors to the text + signature stores.

        Per-epoch overwrite: a replayed epoch rewrites its own
        partition — the store stays exactly-once (see module docstring).
        Signatures are derived from the SAME ``kept`` (one dedup
        verdict, two projections), so the stores cannot disagree.
        Returns the materialized survivors."""
        kept = kept.localCheckpoint(eager=True)
        kept.write.mode("overwrite").parquet(
            os.path.join(self.store_dir, f"epoch={epoch_id}")
        )
        self._batch_sigs(kept).write.mode("overwrite").parquet(
            os.path.join(self.sig_dir, f"epoch={epoch_id}")
        )
        self._write_sig_format()
        return kept

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        fresh = batch.select(self.id_col, self.text_col)
        self.commit_batch(self.dedup_batch(fresh, epoch_id), epoch_id)

    def compact(self, target_partitions: int | None = None) -> int:
        """Fold every committed epoch partition of BOTH stores into one
        base layer (``epoch=-1``) each — the small-files maintenance
        op for a long-running ingest: thousands of triggers mean
        thousands of tiny parquet files on the per-trigger signature
        read path, and at 100 TB the file-listing alone would dominate
        the trigger. Returns the compacted doc count.

        ``target_partitions=None`` AUTO-SIZES the folded stores at
        ~250k rows per file: the per-trigger signature scan reads the
        compacted layer back, and folding a large store to one file
        serializes that scan to a couple of parquet-split tasks however
        many cores the cluster has (measured: the curator's 100x decade
        point spent most of its per-trigger growth re-reading a
        single-file 1.1 GB sig store). Pass an explicit int to override
        either way.

        Contract: run while the stream is STOPPED (the
        ``SigmaStreamPipeline.compact_store`` precedent). foreachBatch
        can only replay its last uncommitted epoch, and compaction must
        never fold an epoch that could still replay — pausing the query
        guarantees everything on disk is committed. ``epoch=-1`` never
        collides with a checkpoint epoch id, and the replay-safety
        ``epoch != current`` filter never excludes it.
        """
        n_docs = 0
        for store in (self.store_dir, self.sig_dir):
            df = self._read_or_none_any(store)
            if df is None:
                continue
            if store == self.sig_dir:
                # refuse to fold (and thereby re-stamp) a legacy or
                # foreign-format signature store: compacting one would
                # bless mod-P sh_set values as format 2 and silently
                # re-enable the admit-every-near-dup failure the marker
                # exists to prevent.
                self._check_sig_format()
            if target_partitions is None:
                # ceil: ~250k rows/file is an UPPER bound (floor div
                # yielded up to ~500k rows in the last pre-ceil file)
                parts = max(1, -(-df.count() // 250_000))
            else:
                parts = max(1, int(target_partitions))
            data = df.drop("epoch").repartition(parts)
            tmp = store.rstrip("/") + ".compact"
            data.write.mode("overwrite").parquet(os.path.join(tmp, "epoch=-1"))
            if store == self.store_dir:
                n_docs = self.spark.read.parquet(tmp).count()
            elif os.path.isdir(tmp):
                # stamp the marker INTO the tmp dir so the swap below is
                # atomic including the marker — a crash after the swap
                # can no longer leave a healthy store that the next read
                # rejects as unmarked.
                with open(os.path.join(tmp, "_FORMAT"), "w") as f:
                    f.write(str(SIG_STORE_FORMAT))
            # crash-safe swap: never a window where the store is absent
            # without a loud .old marker (storeutil.atomic_swap).
            atomic_swap(tmp, store)
        return n_docs

    def _read_or_none_any(self, path: str) -> DataFrame | None:
        try:
            return self.spark.read.parquet(path)
        except AnalysisException as e:
            if _is_empty_store_error(e):
                raise_if_half_swapped(path)
                return None
            raise

    def start(
        self,
        doc_stream: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int | None = None,
    ):
        writer = doc_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_seconds is None:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()

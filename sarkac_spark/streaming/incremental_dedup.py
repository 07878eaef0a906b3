"""Streaming ingest-time corpus dedup: each micro-batch is deduped
against the committed corpus store with the PROVEN batch operators
(``incremental_exact_dedup`` + ``incremental_minhash_drop_ids``), and
the survivors are committed — the foreachBatch twin of the Curator's
incremental dedup stage, and the missing near-dup member of the
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
its own half-committed rows.

PRECONDITION (inherited from ``dedup_minhash_incremental``): document
ids are unique across the stream — a replayed epoch re-presents the
same ids, which is exactly the case the epoch exclusion handles, but
two DIFFERENT documents must never share an id.

100 TB shape: per trigger, the batch is shingled once; the corpus is
re-read per trigger but only its shingle/band relation participates in
the join (at production scale, store the corpus's band keys + shingle
hashes as their own partitioned relation and skip re-shingling — the
operators already accept any relation of that shape; this module keeps
(id, text) for oracle-simplicity). The band-df cap bounds hot-band
fanout in the corpus dimension.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from sarkac_spark.operators.dedup import (
    MINHASH_MAX_BAND_DF,
    incremental_exact_dedup,
    incremental_minhash_drop_ids,
)


class IncrementalDedupPipeline:
    """``minhash=None`` runs exact-only dedup; a dict (``k``, ``bands``,
    ``threshold``, ``max_band_df``) adds near-dup dropping after the
    exact pass."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        minhash: dict | None = None,
    ) -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.id_col = id_col
        self.text_col = text_col
        self.minhash = minhash

    def _read_corpus(self, exclude_epoch: int) -> DataFrame | None:
        """Committed (id, text) rows, excluding ``exclude_epoch``'s
        partition (replay safety). None when the store is empty."""
        if not os.path.exists(self.store_dir):  # first epoch, quiet path
            return None
        try:
            corpus = self.spark.read.parquet(self.store_dir)
        except Exception:  # dir exists but no committed partitions yet
            return None
        return corpus.filter(F.col("epoch") != exclude_epoch).select(
            self.id_col, self.text_col
        )

    def committed(self) -> DataFrame:
        """The deduped corpus so far (id, text) — what a training job
        reads."""
        return self.spark.read.parquet(self.store_dir).select(
            self.id_col, self.text_col
        )

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        fresh = batch.select(self.id_col, self.text_col)
        corpus = self._read_corpus(exclude_epoch=epoch_id)
        seen = (
            corpus.select(F.md5(F.col(self.text_col)).alias("text_hash"))
            if corpus is not None
            else self.spark.createDataFrame([], "text_hash string")
        )
        kept = incremental_exact_dedup(
            fresh, seen, self.id_col, self.text_col
        ).drop("text_hash")
        if self.minhash is not None:
            mh = self.minhash
            base = [self.id_col, self.text_col]
            new_side = kept.select(*base).withColumn("__new", F.lit(True))
            combined = (
                corpus.select(*base)
                .withColumn("__new", F.lit(False))
                .unionByName(new_side)
                if corpus is not None
                else new_side
            )
            drop = incremental_minhash_drop_ids(
                combined,
                self.id_col,
                self.text_col,
                k=int(mh.get("k", 16)),
                bands=int(mh.get("bands", 4)),
                threshold=float(mh.get("threshold", 0.5)),
                max_band_df=mh.get("max_band_df", MINHASH_MAX_BAND_DF),
            )
            kept = kept.join(drop, self.id_col, "left_anti")
        # per-epoch overwrite: a replayed epoch rewrites its own
        # partition — the store stays exactly-once (see module docstring)
        kept.write.mode("overwrite").parquet(
            os.path.join(self.store_dir, f"epoch={epoch_id}")
        )

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

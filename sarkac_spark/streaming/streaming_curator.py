"""StreamingCuratorPipeline — ingest-time curation end-to-end: the
foreachBatch twin of ``Curator.apply()`` that curates documents AS THEY
ARRIVE instead of in one offline pass. Composes the proven streaming
members of each Curator stage, in the batch Curator's stage order:

1. **quality** — the REAL ``Curator._quality_stage`` closure (gopher /
   min_score / classifier gates), stateless, so batch and stream
   verdicts are the same code path by construction.
2. **dedup** — ``IncrementalDedupPipeline.dedup_batch``: exact +
   optional MinHash near-dup against the committed SIGNATURE store
   (per-trigger cost independent of corpus text size).
3. **domain_cap** — a stateful per-source quota on a RUNNING count:
   a domain that has already committed ``cap`` documents admits no
   more. This is the one semantic that MUST differ from the batch
   ``domain_cap`` (keep the cap BEST by quality): a stream cannot
   revoke documents it already committed. WITHIN a batch, admission
   follows the batch ranking — best ``quality_col`` first, ties to
   ascending id (replay-deterministic) — so batch and stream survivor
   sets coincide exactly whenever a domain's contenders arrive in one
   trigger; the residual divergence is cross-epoch arrivals only.
   Without a ``quality_col``, admission is pure arrival order
   (ascending id).

Per-epoch FUNNEL counters (epoch, stage, n_docs) are written alongside
the corpus, with the same stage names as ``Curator.report()`` /
``curation_funnel`` ("input", "quality", "dedup", "domain_cap") — the
summed stream funnel equals the batch report when the survivor sets
match.

Exactly-once under at-least-once replay: every store (text, signatures,
quota, funnel) follows the per-epoch-overwrite discipline, and every
read that feeds a VERDICT excludes the current epoch's partition — a
replayed batch recomputes identical verdicts and rewrites its own
partitions instead of double-counting (the
``IncrementalDedupPipeline`` / ``IvfMaintenancePipeline`` store
contract). Same PRECONDITION: document ids are unique across the
stream.

100 TB shape, per trigger: the quality gates are map-only; dedup scans
signature-sized corpus data (band-df-capped); the quota reads the
committed per-(epoch, domain) admission counts — one small row per
domain per epoch between compactions, NOT per document — and the
within-batch rank window is batch-sized, partitioned by domain. Four
driver actions per trigger (the funnel counts), each over a batch-sized
or smaller relation that is already materialized by the commit
checkpoint.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from sarkac_spark.streaming.incremental_dedup import (
    IncrementalDedupPipeline,
    _is_empty_store_error,
)
from sarkac_spark.streaming.storeutil import atomic_swap, raise_if_half_swapped

_ALLOWED_STAGES = {"quality", "dedup", "domain_cap"}


def apply_domain_quota(
    kept: DataFrame, prior: DataFrame | None, cfg: dict, id_col: str
) -> DataFrame:
    """The streaming domain-quota admission rule, shared by
    ``StreamingCuratorPipeline`` and ``stateful_ingest_dedup`` (one
    implementation so the two ingest engines cannot diverge).

    WITHIN a batch, best-quality first when ``quality_col`` is
    configured (ties to ascending id so replay stays deterministic),
    else pure ascending-id arrival order; admit while
    ``prior + rank <= cap``. ``prior`` is the per-domain running
    admission count (one small row per domain; None = empty store).
    The join is NULL-SAFE: null domains are one domain to the window
    AND the quota store, so the running count must match them too — a
    null-unsafe key would hand null-domain docs a fresh cap every
    batch."""
    domain_col = cfg.get("domain_col", "source")
    cap = int(cfg["cap"])
    order = [F.col(id_col).asc()]
    if cfg.get("quality_col") is not None:
        order.insert(0, F.col(cfg["quality_col"]).desc())
    w = Window.partitionBy(domain_col).orderBy(*order)
    ranked = kept.withColumn("__rn", F.row_number().over(w))
    if prior is not None:
        prior = prior.withColumnRenamed(domain_col, "__dom")
        ranked = ranked.join(
            prior, F.col(domain_col).eqNullSafe(F.col("__dom")), "left"
        ).drop("__dom")
    else:
        ranked = ranked.withColumn("__prior", F.lit(None).cast("long"))
    return ranked.filter(
        F.col("__rn") + F.coalesce(F.col("__prior"), F.lit(0)) <= cap
    ).drop("__rn", "__prior")


class StreamingCuratorPipeline:
    """``config`` takes the ``Curator`` config shape, restricted to the
    stages with a streaming member: ``quality`` (any Curator quality
    cfg), ``dedup`` (``{"minhash": {...}}`` adds near-dup dropping;
    exact dedup ALWAYS runs — even with no ``dedup`` key — because a
    streaming corpus store without exact dedup would commit
    byte-identical replays as new rows; the funnel therefore always
    carries a ``dedup`` row), and
    ``domain_cap`` (``{"domain_col": ..., "cap": N}``). Offline-only
    stages (decontaminate/winnow/sample/mixture/chunk/pack) raise: they
    either need a second full relation per trigger or reshape the
    output schema — run them as a batch pass over ``committed()``.

    Stores under ``store_dir`` (all plain partitioned parquet,
    epoch=N partitions): the committed corpus (full input schema), its
    dedup signatures (``store_dir + "_sigs"``), per-(epoch, domain)
    admission counts (``+ "_quota"``), and the per-epoch funnel
    (``+ "_funnel"``).

    ``engine`` selects the dedup substrate (the sigma facade's
    ``engine`` switch, applied to ingest curation):

    - ``"parquet"`` (default) — ``IncrementalDedupPipeline``: committed-
      corpus semantics, per-trigger column-pruned signature-store scan
      (O(store) residual, 1.56x across the measured 100x decade), the
      replay-auditable arm.
    - ``"stateful"`` — ``StatefulDedupPipeline``: seen-corpus semantics,
      keyed band state with point lookups (per-trigger wall FLAT, 0.83x
      across the same decade and absolutely faster at every point —
      BASELINE.md §stream-decade), the 100 TB deployment arm. Same
      quality closures, same ``apply_domain_quota`` admission rule, so
      the two engines can only diverge on the documented seen-vs-
      committed contract (near-dup chains + quota-rejected docs). The
      stateful engine owns its foreachBatch: drive it via ``start()``
      (``process_batch`` raises), and its funnel has no pre-quality
      row — its ``input`` stage counts post-quality docs (the parquet
      arm's ``quality`` row).
    - ``"tws"`` — ``TwsDedupPipeline``: the ``transformWithStateInPandas``
      twin of ``"stateful"`` (same stores/semantics/cores): no seed
      trigger (``backfill()`` stashes the curated corpus and the next
      ``start()`` onboards it as ``initialState`` during batch 0) and
      native value-TTL (availableNow drains legal in TTL mode). Needs
      the RocksDB provider + a ``google.protobuf`` runtime to RUN
      (``tws_available()``; ``start()`` raises with the remediation
      otherwise — see ``streaming/tws_ingest_dedup.py``).
    """

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        config: dict,
        id_col: str = "doc_id",
        text_col: str = "text",
        engine: str = "parquet",
    ) -> None:
        unknown = set(config) - _ALLOWED_STAGES
        if unknown:
            raise ValueError(
                f"no streaming member for curation stage(s) {sorted(unknown)}; "
                "run them as a batch pass over committed()"
            )
        if engine not in ("parquet", "stateful", "tws"):
            raise ValueError(
                f"unknown engine {engine!r}: expected 'parquet', 'stateful' "
                "or 'tws'"
            )
        self.spark = spark
        self.store_dir = store_dir
        self.quota_dir = store_dir.rstrip("/") + "_quota"
        self.funnel_dir = store_dir.rstrip("/") + "_funnel"
        self.config = config
        self.id_col = id_col
        self.text_col = text_col
        self.engine = engine
        dedup_cfg = config.get("dedup") or {}
        if engine in ("stateful", "tws"):
            if engine == "tws":
                # the transformWithStateInPandas twin: same stores and
                # semantics, initialState onboarding + native value-TTL;
                # needs a protobuf runtime to RUN (start() checks) —
                # see streaming/tws_ingest_dedup.py
                from sarkac_spark.streaming.tws_ingest_dedup import (
                    TwsDedupPipeline as _Engine,
                )
            else:
                from sarkac_spark.streaming.stateful_ingest_dedup import (
                    StatefulDedupPipeline as _Engine,
                )

            self._stateful = _Engine(
                spark,
                store_dir,
                id_col=id_col,
                text_col=text_col,
                minhash=dedup_cfg.get("minhash"),
                domain_cap=config.get("domain_cap"),
                state_ttl_seconds=dedup_cfg.get("state_ttl_seconds"),
            )
            self._dedup = None
        else:
            self._stateful = None
            self._dedup = IncrementalDedupPipeline(
                spark,
                store_dir,
                id_col=id_col,
                text_col=text_col,
                minhash=dedup_cfg.get("minhash"),
            )
        # tws onboarding stash (set by backfill, read by start; kept
        # across failed starts — see start()'s docstring)
        self._tws_initial_corpus: DataFrame | None = None
        if "quality" in config:
            # drive the REAL batch stage builder (the curation_funnel
            # precedent): stream and batch quality verdicts are one
            # code path, not a reimplementation.
            from sarkac_spark.curator import Curator

            self._quality_fn = Curator(
                spark, {"quality": config["quality"]}, id_col, text_col
            )._quality_stage(config["quality"])
        else:
            self._quality_fn = None

    # --- stores -------------------------------------------------------------

    def _read_or_none(self, path: str) -> DataFrame | None:
        try:
            return self.spark.read.parquet(path)
        except AnalysisException as e:
            if _is_empty_store_error(e):
                raise_if_half_swapped(path)
                return None
            raise

    def _base_layer_exists(self) -> bool:
        store = self._read_or_none(self.store_dir)
        return store is not None and not store.filter(
            F.col("epoch") == -1
        ).isEmpty()

    def _committed_batches(self, checkpoint_dir: str) -> int:
        """Number of COMMITTED streaming batches in a checkpoint (the
        numeric entries of ``commits/``), through the Hadoop FS API so
        it holds on HDFS/S3. 0 for a fresh checkpoint AND for a
        crashed-batch-0 retry (offsets written, nothing committed) —
        exactly the states where ``initialState`` is still consumable.
        Leftover ``.tmp`` files from a crashed commit rename are not
        numeric, so they don't count."""
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(
            os.path.join(checkpoint_dir, "commits")
        )
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            return 0
        return sum(
            1
            for st in fs.listStatus(hpath)
            if st.getPath().getName().isdigit()
        )

    def committed(self) -> DataFrame:
        """The curated corpus so far (full input schema)."""
        return self.spark.read.parquet(self.store_dir).drop("epoch")

    def funnel(self) -> DataFrame:
        """(epoch, stage, n_docs) — per-trigger curation funnel, stage
        names matching ``Curator.report()``."""
        return self.spark.read.parquet(self.funnel_dir)

    def _prior_quota(self, exclude_epoch: int) -> DataFrame | None:
        """Committed per-domain admission totals, excluding the current
        epoch's partition (replay safety — the quota twin of
        ``_read_sigs``)."""
        q = self._read_or_none(self.quota_dir)
        if q is None:
            return None
        domain_col = self.config["domain_cap"].get("domain_col", "source")
        return (
            q.filter(F.col("epoch") != exclude_epoch)
            .groupBy(domain_col)
            .agg(F.sum("n_admitted").alias("__prior"))
        )

    def _quota(self, kept: DataFrame, epoch_id: int) -> DataFrame:
        # the shared admission rule (see apply_domain_quota): within-
        # batch quality-then-id ranking against the committed running
        # counts, replay-safe because the prior read excludes this epoch
        return apply_domain_quota(
            kept,
            self._prior_quota(exclude_epoch=epoch_id),
            self.config["domain_cap"],
            self.id_col,
        )

    # --- the trigger --------------------------------------------------------

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        if self._stateful is not None:
            raise RuntimeError(
                f"engine={self.engine!r} owns its own stateful streaming "
                "query — drive it with start(); there is no per-batch "
                "entry point"
            )
        counts: list[tuple[str, int]] = [("input", batch.count())]
        d = batch
        if self._quality_fn is not None:
            # batch-sized eager checkpoint: the stage is evaluated once
            # for both its funnel count and the next stage's input
            d = self._quality_fn(d).localCheckpoint(eager=True)
            counts.append(("quality", d.count()))
        # dedup ALWAYS runs (exact at minimum; minhash when configured):
        # a streaming corpus store without exact dedup would commit
        # byte-identical replays as new rows — the class contract.
        d = self._dedup.dedup_batch(d, epoch_id).localCheckpoint(eager=True)
        counts.append(("dedup", d.count()))
        if "domain_cap" in self.config:
            d = self._quota(d, epoch_id)
        # commit_batch materializes the final survivors and writes the
        # text + signature stores (per-epoch overwrite)
        admitted = self._dedup.commit_batch(d, epoch_id)
        if "domain_cap" in self.config:
            counts.append(("domain_cap", admitted.count()))
            domain_col = self.config["domain_cap"].get("domain_col", "source")
            admitted.groupBy(domain_col).agg(
                F.count(F.lit(1)).alias("n_admitted")
            ).write.mode("overwrite").parquet(
                os.path.join(self.quota_dir, f"epoch={epoch_id}")
            )
        self.spark.createDataFrame(
            counts, "stage string, n_docs long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.funnel_dir, f"epoch={epoch_id}")
        )

    # --- lifecycle ----------------------------------------------------------

    def start(
        self,
        doc_stream: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int | None = None,
        initial_corpus: DataFrame | None = None,
    ):
        """``initial_corpus`` (tws engine only): the already-curated
        corpus to onboard as batch-0 ``initialState`` on a FRESH
        checkpoint — normally supplied implicitly by a preceding
        ``backfill()`` in the same process; pass ``committed()``
        explicitly when starting a fresh checkpoint over an existing
        base layer from a NEW process (the stash does not survive a
        restart, the parquet base layer does)."""
        if self._stateful is not None:
            # quality gates are stateless closures — apply them to the
            # stream before the stateful engine's DAG (its composition
            # contract); dedup + quota live inside the engine
            if self._quality_fn is not None:
                doc_stream = self._quality_fn(doc_stream)
            if self.engine == "tws":
                # NOT popped: a failed/retried start must not lose the
                # onboarding corpus (Spark consumes initialState only
                # on batch 0 of a fresh checkpoint). Explicit None
                # check — DataFrame truthiness is fragile (pandas-on-
                # Spark frames define __len__).
                stash = getattr(self, "_tws_initial_corpus", None)
                corpus = initial_corpus if initial_corpus is not None else stash
                committed = self._committed_batches(checkpoint_dir)
                if corpus is not None and committed > 0:
                    if (
                        initial_corpus is None
                        and getattr(self, "_tws_stash_checkpoint", None)
                        == checkpoint_dir
                    ):
                        # the stash was handed to THIS checkpoint's
                        # batch 0 and that batch committed — clean
                        # restart, nothing left to onboard
                        corpus = None
                    else:
                        raise ValueError(
                            "initial_corpus would be silently IGNORED: "
                            "Spark consumes transformWithState "
                            "initialState only on batch 0 of a fresh "
                            "checkpoint, and this checkpoint already "
                            f"has {committed} committed batch(es). The "
                            "onboarding docs would get no band state, "
                            "so their future duplicates would re-admit "
                            "and double-commit. Either keep streaming "
                            "on this checkpoint WITHOUT a backfill, or "
                            "rebuild on a FRESH checkpoint with "
                            "initial_corpus=committed()."
                        )
                if (
                    corpus is not None
                    and committed == 0
                    and initial_corpus is None
                ):
                    # record where batch 0 will consume the stash, so a
                    # later restart on the same checkpoint is recognized
                    # as already-onboarded instead of raising. Only when
                    # the STASH is what batch 0 consumes — an explicit
                    # initial_corpus must not mark a still-unconsumed
                    # stash as handled
                    self._tws_stash_checkpoint = checkpoint_dir
                if corpus is None and self._base_layer_exists():
                    from sarkac_spark.streaming.stateful_ingest_dedup import (
                        _fs_entry_count,
                    )

                    if _fs_entry_count(self.spark, checkpoint_dir) is None:
                        raise ValueError(
                            "store has an epoch=-1 base layer but this is "
                            "a FRESH checkpoint with no initial_corpus: "
                            "batch 0 would install no band state, so "
                            "replays of backfilled docs would re-admit "
                            "and double-commit. Pass "
                            "initial_corpus=pipe.committed() (the "
                            "backfill stash does not survive a process "
                            "restart)."
                        )
                return self._stateful.start(
                    doc_stream,
                    checkpoint_dir,
                    trigger_seconds,
                    initial_corpus=corpus,
                )
            return self._stateful.start(
                doc_stream, checkpoint_dir, trigger_seconds
            )
        writer = doc_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_seconds is None:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()

    def bootstrap_state(
        self, corpus_df: DataFrame, checkpoint_dir: str, source_dir: str
    ) -> int:
        """Bulk-onboard an existing (already-curated) corpus — keyed-
        state engines only; see ``StatefulDedupPipeline.bootstrap_state``
        (the tws engine raises with its initialState pointer)."""
        if self._stateful is None:
            raise RuntimeError(
                "bootstrap_state is the keyed-state engine's bulk onboard; "
                "the parquet engine seeds by committing the corpus as an "
                "epoch (process_batch) — its signature store IS its state"
            )
        return self._stateful.bootstrap_state(
            corpus_df, checkpoint_dir, source_dir
        )

    def backfill(
        self,
        corpus_df: DataFrame,
        checkpoint_dir: str | None = None,
        source_dir: str | None = None,
    ) -> int:
        """Bulk-load a large RAW corpus through the regime-appropriate
        path instead of streaming it through per-trigger ingest.
        BENCH_STREAM_TRANSPOSE measured the regime split: at 50k-doc
        bulk triggers the keyed-state engine pays 4.6x over the batch
        axis (floor-dominated) while the batch/parquet path amortizes
        at 1.25x — so a backfill must NOT go through ``start()`` on the
        stateful engine. Routing (both arms end with the stores in the
        exact state streaming expects, so ``start()`` on a fresh
        checkpoint continues incrementally):

        - ``parquet`` engine: ONE batch trigger — ``process_batch`` at
          ``epoch=-1`` (the ``compact()`` base-layer shape). The
          signature store written by that pass IS the engine's state.
        - ``stateful`` engine: batch-curate first (quality closure +
          the parquet arm's batch dedup verdicts against an empty
          store — the same within-batch rule both engines pin — + the
          shared quota rule at zero priors), then bulk-onboard the
          survivors via ``bootstrap_state`` (REQUIRES
          ``checkpoint_dir`` + ``source_dir``: band state lives in the
          streaming checkpoint). The epoch=-1 funnel records the
          ONBOARDED count per stage (the ``bootstrap_state``
          convention), not the raw-input funnel.

        Returns the number of docs committed by the backfill."""
        if self.engine != "stateful" and self._base_layer_exists():
            # the stateful arm is guarded by bootstrap_state's
            # fresh-checkpoint check; parquet and tws must refuse here
            # or the overwrite silently drops the first corpus
            raise ValueError(
                "store already has an epoch=-1 base layer (a prior "
                "backfill or compact()) — a second backfill would "
                "overwrite it; stream the new corpus instead (it dedups "
                "against the existing state), or backfill into a fresh "
                "store"
            )
        if self._stateful is None:
            self.process_batch(corpus_df, -1)
            store = self._read_or_none(self.store_dir)
            return (
                0 if store is None
                else store.filter(F.col("epoch") == -1).count()
            )
        if self.engine == "stateful" and (
            checkpoint_dir is None or source_dir is None
        ):
            raise ValueError(
                "stateful-engine backfill onboards band state into the "
                "streaming checkpoint: pass checkpoint_dir (fresh) and "
                "source_dir (empty) — see "
                "StatefulDedupPipeline.bootstrap_state"
            )
        d = corpus_df
        if self._quality_fn is not None:
            d = self._quality_fn(d)
        # batch dedup with the engines' shared within-batch verdict
        # rule: a scratch IncrementalDedupPipeline has no prior store,
        # so dedup_batch is a pure within-corpus pass (nothing is ever
        # written under the scratch dir)
        import shutil
        import tempfile

        scratch_dir = tempfile.mkdtemp(prefix="backfill_scratch_")
        try:
            scratch = IncrementalDedupPipeline(
                self.spark,
                scratch_dir,
                id_col=self.id_col,
                text_col=self.text_col,
                minhash=(self.config.get("dedup") or {}).get("minhash"),
            )
            d = scratch.dedup_batch(d, epoch_id=-1)
            if "domain_cap" in self.config:
                d = apply_domain_quota(
                    d, None, self.config["domain_cap"], self.id_col
                )
            if self.engine == "tws":
                # no seed trigger at all: write the base stores now,
                # stash the survivors — the next start() hands them to
                # the operator as initialState (batch-0 onboarding)
                d = d.localCheckpoint(eager=True)
                n = self._stateful.onboard_base_layer(d)
                self._tws_initial_corpus = d
                # a NEW stash is unconsumed by definition: forget any
                # already-onboarded marker from a prior backfill, or
                # start() on that checkpoint would take the clean-restart
                # branch and silently drop THIS stash (the exact
                # silent-ignore its guard exists to make loud)
                self._tws_stash_checkpoint = None
                return n
            return self._stateful.bootstrap_state(
                d, checkpoint_dir, source_dir
            )
        finally:
            # nothing is ever written under the scratch dir, but the
            # mkdtemp itself must not leak one dir per backfill call
            shutil.rmtree(scratch_dir, ignore_errors=True)

    def compact(self, target_partitions: int | None = None) -> int:
        """Fold every committed epoch of all four stores into one base
        partition each (``epoch=-1``; the ``IncrementalDedupPipeline``
        contract — run while the stream is STOPPED). Quota rows fold to
        one summed row per domain; funnel rows fold to one summed row
        per stage. Swaps are crash-safe (``storeutil.atomic_swap``).
        Returns the compacted doc count."""
        if self._stateful is not None:
            # the keyed-state engines fold their own text/quota/funnel
            # stores (band state needs no compaction — the checkpoint
            # maintains it)
            return self._stateful.compact(target_partitions)
        n_docs = self._dedup.compact(target_partitions)
        q = self._read_or_none(self.quota_dir)
        if q is not None:
            # fold by the store's OWN domain column (everything that
            # isn't the count or the epoch partition) — a quota store
            # left over from an earlier configuration must compact
            # cleanly even if domain_cap was since removed from config.
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

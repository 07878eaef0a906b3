"""Curator — the config-driven front door for the corpus-curation
suite, the ergonomic counterpart of the ``Sarkac`` facade (sarkac.py)
for the beyond-reference training-data workload.

A curation run is a declared sequence of the existing operators; the
facade only composes DataFrame transformations, so the whole pass stays
ONE lazy Spark plan that Catalyst optimizes end-to-end — stages are not
materialized between steps, and ``report()`` (per-stage counts) is the
only action. Config shape (every key optional, applied in this order —
cheap map-only gates before shuffling stages):

    Curator(spark, {
        "quality":    {"gopher": True,         # Rae et al. rule gates
                       "min_score": 0.5,       # quality_score cutoff
                       "classifier": True},    # distilled-classifier gate
                       # classifier: True uses the shipped weights; a
                       # dict passes weights_milli/bias_milli/
                       # threshold_nano through (e.g. from
                       # fit_quality_lr) — map-only either way
        "decontaminate": {"min_shared": 1},    # drop eval-overlap docs
        "dedup":      {"exact": True,          # md5 canonicalization
                       "minhash": {"k": 16, "bands": 4, "threshold": 0.5,
                                   "max_band_df": 1024}},  # near-dup drop
                                   # max_band_df: hot-band fanout cap
                                   # (defaults to MINHASH_MAX_BAND_DF;
                                   # None disables for tiny corpora)
        "winnow":     {"min_shared": 2},       # local-overlap drop
        "domain_cap": {"domain_col": "source", "cap": 1000,
                       "quality_col": "n_chars"},
        "sample":     {"temperature": 0.5,     # p_l ∝ count^alpha
                       "stratum_col": "lang"},
        "mixture":    {"targets": {"en": 0.5, ...},  # explicit spec —
                       "stratum_col": "lang"},  # realized via apply_mixture
                       # (adds epoch_copy; repeats docs where epochs > 1)
        "chunk":      {"chunk_words": 40, "overlap": 8},
        "pack":       {"budget": 2048},        # sequence packing plan
    })

    Config keys above are listed in APPLICATION order (dict order in the
    config does not matter — ``stages()`` fixes the order).

``apply(df)`` returns the curated DataFrame (same columns as the
input unless ``chunk``/``pack`` reshape the output — see below);
``report(df)`` runs the plan once per stage boundary and returns the
row-count funnel — the audit a pipeline operator actually wants before
committing a 100 TB pass. Stages that need a second relation take it
as an ``apply``/``report`` keyword (configuring the stage without it
raises):

- ``decontaminate`` needs the benchmark/eval corpus: ``eval_df=``.
- ``dedup: {"incremental": True, ...}`` treats ``df`` as a NEW ingest
  batch deduped against the already-committed corpus: ``corpus_df=``
  (same id/text columns). Exact mode anti-joins the corpus's md5
  digests (``incremental_exact_dedup``); minhash mode bands only the
  batch side against the corpus (``dedup_minhash_incremental``) —
  per-ingest cost scales with the batch, not the corpus. Committed
  corpus rows are never dropped; a batch row loses to any corpus
  near-dup and to lower-id batch mates. PRECONDITION: batch and corpus
  ids are disjoint — a shared id merges the two documents' shingle sets
  in the groupBy and duplicates the ``__new`` flag join rows, silently
  corrupting pair flags and drop decisions. ``report()`` enforces this
  loudly (one semi-join count); ``apply()`` stays lazy and trusts it.

Output-shaping stages (always last; they CHANGE the schema):

- ``mixture`` realizes a target-mixture spec via ``apply_mixture`` —
  appends ``epoch_copy`` and REPEATS rows where the plan's epochs
  exceed 1 (the repetition schedule a dataloader consumes; the ONE
  stage whose output can be larger than its input, by design).
- ``chunk`` splits each doc into fixed word-budget chunks — output
  rows are (id_col, chunk_id, chunk_uid, chunk_text, n_words).
- ``pack`` appends a sequence-packing plan (pack_group, seq_id,
  seq_pos) over whatever rows reach it (chunks if ``chunk`` ran,
  else docs with a BPE-ish token count).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from sarkac_spark.operators.dedup import MINHASH_MAX_BAND_DF


class Curator:
    def __init__(
        self,
        spark: SparkSession,
        config: dict,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        unknown = set(config) - {
            "dedup", "quality", "domain_cap", "sample", "decontaminate",
            "winnow", "mixture", "chunk", "pack",
        }
        if unknown:
            raise ValueError(f"unknown curation stages: {sorted(unknown)}")
        self.spark = spark
        self.config = config
        self.id_col = id_col
        self.text_col = text_col

    # each stage: name -> transformation (pure, lazy)
    def stages(
        self,
        eval_df: DataFrame | None = None,
        corpus_df: DataFrame | None = None,
    ) -> list[tuple[str, Callable[[DataFrame], DataFrame]]]:
        out: list[tuple[str, Callable[[DataFrame], DataFrame]]] = []
        c = self.config
        if "quality" in c:
            out.append(("quality", self._quality_stage(c["quality"])))
        if "decontaminate" in c:
            if eval_df is None:
                raise ValueError(
                    "decontaminate stage configured but no eval_df passed"
                )
            out.append(
                ("decontaminate", self._decontaminate_stage(c["decontaminate"], eval_df))
            )
        if "dedup" in c:
            if c["dedup"].get("incremental"):
                if corpus_df is None:
                    raise ValueError(
                        "incremental dedup configured but no corpus_df passed"
                    )
                out.append(
                    ("dedup", self._incremental_dedup_stage(c["dedup"], corpus_df))
                )
            else:
                out.append(("dedup", self._dedup_stage(c["dedup"])))
        if "winnow" in c:
            out.append(("winnow", self._winnow_stage(c["winnow"])))
        if "domain_cap" in c:
            out.append(("domain_cap", self._domain_cap_stage(c["domain_cap"])))
        if "sample" in c:
            out.append(("sample", self._sample_stage(c["sample"])))
        if "mixture" in c:
            out.append(("mixture", self._mixture_stage(c["mixture"])))
        if "chunk" in c:
            out.append(("chunk", self._chunk_stage(c["chunk"])))
        if "pack" in c:
            out.append(("pack", self._pack_stage(c["pack"])))
        return out

    def apply(
        self,
        df: DataFrame,
        eval_df: DataFrame | None = None,
        corpus_df: DataFrame | None = None,
    ) -> DataFrame:
        for _, fn in self.stages(eval_df, corpus_df):
            df = fn(df)
        return df

    def report(
        self,
        df: DataFrame,
        eval_df: DataFrame | None = None,
        corpus_df: DataFrame | None = None,
    ) -> dict[str, int]:
        """Row-count funnel: input plus count after every stage.

        When incremental dedup is configured, first enforces the
        batch/corpus id-disjointness precondition (one semi-join count)
        so a colliding ingest fails loudly instead of silently
        corrupting pair flags downstream."""
        if corpus_df is not None and (self.config.get("dedup") or {}).get(
            "incremental"
        ):
            n_shared = df.select(self.id_col).join(
                corpus_df.select(self.id_col), self.id_col, "semi"
            ).count()
            if n_shared:
                raise ValueError(
                    f"incremental dedup precondition violated: {n_shared} "
                    f"batch {self.id_col} value(s) already exist in corpus_df "
                    "(batch and corpus ids must be disjoint)"
                )
        counts = {"input": df.count()}
        for name, fn in self.stages(eval_df, corpus_df):
            df = fn(df)
            counts[name] = df.count()
        return counts

    # --- stage builders ---------------------------------------------------

    def _quality_stage(self, cfg: dict):
        def fn(df: DataFrame) -> DataFrame:
            # restore the caller's schema after EACH sub-gate: every gate
            # appends its own feature columns, and the next gate must see
            # the caller's columns, not a predecessor's features —
            # quality_gate's collision guard fails loudly otherwise
            # (gopher_rules and quality_gate both compute an n_words)
            cols = df.columns
            if cfg.get("gopher"):
                from sarkac_spark.operators.text import gopher_rules

                df = gopher_rules(df, self.text_col).filter(
                    F.col("passes") == 1
                ).select(*cols)
            min_score = cfg.get("min_score")
            if min_score is not None:
                from sarkac_spark.operators.text import quality_score

                df = quality_score(df, self.text_col).filter(
                    F.col("quality_score") >= float(min_score)
                ).select(*cols)
            clf = cfg.get("classifier")
            if clf:
                from sarkac_spark.operators.classify import quality_gate

                kw = clf if isinstance(clf, dict) else {}
                df = quality_gate(df, self.id_col, self.text_col, **kw).filter(
                    F.col("keep")
                )
            return df.select(*cols)

        return fn

    def _decontaminate_stage(self, cfg: dict, eval_df: DataFrame):
        def fn(df: DataFrame) -> DataFrame:
            from sarkac_spark.operators.dedup import cross_contamination

            contaminated = cross_contamination(
                df,
                eval_df,
                self.id_col,
                self.text_col,
                min_shared=int(cfg.get("min_shared", 1)),
            ).select(F.col("train_id").alias(self.id_col)).distinct()
            return df.join(contaminated, self.id_col, "left_anti")

        return fn

    def _dedup_stage(self, cfg: dict):
        def fn(df: DataFrame) -> DataFrame:
            cols = df.columns
            if cfg.get("exact"):
                from pyspark.sql.window import Window

                # keep min(id) per text digest, as ONE window over the
                # digest — result-identical to the former
                # dedup_exact-agg + semi-join-back shape but with a
                # single corpus exchange instead of two plus a join
                # (r13; guide §2.4 "remove shuffles outright"): the
                # semi join re-shuffled the full-width corpus by id
                # AFTER the digest agg had already shuffled it by hash.
                w = Window.partitionBy(
                    F.md5(F.col(self.text_col))
                ).orderBy(F.col(self.id_col))
                df = (
                    df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            mh = cfg.get("minhash")
            if mh:
                from sarkac_spark.operators.dedup import dedup_minhash

                pairs = dedup_minhash(
                    df,
                    self.id_col,
                    self.text_col,
                    k=int(mh.get("k", 16)),
                    bands=int(mh.get("bands", 4)),
                    threshold=float(mh.get("threshold", 0.5)),
                    max_band_df=mh.get("max_band_df", MINHASH_MAX_BAND_DF),
                )
                # keep-lowest-id: drop every id that appears as the
                # larger side of a near-dup pair
                drop = pairs.select(F.col("id_b").alias(self.id_col)).distinct()
                df = df.join(drop, self.id_col, "left_anti")
            return df.select(*cols)

        return fn

    def _incremental_dedup_stage(self, cfg: dict, corpus_df: DataFrame):
        def fn(df: DataFrame) -> DataFrame:
            cols = df.columns
            if cfg.get("exact", True):
                from sarkac_spark.operators.dedup import incremental_exact_dedup

                seen = corpus_df.select(
                    F.md5(F.col(self.text_col)).alias("text_hash")
                )
                df = incremental_exact_dedup(
                    df, seen, self.id_col, self.text_col
                ).select(*cols)
            mh = cfg.get("minhash")
            if mh:
                # committed corpus rows never lose: a batch row is dropped
                # when it pairs with a corpus row (either side of the
                # ordered pair) or with a LOWER-id batch mate (id_b side)
                from sarkac_spark.operators.dedup import (
                    incremental_minhash_drop_ids,
                )

                base = [self.id_col, self.text_col]
                combined = (
                    corpus_df.select(*base).withColumn("__new", F.lit(False))
                ).unionByName(
                    df.select(*base).withColumn("__new", F.lit(True))
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
                df = df.join(drop, self.id_col, "left_anti")
            return df.select(*cols)

        return fn

    def _winnow_stage(self, cfg: dict):
        def fn(df: DataFrame) -> DataFrame:
            from sarkac_spark.operators.dedup import winnow_pairs

            pairs = winnow_pairs(
                df,
                self.id_col,
                self.text_col,
                k=int(cfg.get("k", 3)),
                w=int(cfg.get("w", 4)),
                min_shared=int(cfg.get("min_shared", 2)),
                max_df=cfg.get("max_df", 256),
            )
            # keep-lowest-id: drop the larger side of each overlap pair
            drop = pairs.select(F.col("id_b").alias(self.id_col)).distinct()
            return df.join(drop, self.id_col, "left_anti")

        return fn

    def _chunk_stage(self, cfg: dict):
        def fn(df: DataFrame) -> DataFrame:
            from sarkac_spark.operators.text import chunk_documents

            chunks = chunk_documents(
                df,
                self.id_col,
                self.text_col,
                chunk_words=int(cfg.get("chunk_words", 40)),
                overlap=int(cfg.get("overlap", 8)),
            )
            return chunks.withColumn(
                "chunk_uid",
                F.concat_ws("#", F.col(self.id_col).cast("string"), "chunk_id"),
            )

        return fn

    def _pack_stage(self, cfg: dict):
        def fn(df: DataFrame) -> DataFrame:
            from sarkac_spark.operators.sampling import pack_sequences

            if "chunk_uid" in df.columns:  # packing chunk rows
                id_col, tokens = "chunk_uid", F.col("n_words")
            else:
                from sarkac_spark.operators.text import bpe_ish_token_count

                id_col, tokens = self.id_col, bpe_ish_token_count(self.text_col)
            return pack_sequences(
                df,
                id_col,
                tokens,
                budget=int(cfg.get("budget", 2048)),
                n_groups=int(cfg.get("n_groups", 64)),
            )

        return fn

    def _domain_cap_stage(self, cfg: dict):
        def fn(df: DataFrame) -> DataFrame:
            from sarkac_spark.operators.sampling import domain_cap

            cols = df.columns
            return domain_cap(
                df,
                cfg.get("domain_col", "source"),
                int(cfg["cap"]),
                cfg.get("quality_col", "n_chars"),
                self.id_col,
            ).select(*cols)

        return fn

    def _mixture_stage(self, cfg: dict):
        def fn(df: DataFrame) -> DataFrame:
            from sarkac_spark.operators.sampling import apply_mixture

            return apply_mixture(
                df,
                self.id_col,
                cfg.get("stratum_col", "lang"),
                dict(cfg["targets"]),
                weight_col=cfg.get("weight_col"),
                budget=cfg.get("budget"),
            )

        return fn

    def _sample_stage(self, cfg: dict):
        def fn(df: DataFrame) -> DataFrame:
            from sarkac_spark.operators.sampling import temperature_sample

            return temperature_sample(
                df,
                self.id_col,
                cfg.get("stratum_col", "lang"),
                alpha=float(cfg.get("temperature", 0.5)),
                budget=cfg.get("budget"),
            )

        return fn

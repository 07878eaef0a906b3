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
        "dedup":      {"exact": True,          # md5 canonicalization
                       "minhash": {"k": 16, "bands": 4,
                                   "threshold": 0.5}},  # near-dup drop
        "quality":    {"gopher": True,         # Rae et al. rule gates
                       "min_score": 0.5},      # quality_score cutoff
        "domain_cap": {"domain_col": "source", "cap": 1000,
                       "quality_col": "n_chars"},
        "sample":     {"temperature": 0.5,     # p_l ∝ count^alpha
                       "stratum_col": "lang"},
        "decontaminate": {"min_shared": 1},    # drop eval-overlap docs
    })

``apply(df)`` returns the curated DataFrame (same columns as the
input); ``report(df)`` runs the plan once per stage boundary and
returns the row-count funnel — the audit a pipeline operator actually
wants before committing a 100 TB pass. The ``decontaminate`` stage
needs the benchmark/eval corpus: pass ``eval_df=`` to ``apply``/
``report`` (configuring the stage without it raises).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


class Curator:
    def __init__(
        self,
        spark: SparkSession,
        config: dict,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        unknown = set(config) - {
            "dedup", "quality", "domain_cap", "sample", "decontaminate"
        }
        if unknown:
            raise ValueError(f"unknown curation stages: {sorted(unknown)}")
        self.spark = spark
        self.config = config
        self.id_col = id_col
        self.text_col = text_col

    # each stage: name -> transformation (pure, lazy)
    def stages(
        self, eval_df: DataFrame | None = None
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
            out.append(("dedup", self._dedup_stage(c["dedup"])))
        if "domain_cap" in c:
            out.append(("domain_cap", self._domain_cap_stage(c["domain_cap"])))
        if "sample" in c:
            out.append(("sample", self._sample_stage(c["sample"])))
        return out

    def apply(self, df: DataFrame, eval_df: DataFrame | None = None) -> DataFrame:
        for _, fn in self.stages(eval_df):
            df = fn(df)
        return df

    def report(
        self, df: DataFrame, eval_df: DataFrame | None = None
    ) -> dict[str, int]:
        """Row-count funnel: input plus count after every stage."""
        counts = {"input": df.count()}
        for name, fn in self.stages(eval_df):
            df = fn(df)
            counts[name] = df.count()
        return counts

    # --- stage builders ---------------------------------------------------

    def _quality_stage(self, cfg: dict):
        def fn(df: DataFrame) -> DataFrame:
            cols = df.columns
            if cfg.get("gopher"):
                from sarkac_spark.operators.text import gopher_rules

                df = gopher_rules(df, self.text_col).filter(F.col("passes") == 1)
            min_score = cfg.get("min_score")
            if min_score is not None:
                from sarkac_spark.operators.text import quality_score

                df = quality_score(df, self.text_col).filter(
                    F.col("quality_score") >= float(min_score)
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
                from sarkac_spark.operators.dedup import dedup_exact

                canon = dedup_exact(df, self.id_col, self.text_col).select(
                    F.col("canonical_id").alias(self.id_col)
                )
                df = df.join(canon, self.id_col, "semi")
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
                )
                # keep-lowest-id: drop every id that appears as the
                # larger side of a near-dup pair
                drop = pairs.select(F.col("id_b").alias(self.id_col)).distinct()
                df = df.join(drop, self.id_col, "left_anti")
            return df.select(*cols)

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

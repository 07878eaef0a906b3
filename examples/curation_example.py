"""Training-data curation example — the beyond-reference pipeline this
engine adds on top of the sarkac anomaly workload: exact dedup, quality
gating (Gopher rules), semantic dedup over embeddings (SemDeDup-style),
distribution-drift audit per source, and a per-language token budget.

Run: python examples/curation_example.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from sarkac_spark.operators.dedup import dedup_exact
from sarkac_spark.operators.similarity import semantic_dedup
from sarkac_spark.operators.text import (
    bpe_ish_token_count,
    gopher_rules,
    unigram_kl,
)
from sarkac_spark.session import get_spark
from sarkac_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation_example")
    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")

    # 1. exact dedup: keep each text's canonical (lowest-id) copy
    canon = dedup_exact(docs, "doc_id", "text").select(
        F.col("canonical_id").alias("doc_id")
    )
    docs1 = docs.join(canon, "doc_id", "left_semi")

    # 2. quality gate: Gopher rules, keep passing docs
    gated = gopher_rules(docs1).filter(F.col("passes") == 1)

    # 3. semantic dedup over the embedding table (vec_id aligns with
    #    doc_id in the synthetic fixture); keep semantically-unique ids
    kept_vecs = semantic_dedup(embs, n_bits=4, tau=0.3).filter(
        F.col("kept") == 1
    ).select(F.col("vec_id").alias("doc_id"))
    curated = gated.join(kept_vecs, "doc_id", "left_semi")

    # 4. drift audit: which sources diverge from the corpus mixture?
    drift = unigram_kl(docs1, "source", "text").orderBy(
        F.col("kl_divergence").desc()
    )

    # 5. per-language training budget over the curated set
    budget = (
        docs.join(curated.select("doc_id"), "doc_id", "left_semi")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(bpe_ish_token_count("text")).alias("bpe_tokens"),
        )
        .orderBy("lang")
    )

    print(f"input docs:        {docs.count()}")
    print(f"after exact dedup: {docs1.count()}")
    print(f"after quality gate:{gated.count()}")
    print(f"after semantic dd: {curated.count()}")
    print("\ntop drift sources:")
    for r in drift.limit(3).collect():
        print(f"  {r['source']}: KL={r['kl_divergence']}")
    print("\nper-language budget:")
    for r in budget.collect():
        print(f"  {r['lang']}: {r['n_docs']} docs, {r['bpe_tokens']} bpe tokens")

    # 6. the same composition via the config-driven facade: one lazy
    #    plan, with the per-stage funnel report
    from sarkac_spark.curator import Curator

    funnel = Curator(
        spark,
        {
            "quality": {"gopher": True},
            "dedup": {"exact": True},
            "winnow": {"min_shared": 2},
            "domain_cap": {"domain_col": "source", "cap": 20,
                           "quality_col": "n_chars"},
            "chunk": {"chunk_words": 40, "overlap": 8},
            "pack": {"budget": 64, "n_groups": 4},
        },
    ).report(docs)
    print("\nCurator funnel:", funnel)
    spark.stop()


if __name__ == "__main__":
    main()

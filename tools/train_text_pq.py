"""Regenerate operators/pq.py::TEXT_PQ_CODEBOOKS — the literal PQ
codebooks behind the raw-text retrieval path (text_ivfpq): per-subspace
KMeans fit on hash_embed vectors of the sf0.01 documents corpus.

Usage: python tools/train_text_pq.py [sf_dir]
Prints the Python literal to paste into operators/pq.py.
"""

import sys

sys.path.insert(0, ".")

from sarkac_spark.operators.pq import fit_pq_codebooks  # noqa: E402
from sarkac_spark.operators.text import hash_embed  # noqa: E402
from sarkac_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("train-text-pq", shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = hash_embed(docs, "doc_id", "text", dim=64)
    cb = fit_pq_codebooks(emb, vec_col="embedding", seed=7, max_iter=20)
    print("TEXT_PQ_CODEBOOKS = [")
    for book in cb:
        print("    [")
        for c in book:
            print(f"        {c},")
        print("    ],")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()

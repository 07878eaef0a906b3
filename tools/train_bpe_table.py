"""Regenerate operators/bpe.py::BPE_MERGES — the shipped literal merge
table behind the oracle-checked `bpe_apply` scoring path (the
PQ_CODEBOOKS precedent: fit once, ship the artifact, score relationally).

Usage: python tools/train_bpe_table.py [sf_dir] [n_merges]
Prints the Python literal to paste into operators/bpe.py.
"""

import sys

from pyspark.sql import SparkSession

sys.path.insert(0, ".")

from sarkac_spark.operators.bpe import train_bpe  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("train-bpe-table")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=n_merges)
    print("BPE_MERGES = [")
    for i in range(0, len(merges), 4):
        row = ", ".join(repr(m) for m in merges[i : i + 4])
        print(f"    {row},")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()

"""Byte-pair-encoding tokenizer plumbing: TRAIN a merge table on the
corpus, APPLY it for per-document token counts — the "how many training
tokens does this corpus actually hold under my tokenizer" question that
``bpe_ish_token_count`` (a length heuristic) and ``bpe_merge_pairs``
(the first-iteration audit) only approximate.

Scale contract (the part that matters at 100 TB):

- Training collapses the corpus to its (word, count) VOCABULARY first —
  one map-side-combined shuffle — and caps it at ``max_vocab`` top
  words (TakeOrdered, never a global sort). The classic merge loop
  (Sennrich et al. 2016) then runs DRIVER-SIDE over that bounded
  relation: BPE training is inherently sequential in the merge order,
  and |vocab| (Heaps: ~sqrt(corpus)) is driver-sized at any corpus
  scale the way a 100-TB corpus's distinct-word head still is. The
  collect is bounded by construction — the same documented-collect
  contract as discovery sampling in ``sarkac.py``.

- Encoding never touches Python per occurrence: merges apply once per
  DISTINCT word (an Arrow-batched pandas UDF over the vocab-sized
  relation — ArrowEvalPython, the designed escape hatch, never
  row-at-a-time BatchEvalPython), and per-doc counts come from an
  occurrence explode joined to that vocab dim. Corpus-sized work is
  JVM-side explode+join+agg only.

Iterative training has no closed-form SQL, so like the MLlib family the
queries are rows-only checked by the driver; the deterministic
guarantees live in ``tests/test_bpe.py`` (known-corpus merge order,
encode identities, count bounds).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType

from sarkac_spark.operators.dedup import words_col


def word_counts(
    df: DataFrame, text_col: str = "text", max_vocab: int = 100_000
) -> DataFrame:
    """(word, cnt) for the ``max_vocab`` most frequent words (count desc,
    word asc tie-break — deterministic cut). One map-side-combined
    shuffle + TakeOrdered."""
    words = df.select(F.explode(words_col(text_col)).alias("word"))
    wc = words.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return wc.orderBy(F.col("cnt").desc(), F.col("word")).limit(max_vocab)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_vocab: int = 100_000,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge list — a plain, serializable artifact (ship it with the
    dataset the way a tokenizer.json ships with a model).

    Words are character sequences with an ``end_of_word`` sentinel (the
    Sennrich formulation, so suffix merges like "e+s·" stay distinct
    from mid-word "e+s"). Ties break lexicographically — training is
    deterministic for a given corpus and cap.
    """
    vocab = {r.word: r.cnt for r in word_counts(df, text_col, max_vocab).collect()}
    seqs: dict[tuple[str, ...], int] = {}
    for w, c in vocab.items():
        seqs[tuple(list(w) + [end_of_word])] = seqs.get(
            tuple(list(w) + [end_of_word]), 0
        ) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for seq, c in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest pair
        pair, count = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if count < 2:
            break  # nothing left that repeats — further merges are noise
        merged = pair[0] + pair[1]
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, c in seqs.items():
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == pair[0] and seq[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            new_seqs[key] = new_seqs.get(key, 0) + c
        seqs = new_seqs
        merges.append(pair)
    return merges


def _encode_word(word: str, merges: list[tuple[str, str]], end_of_word: str) -> int:
    seq = list(word) + [end_of_word]
    for a, b in merges:
        if len(seq) < 2:
            break
        out = []
        i = 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return len(seq)


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    end_of_word: str = "</w>",
    token_col: str = "bpe_tokens",
) -> DataFrame:
    """Per-document token count under the learned ``merges``.

    Plan shape: occurrences explode JVM-side → (doc, word, n) collapse →
    the merge loop runs ONCE PER DISTINCT WORD inside an Arrow-batched
    pandas UDF over the vocab-sized dim → join the dim back and sum.
    Python work is |vocab| x |merges|, independent of corpus row count;
    the corpus-sized stages are explode, two grouped aggs, and one
    equi-join on the word key.
    """
    from pyspark.sql.functions import pandas_udf

    merges_local = [tuple(m) for m in merges]
    eow = end_of_word

    @pandas_udf(IntegerType())
    def n_tokens(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _encode_word(w, merges_local, eow)).astype(
            "int32"
        )

    occ = df.select(F.col(id_col), F.explode(words_col(text_col)).alias("word"))
    per_doc_word = occ.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("__n")
    )
    vocab_dim = per_doc_word.select("word").distinct().withColumn(
        "__tok", n_tokens(F.col("word"))
    )
    return (
        per_doc_word.join(vocab_dim, "word")
        .groupBy(id_col)
        .agg(F.sum(F.col("__n") * F.col("__tok")).cast("long").alias(token_col))
    )

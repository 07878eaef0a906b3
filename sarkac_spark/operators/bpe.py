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
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import IntegerType

from sarkac_spark.operators.dedup import words_col

# train_bpe(documents @ sf0.01, n_merges=32) — the shipped literal merge
# table (the PQ_CODEBOOKS / KMEANS_SCORING_CENTERS precedent): training
# is iterative and rows-only checked, but SCORING against a fixed
# artifact is pure relational work, so `bpe_apply` is oracle-checked
# bit-for-bit against DuckDB. Regenerate with tools/train_bpe_table.py.
BPE_MERGES = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
    ("a", "</w>"), ("g", "</w>"), ("y", "</w>"), ("a", "r"),
    ("p", "ar"), ("t", "</w>"), ("i", "n</w>"), ("j", "o"),
    ("jo", "in</w>"), ("a", "s"), ("as", "h</w>"), ("h", "ash</w>"),
    ("r", "ow</w>"), ("at", "c"), ("atc", "h</w>"), ("b", "atch</w>"),
    ("a", "n</w>"), ("c", "an</w>"), ("s", "can</w>"), ("c", "o"),
]


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


def merge_chain_col(
    word_col: Column,
    merges: list[tuple[str, str]],
    end_of_word: str = "</w>",
    passes: int = 2,
) -> Column:
    """Token count of a word under ``merges`` as a PURE JVM expression —
    no Python anywhere, and the exact same chain replays in DuckDB, so
    the oracle gate holds on any corpus by construction.

    Encoding model ("relational BPE apply"): the token sequence is a
    space-delimited string with a leading/trailing space (words come
    from whitespace split, so tokens never contain spaces), and each
    merge (a, b) is ``replace(s, ' a b ', ' ab ')`` applied ``passes``
    times. One replace pass is a left-to-right non-overlapping scan —
    exactly the classic greedy pass — except that replacing consumes
    the shared boundary space, skipping an IMMEDIATELY adjacent second
    occurrence; the second pass catches those (two passes are maximal
    for a != b). The one divergence from textbook greedy BPE is runs of
    >= 3 self-merging tokens (merge a+a on 'aaa...'), where the
    leftover single lands mid-run instead of at the end — per-merge
    token COUNTS still match, only downstream merge interactions can
    differ, and tests/test_bpe.py pins count equality with the greedy
    encoder for every distinct word in the shipped corpora.

    Scale: called once per DISTINCT word (the vocab dim), never per
    occurrence; the whole thing inlines into whole-stage codegen.
    """
    # ' h e l l o </w> ' — chars space-joined, Sennrich end-of-word
    # sentinel, boundary spaces on both ends.
    s = F.concat(
        F.lit(" "),
        F.regexp_replace(word_col, "(.)", "$1 "),
        F.lit(end_of_word + " "),
    )
    for a, b in merges:
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        for _ in range(passes):
            s = F.replace(s, pat, rep)
    # tokens = separators - 1
    return (
        F.length(s) - F.length(F.replace(s, F.lit(" "), F.lit(""))) - 1
    ).cast("long")


def bpe_apply(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]] | None = None,
    end_of_word: str = "</w>",
    token_col: str = "bpe_tokens",
) -> DataFrame:
    """Per-document token count under a FIXED merge table (default: the
    shipped ``BPE_MERGES`` artifact) — the scoring half of the
    train/apply split, fully oracle-checkable because the encode chain
    is deterministic string algebra (``merge_chain_col``).

    Plan shape (same as ``bpe_token_counts`` but with zero Python):
    occurrences explode JVM-side → (doc, word, n) collapse → the merge
    chain evaluates once per DISTINCT word → join the vocab dim back
    and sum. Corpus-sized stages are explode + two map-side-combined
    aggs + one equi-join on the word key; the replace chain runs
    |vocab| times total regardless of corpus row count.
    """
    merges = BPE_MERGES if merges is None else merges
    occ = df.select(F.col(id_col), F.explode(words_col(text_col)).alias("word"))
    per_doc_word = occ.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("__n"))
    vocab_dim = (
        per_doc_word.select("word")
        .distinct()
        .withColumn("__tok", merge_chain_col(F.col("word"), merges, end_of_word))
    )
    return (
        per_doc_word.join(vocab_dim, "word")
        .groupBy(id_col)
        .agg(F.sum(F.col("__n") * F.col("__tok")).cast("long").alias(token_col))
    )


def bpe_apply_sql(
    merges: list[tuple[str, str]] | None = None,
    end_of_word: str = "</w>",
    passes: int = 2,
) -> str:
    """DuckDB oracle for ``bpe_apply`` — the SAME replace chain, token
    for token, so Spark and the oracle agree on any corpus."""
    merges = BPE_MERGES if merges is None else merges

    def q(s: str) -> str:
        return s.replace("'", "''")

    expr = f"' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '{q(end_of_word)} '"
    for a, b in merges:
        for _ in range(passes):
            expr = f"replace({expr}, ' {q(a)} {q(b)} ', ' {q(a)}{q(b)} ')"
    return f"""
WITH occ AS (
  SELECT doc_id, u.t AS word
  FROM documents, UNNEST(string_split_regex(trim(text), '\\s+')) AS u(t)
),
pdw AS (SELECT doc_id, word, count(*) AS n FROM occ GROUP BY 1, 2),
vocab AS (SELECT DISTINCT word FROM pdw),
tok AS (
  SELECT word,
         CAST(length(s) - length(replace(s, ' ', '')) - 1 AS BIGINT) AS toks
  FROM (SELECT word, {expr} AS s FROM vocab)
)
SELECT p.doc_id, CAST(sum(p.n * t.toks) AS BIGINT) AS bpe_tokens
FROM pdw p JOIN tok t USING (word)
GROUP BY p.doc_id
"""


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

"""BPE tokenizer plumbing: deterministic training on a known corpus,
encode identities and bounds, and the vocab-sized-Python plan shape."""

from __future__ import annotations

from sarkac_spark.operators.bpe import (
    _encode_word,
    bpe_token_counts,
    train_bpe,
    word_counts,
)


def test_train_bpe_learns_the_planted_merge_order(spark):
    # 'aaab' x40: pair ('a','a') dominates (2 per word x 40); after the
    # first merge 'aa'+'a' (1 per word) beats 'a'+'b'? no — 'aa a b</w>':
    # pairs (aa,a)=40, (a,b)=40, (b,</w>)=40 -> tie broken lexically:
    # ('a','b') < ('aa','a') < ('b','</w>')
    df = spark.createDataFrame([(1, " ".join(["aaab"] * 40))], "doc_id long, text string")
    merges = train_bpe(df, n_merges=3)
    assert merges[0] == ("a", "a")
    assert merges[1] == ("a", "b")  # lexicographic tie-break, pinned
    assert merges[2] == ("aa", "ab")


def test_train_bpe_stops_when_nothing_repeats(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    merges = train_bpe(df, n_merges=50)
    # every candidate pair occurs once => count < 2 stop, no noise merges
    assert merges == []


def test_encode_word_identities():
    # no merges: chars + sentinel
    assert _encode_word("spark", [], "</w>") == 6
    # full merge chain collapses the whole word to one token
    merges = [("a", "b"), ("ab", "</w>"), ("ab", "ab</w>")]
    assert _encode_word("abab", merges, "</w>") == 1
    # merge order matters: later merges see earlier merges' symbols
    assert _encode_word("ab", [("a", "b"), ("ab", "</w>")], "</w>") == 1


def test_bpe_token_counts_match_driver_encoding(spark):
    rows = [(1, "aaab aaab xy"), (2, "xy xy"), (3, "aaab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, n_merges=4)
    got = {r.doc_id: r.bpe_tokens for r in bpe_token_counts(df, "doc_id", "text", merges).collect()}
    expect = {
        i: sum(_encode_word(w, merges, "</w>") for w in text.split())
        for i, text in rows
    }
    assert got == expect
    # bounds: 1 <= tokens(word) <= chars+1, so per doc: n_words <= total
    for (i, text) in rows:
        n_words = len(text.split())
        n_chars = sum(len(w) + 1 for w in text.split())
        assert n_words <= got[i] <= n_chars


def test_word_counts_cap_is_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b b a a c")], "doc_id long, text string"
    )
    top2 = {r.word for r in word_counts(df, max_vocab=2).collect()}
    assert top2 == {"a", "b"}  # count desc, word asc tie-break


def test_bpe_token_counts_python_is_vocab_sized(spark, sf_dir):
    """Plan contract: the only Python in the plan is the Arrow-batched
    vocab-dim UDF — never row-at-a-time BatchEvalPython."""
    from sarkac_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = [("t", "h"), ("th", "e")]
    out = bpe_token_counts(docs, "doc_id", "text", merges)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


# --- bpe_apply: the oracle-checked scoring path against BPE_MERGES ---


def _chain_count(word, merges, eow="</w>", passes=2):
    """Driver-side mirror of merge_chain_col (relational replace chain)."""
    s = " " + " ".join(list(word) + [eow]) + " "
    for a, b in merges:
        for _ in range(passes):
            s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return s.count(" ") - 1


def test_bpe_apply_matches_greedy_on_corpus_vocab(spark, sf_dir):
    """The shipped artifact's relational encode == the greedy encoder
    for EVERY distinct word in the corpus (the divergence window —
    runs of >=3 self-merging tokens — never fires on real words)."""
    from sarkac_spark.operators.bpe import BPE_MERGES, merge_chain_col
    from pyspark.sql import functions as F
    from sarkac_spark.operators.dedup import words_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = (
        docs.select(F.explode(words_col("text")).alias("word"))
        .distinct()
        .withColumn("toks", merge_chain_col(F.col("word"), BPE_MERGES))
        .collect()
    )
    assert len(vocab) > 0
    for r in vocab:
        assert r.toks == _encode_word(r.word, BPE_MERGES, "</w>"), r.word
        assert r.toks == _chain_count(r.word, BPE_MERGES), r.word


def test_bpe_apply_equals_python_encode_per_doc(spark):
    from sarkac_spark.operators.bpe import BPE_MERGES, bpe_apply

    rows = [(1, "join the hash batch"), (2, "scan row scan row scan"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bpe_tokens for r in bpe_apply(df, "doc_id", "text").collect()}
    expect = {
        i: sum(_encode_word(w, BPE_MERGES, "</w>") for w in text.split())
        for i, text in rows
    }
    assert got == expect


def test_bpe_apply_adjacent_pair_repeats_need_two_passes():
    """'abab'-style words: one replace pass misses the occurrence right
    after a replaced one (boundary space consumed); the second pass is
    what makes the chain equal greedy for a != b merges."""
    merges = [("a", "b")]
    assert _chain_count("ababab", merges, passes=1) != _encode_word(
        "ababab", merges, "</w>"
    )
    assert _chain_count("ababab", merges, passes=2) == _encode_word(
        "ababab", merges, "</w>"
    )


def test_bpe_merges_artifact_provenance(spark):
    """BPE_MERGES is exactly train_bpe(sf0.01 docs, n_merges=32) — the
    shipped table is the seeded fit, not a hand-edit (PQ_CODEBOOKS
    contract). Regenerate with tools/train_bpe_table.py."""
    from sarkac_spark.operators.bpe import BPE_MERGES

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert train_bpe(docs, n_merges=32) == BPE_MERGES


# --- property: the replace chain IS greedy BPE for a != b merges ---

try:
    from hypothesis import given, settings, strategies as st

    _tokens = st.sampled_from(["a", "b", "c", "ab", "bc", "abc"])

    @st.composite
    def _merge_tables(draw):
        """Merge tables whose pairs never self-merge (a != b) — the
        regime where the 2-pass chain is PROVEN equal to greedy; the
        a == b divergence window is pinned separately below."""
        n = draw(st.integers(min_value=1, max_value=5))
        merges = []
        for _ in range(n):
            a = draw(_tokens)
            b = draw(_tokens.filter(lambda t, _a=a: t != _a))
            merges.append((a, b))
        return merges

    @given(
        word=st.text(alphabet="abc", min_size=1, max_size=16),
        merges=_merge_tables(),
    )
    @settings(max_examples=300, deadline=None)
    def test_chain_equals_greedy_for_unequal_pair_merges(word, merges):
        assert _chain_count(word, merges) == _encode_word(word, merges, "</w>")

except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass


def test_chain_divergence_window_is_exactly_self_merge_runs():
    """The one documented divergence: a run of >=3 self-merging tokens
    places the leftover single mid-run instead of at the end. Counts
    still match per merge; only DOWNSTREAM merges can differ — shown
    here, so the docstring's claim stays honest."""
    merges = [("a", "a"), ("aa", "a")]
    # 5 a's: greedy -> [aa, aa, a] -> merge (aa,a) at (1,2)? no: pairs
    # (aa,aa),(aa,a) -> [aa, aaa] = 2 tokens + </w>
    assert _encode_word("aaaaa", merges, "</w>") == 3
    # chain -> [aa, a, aa] -> (aa,a) merges at (0,1) -> [aaa, aa] = 2 + </w>
    assert _chain_count("aaaaa", merges) == 3  # same count here...
    # ...but a table can tell them apart:
    merges2 = [("a", "a"), ("a", "aa")]
    g = _encode_word("aaaaa", merges2, "</w>")
    c = _chain_count("aaaaa", merges2)
    # greedy: [aa, aa, a] has no (a, aa) pair -> 4 incl sentinel;
    # chain: [aa, a, aa] merges (a, aa) -> 3 — the divergence, pinned
    assert (g, c) == (4, 3)

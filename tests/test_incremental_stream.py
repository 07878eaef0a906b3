"""Streaming ingest-time dedup (IncrementalDedupPipeline): stream result
equals the hand-applied batch operators, earlier-committed docs win,
and the checkpointed pipeline survives a kill-resume."""

from __future__ import annotations

import pytest

# e2e tier: real streaming queries / subprocess sessions — minutes each.
# Excluded from the default (driver-verify) fast run; the builder's
# once-per-round full run includes them (pytest -m "slow or not slow").
pytestmark = pytest.mark.slow


import pytest
from pyspark.sql import functions as F

BETA = "spark shuffles data between stages when aggregations regroup rows by key"
BETA_NEAR = "spark shuffles data between stages when aggregations regroup rows by keys"
SCHEMA = "doc_id long, text string"


def _batches():
    # b0: two originals; b1: exact dup of 1 + novel; b2: near-dup of 2 + novel
    return [
        [(1, "the first original document with completely unique words here"),
         (2, BETA)],
        [(3, "the first original document with completely unique words here"),
         (4, "a genuinely novel document about storage formats and encodings")],
        [(5, BETA_NEAR),
         (6, "another novel doc discussing broadcast joins and partition pruning")],
    ]


def _write_batches(spark, src, batches):
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )


MH = {"k": 16, "bands": 4, "threshold": 0.5, "max_band_df": None}


def test_incremental_dedup_stream_matches_batch(spark, tmp_path):
    from sarkac_spark.streaming.incremental_dedup import IncrementalDedupPipeline

    src = tmp_path / "src"
    _write_batches(spark, src, _batches())

    pipe = IncrementalDedupPipeline(
        spark, str(tmp_path / "store"), minhash=MH
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(str(src / "*"))
    )
    q = pipe.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {r.doc_id for r in pipe.committed().collect()}
    # 3 is an exact dup of committed 1; 5 a near-dup of committed 2
    assert got == {1, 2, 4, 6}

    # stream == the batch operators applied ingest-by-ingest by hand
    from sarkac_spark.operators.dedup import (
        incremental_exact_dedup,
        incremental_minhash_drop_ids,
    )

    committed: list[tuple[int, str]] = []
    for rows in _batches():
        # materialize the (tiny) corpus each round: the lazy form nests
        # the full minhash plan 3 levels deep (corpus referenced 3x per
        # iteration) and codegen blows up
        corpus = spark.createDataFrame(committed or [], SCHEMA)
        batch = spark.createDataFrame(rows, SCHEMA)
        seen = corpus.select(F.md5(F.col("text")).alias("text_hash"))
        kept = incremental_exact_dedup(batch, seen, "doc_id", "text").drop(
            "text_hash"
        )
        combined = corpus.withColumn("__new", F.lit(False)).unionByName(
            kept.withColumn("__new", F.lit(True))
        )
        drop = incremental_minhash_drop_ids(combined, "doc_id", "text", **MH)
        kept = kept.join(drop, "doc_id", "left_anti")
        committed += [
            (r.doc_id, r.text) for r in kept.select("doc_id", "text").collect()
        ]
    assert got == {i for i, _ in committed}


def test_incremental_dedup_stream_survives_restart(spark, tmp_path):
    from sarkac_spark.streaming.incremental_dedup import IncrementalDedupPipeline

    src = tmp_path / "src"
    batches = _batches()
    _write_batches(spark, src, batches[:1])  # only b0 exists at first

    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    pipe = IncrementalDedupPipeline(spark, store, minhash=MH)

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = pipe.start(stream, ckpt)
        q.awaitTermination(180)

    run()
    assert {r.doc_id for r in pipe.committed().collect()} == {1, 2}

    # "crash", land the remaining ingests, resume from the checkpoint
    for i, rows in enumerate(batches[1:], start=1):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    run()
    assert {r.doc_id for r in pipe.committed().collect()} == {1, 2, 4, 6}


def test_incremental_dedup_stream_exact_only(spark, tmp_path):
    from sarkac_spark.streaming.incremental_dedup import IncrementalDedupPipeline

    src = tmp_path / "src"
    _write_batches(spark, src, _batches())
    pipe = IncrementalDedupPipeline(spark, str(tmp_path / "store"), minhash=None)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = pipe.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    # exact-only: the near-dup (5) survives, the exact dup (3) does not
    assert {r.doc_id for r in pipe.committed().collect()} == {1, 2, 4, 5, 6}


def test_dedup_reads_signatures_never_corpus_text(spark, tmp_path):
    """The 100 TB claim, behaviorally: after epochs commit, the corpus
    TEXT store can be rendered unreadable and the next trigger still
    dedups correctly — per-trigger reads touch only the signature
    store, so scan bytes are independent of corpus text size."""
    from sarkac_spark.streaming.incremental_dedup import IncrementalDedupPipeline

    store = tmp_path / "store"
    pipe = IncrementalDedupPipeline(spark, str(store), minhash=MH)
    batches = _batches()
    pipe.process_batch(spark.createDataFrame(batches[0], SCHEMA), 0)
    pipe.process_batch(spark.createDataFrame(batches[1], SCHEMA), 1)

    # vandalize every committed text file: unreadable as parquet
    poisoned = 0
    for p in store.rglob("*.parquet"):
        p.write_bytes(b"not parquet at all")
        poisoned += 1
    assert poisoned > 0

    # next trigger: near-dup of committed 2 must still be dropped, the
    # novel doc committed — using signatures alone
    pipe.process_batch(spark.createDataFrame(batches[2], SCHEMA), 2)
    sigs = spark.read.parquet(pipe.sig_dir)
    assert {r.doc_id for r in sigs.select("doc_id").collect()} == {1, 2, 4, 6}


def test_corrupt_sig_store_fails_the_trigger_loudly(spark, tmp_path):
    """A broken signature store must RAISE, not be treated as 'empty
    corpus' — silently committing an undeduped batch is unrepairable
    (replay only rewrites the batch's own epoch)."""
    import pytest

    from sarkac_spark.streaming.incremental_dedup import IncrementalDedupPipeline

    store = tmp_path / "store"
    pipe = IncrementalDedupPipeline(spark, str(store), minhash=MH)
    epoch_dir = tmp_path / "store_sigs" / "epoch=0"
    epoch_dir.mkdir(parents=True)
    (epoch_dir / "part-00000.parquet").write_bytes(b"garbage footer")

    with pytest.raises(Exception) as ei:
        pipe.process_batch(spark.createDataFrame(_batches()[0], SCHEMA), 1)
    # and NOT swallowed into the quiet empty-store path
    assert "PATH_NOT_FOUND" not in str(ei.value)


def test_missing_sig_store_is_the_quiet_first_epoch_path(spark, tmp_path):
    from sarkac_spark.streaming.incremental_dedup import IncrementalDedupPipeline

    pipe = IncrementalDedupPipeline(spark, str(tmp_path / "store"), minhash=MH)
    assert pipe._read_sigs(exclude_epoch=0) is None
    # empty dir (exists, no committed parquet) is also quiet
    (tmp_path / "store_sigs").mkdir()
    assert pipe._read_sigs(exclude_epoch=0) is None


def test_compact_folds_epochs_and_dedup_continues(spark, tmp_path):
    """compact() folds both stores into one base partition: same
    committed corpus, fewer files, and the next trigger still dedups
    correctly against the compacted signature store (epoch=-1 passes
    the replay-exclusion filter)."""
    from sarkac_spark.streaming.incremental_dedup import IncrementalDedupPipeline

    store = tmp_path / "store"
    pipe = IncrementalDedupPipeline(spark, str(store), minhash=MH)
    batches = _batches()
    pipe.process_batch(spark.createDataFrame(batches[0], SCHEMA), 0)
    pipe.process_batch(spark.createDataFrame(batches[1], SCHEMA), 1)

    def n_files(p):
        return sum(1 for f in p.rglob("*.parquet"))

    before_files = n_files(store) + n_files(tmp_path / "store_sigs")
    before_docs = {r.doc_id for r in pipe.committed().collect()}

    n = pipe.compact()  # stream stopped: everything on disk is committed
    assert n == len(before_docs)
    after_files = n_files(store) + n_files(tmp_path / "store_sigs")
    assert after_files < before_files
    assert {r.doc_id for r in pipe.committed().collect()} == before_docs

    # dedup continues against the compacted base: near-dup of committed
    # 2 still dropped, novel doc committed
    pipe.process_batch(spark.createDataFrame(batches[2], SCHEMA), 2)
    assert {r.doc_id for r in pipe.committed().collect()} == {1, 2, 4, 6}
    # and a replay of that post-compact epoch stays idempotent
    pipe.process_batch(spark.createDataFrame(batches[2], SCHEMA), 2)
    assert {r.doc_id for r in pipe.committed().collect()} == {1, 2, 4, 6}


def test_bottom_k_sh_set_sketch_still_catches_near_dups(spark, tmp_path):
    """max_sh_set (the 100 TB sh_set knob): with the verify side capped
    to a bottom-k sketch, the planted near-dup is still dropped and the
    novel docs still survive — and signatures are strictly smaller."""
    from pyspark.sql import functions as F

    from sarkac_spark.operators.dedup import dedup_signatures
    from sarkac_spark.streaming.incremental_dedup import IncrementalDedupPipeline

    mh = dict(MH, max_sh_set=6)
    pipe = IncrementalDedupPipeline(spark, str(tmp_path / "store"), minhash=mh)
    for i, rows in enumerate(_batches()):
        pipe.process_batch(spark.createDataFrame(rows, SCHEMA), i)
    # same verdicts as the exact-set run (near-dup 5 dropped, 3 exact-dropped)
    assert {r.doc_id for r in pipe.committed().collect()} == {1, 2, 4, 6}

    # the sketch really bounds the column
    docs = spark.createDataFrame(_batches()[0], SCHEMA)
    capped = dedup_signatures(docs, "doc_id", "text", max_sh_set=6)
    exact = dedup_signatures(docs, "doc_id", "text")
    for c, e in zip(
        sorted(capped.collect(), key=lambda r: r.doc_id),
        sorted(exact.collect(), key=lambda r: r.doc_id),
    ):
        assert len(c.sh_set) == min(6, len(e.sh_set))
        assert set(c.sh_set) == set(sorted(e.sh_set)[:len(c.sh_set)])


def test_union_bottom_k_estimator_exact_semantics(spark):
    """The capped verify step is the UNION-bottom-k estimator
    (membership-in-both over the k smallest of A∪B) — computable
    exactly from the two truncated sets — not naive intersection-over-
    union of the truncations, which is biased for docs above the cap.
    Pins a pair where the two formulas give verdicts on OPPOSITE sides
    of the threshold and asserts the operator follows the estimator."""
    import hashlib

    from sarkac_spark.operators.dedup import incremental_minhash_drop_ids_sigs

    def h(i: int) -> int:  # uniform-ish 60-bit values, like real sh_set
        return int(hashlib.md5(f"item-{i}".encode()).hexdigest()[:15], 16)

    # |A|=30, |B|=30, |A∩B|=20, |A∪B|=40 -> true jaccard 0.5
    a_full = sorted(h(i) for i in range(0, 30))
    b_full = sorted(h(i) for i in range(10, 40))
    k = 16
    a_k, b_k = a_full[:k], b_full[:k]

    union_k = sorted(set(a_full) | set(b_full))[:k]
    both = set(a_full) & set(b_full)
    est = round(sum(1 for x in union_k if x in both) / k, 6)
    naive_inter = len(set(a_k) & set(b_k))
    naive = round(naive_inter / (len(a_k) + len(b_k) - naive_inter), 6)
    assert est != naive  # the formulas genuinely disagree on this pair
    thr = (min(est, naive) + max(est, naive)) / 2

    sig_schema = (
        "doc_id long, text_hash string, band_keys array<string>, "
        "sh_set array<long>"
    )
    corpus = spark.createDataFrame([(1, "ha", ["band"], a_k)], sig_schema)
    batch = spark.createDataFrame([(2, "hb", ["band"], b_k)], sig_schema)
    drops = {
        r.doc_id
        for r in incremental_minhash_drop_ids_sigs(
            corpus, batch, "doc_id", threshold=thr,
            max_band_df=None, max_sh_set=k,
        ).collect()
    }
    assert drops == ({2} if est >= thr else set())

    # exactness below the cap: |A∪B| <= k reproduces the exact verdict
    small_a, small_b = a_full[:6], a_full[:6][:4] + b_full[:2]
    exact_j = round(
        len(set(small_a) & set(small_b))
        / len(set(small_a) | set(small_b)), 6,
    )
    corpus = spark.createDataFrame([(1, "ha", ["band"], small_a)], sig_schema)
    batch = spark.createDataFrame([(2, "hb", ["band"], small_b)], sig_schema)
    for thr2, want in ((exact_j, {2}), (exact_j + 1e-6, set())):
        got = {
            r.doc_id
            for r in incremental_minhash_drop_ids_sigs(
                corpus, batch, "doc_id", threshold=thr2,
                max_band_df=None, max_sh_set=k,
            ).collect()
        }
        assert got == want


def test_legacy_sig_store_fails_loudly(spark, tmp_path):
    """A readable signature store WITHOUT the format marker (legacy
    mod-P store, or one written by a foreign tool) must raise instead
    of comparing disjoint hash domains and admitting every near-dup."""
    import os

    from sarkac_spark.streaming.incremental_dedup import IncrementalDedupPipeline

    pipe = IncrementalDedupPipeline(
        spark, str(tmp_path / "store"), minhash=MH
    )
    pipe.process_batch(spark.createDataFrame(_batches()[0], SCHEMA), 0)
    # marker written on commit; removing it simulates a legacy store
    os.remove(os.path.join(pipe.sig_dir, "_FORMAT"))
    with pytest.raises(RuntimeError, match="format"):
        pipe.process_batch(spark.createDataFrame(_batches()[1], SCHEMA), 1)
    # wrong version is equally loud
    with open(os.path.join(pipe.sig_dir, "_FORMAT"), "w") as f:
        f.write("1")
    with pytest.raises(RuntimeError, match="format"):
        pipe.process_batch(spark.createDataFrame(_batches()[1], SCHEMA), 1)


def test_compact_refuses_legacy_store_and_stamps_marker_atomically(spark, tmp_path):
    """compact() must never bless a legacy/unmarked signature store as
    format 2 (folding one would silently re-enable admit-every-near-dup),
    and a successful compact's swap must be atomic INCLUDING the marker
    (stamped into the tmp dir before the swap, so no crash window leaves
    a healthy-but-unmarked store)."""
    import os

    from sarkac_spark.streaming.incremental_dedup import IncrementalDedupPipeline

    pipe = IncrementalDedupPipeline(spark, str(tmp_path / "store"), minhash=MH)
    pipe.process_batch(spark.createDataFrame(_batches()[0], SCHEMA), 0)

    # legacy store (no marker): compact refuses instead of re-stamping
    os.remove(os.path.join(pipe.sig_dir, "_FORMAT"))
    with pytest.raises(RuntimeError, match="format"):
        pipe.compact()
    # refused loudly AND left the store un-blessed
    assert not os.path.exists(os.path.join(pipe.sig_dir, "_FORMAT"))

    # restore the marker; compact succeeds and the swapped-in store
    # carries the marker (written into tmp pre-swap, not re-stamped after)
    with open(os.path.join(pipe.sig_dir, "_FORMAT"), "w") as f:
        f.write("2")
    n = pipe.compact()
    assert n == len({r.doc_id for r in pipe.committed().collect()})
    with open(os.path.join(pipe.sig_dir, "_FORMAT")) as f:
        assert f.read().strip() == "2"
    # and the compacted store still dedups (format intact end-to-end)
    pipe.process_batch(spark.createDataFrame(_batches()[0], SCHEMA), 7)
    ids = [r.doc_id for r in pipe.committed().collect()]
    assert len(ids) == len(set(ids))

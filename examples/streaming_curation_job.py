"""Ingest-time curation example — the StreamingCuratorPipeline
lifecycle: a document stream is curated AS IT ARRIVES (quality gates →
signature-store incremental dedup → per-source quota), with the
per-epoch funnel the operator actually watches, a kill-resume in the
middle, and the small-files compaction a long-running ingest needs.

This is the streaming twin of examples/batch_curation_job.py: same
Curator config semantics, same funnel stage names, but the corpus is
curated per micro-batch against materialized state instead of in one
offline pass.

Run: python examples/streaming_curation_job.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from sarkac_spark.session import get_spark
from sarkac_spark.sources.tables import load_table
from sarkac_spark.streaming.streaming_curator import StreamingCuratorPipeline

CONFIG = {
    "quality": {"gopher": True},
    "dedup": {"exact": True,
              "minhash": {"k": 16, "bands": 4, "threshold": 0.5}},
    "domain_cap": {"domain_col": "source", "cap": 5},
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming_curation_job")
    work = Path(tempfile.mkdtemp(prefix="stream_curation_"))
    src, store, ckpt = work / "src", work / "store", work / "ckpt"

    # land the corpus as three ingest files (a crawler's drops)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    n = docs.count()
    for i, bound in enumerate([(0, n // 3), (n // 3, 2 * n // 3),
                               (2 * n // 3, n)]):
        docs.filter(
            (F.col("doc_id") >= bound[0]) & (F.col("doc_id") < bound[1])
        ).coalesce(1).write.parquet(str(src / f"drop{i}"))

    pipe = StreamingCuratorPipeline(spark, str(store), CONFIG)
    schema = "doc_id long, text string, source string"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        pipe.start(stream, str(ckpt)).awaitTermination(240)

    # first run "crashes" after the drops land; the restart resumes
    # from the checkpoint and processes nothing twice
    run()
    mid = pipe.committed().count()
    run()  # no new files: a clean no-op restart
    committed = pipe.committed().count()
    print(f"committed after ingest: {committed} (mid-run: {mid}) of {n}")

    funnel = {
        r.stage: r.n
        for r in pipe.funnel().groupBy("stage")
        .agg(F.sum("n_docs").alias("n")).collect()
    }
    print("funnel:", {k: funnel[k] for k in
                      ["input", "quality", "dedup", "domain_cap"]})
    assert funnel["input"] == n
    assert funnel["input"] >= funnel["quality"] >= funnel["dedup"]
    assert funnel["domain_cap"] == committed

    # per-source quota held: no source exceeds the cap
    by_src = pipe.committed().groupBy("source").count()
    worst = by_src.agg(F.max("count")).collect()[0][0]
    assert worst <= CONFIG["domain_cap"]["cap"], worst

    # maintenance: fold thousands-of-tiny-files state into base partitions
    n_compacted = pipe.compact()
    assert n_compacted == committed
    assert pipe.committed().count() == committed

    print(f"OK: {committed} docs curated at ingest; "
          f"max per-source {worst} <= cap {CONFIG['domain_cap']['cap']}; "
          f"compacted store intact")

    # ---- act 2: the same ingest on the keyed-state engine ----------------
    # StatefulDedupPipeline is the O(batch)-per-trigger arm (band-keyed
    # state instead of a signature-store scan; BENCH_STREAM_DECADE
    # measured it flat across a 100x store decade). Same quota rule
    # (shared apply_domain_quota); quality applies upstream because it
    # is stateless. Near-dup CHAINS may differ (seen-corpus contract),
    # so the invariants checked are the operator ones, not set-equality.
    from sarkac_spark.curator import Curator
    from sarkac_spark.streaming.stateful_ingest_dedup import StatefulDedupPipeline

    st_store, st_ckpt = work / "st_store", work / "st_ckpt"
    quality_fn = Curator(
        spark, {"quality": CONFIG["quality"]}, "doc_id", "text"
    )._quality_stage(CONFIG["quality"])
    st_pipe = StatefulDedupPipeline(
        spark, str(st_store),
        minhash=CONFIG["dedup"]["minhash"],
        domain_cap=CONFIG["domain_cap"],
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    st_pipe.start(quality_fn(stream), str(st_ckpt)).awaitTermination(240)
    st_committed = st_pipe.committed()
    st_n = st_committed.count()
    # no exact dups survive, per construction of the xh| bands
    n_hashes = st_committed.select(F.md5("text")).distinct().count()
    assert n_hashes == st_n, (n_hashes, st_n)
    st_worst = (
        st_committed.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    )
    assert st_worst <= CONFIG["domain_cap"]["cap"], st_worst
    print(f"OK: keyed-state engine committed {st_n} "
          f"(parquet arm {committed}); exact-dup-free, quota held")

    # ---- act 3: bulk backfill, then stream increments ---------------------
    # A large EXISTING corpus must not be fed through per-trigger ingest
    # (BENCH_STREAM_TRANSPOSE: the keyed-state arm pays its per-key floor
    # 4.6x over a 100x bulk-batch axis). backfill() routes it through ONE
    # batch curation pass committed as the epoch=-1 base layer; streaming
    # then continues incrementally against that state.
    bf_store, bf_ckpt = work / "bf_store", work / "bf_ckpt"
    bf = StreamingCuratorPipeline(spark, str(bf_store), CONFIG)
    n_base = bf.backfill(docs)  # the whole corpus in one batch pass
    assert n_base == committed  # same curation semantics as the stream
    # an increment: byte-replays of already-committed docs + fresh ids
    inc_src = work / "inc"
    replay = bf.committed().limit(5)
    # genuinely distinct fresh docs (pairwise non-near-dup), in a NEW
    # source — the old sources are already at their quota cap
    fresh = spark.createDataFrame(
        [
            (10_000_001, "the log structured merge tree trades read "
                         "amplification for the sequential write throughput "
                         "that compaction provides", "fresh_crawl"),
            (10_000_002, "dictionary and run length encodings compress the "
                         "repetitive columns of analytical data very "
                         "effectively on disk", "fresh_crawl"),
            (10_000_003, "vectorized query execution processes batches of "
                         "tuples at once to amortize interpretation "
                         "overhead across the pipeline", "fresh_crawl"),
            (10_000_004, "consistent hashing assigns partitions to nodes "
                         "so membership changes move only a small fraction "
                         "of the keys", "fresh_crawl"),
            (10_000_005, "write ahead logging makes transactions durable "
                         "by persisting intent records before any page is "
                         "modified in place", "fresh_crawl"),
        ],
        schema,
    )
    replay.unionByName(fresh).coalesce(1).write.parquet(str(inc_src / "b0"))
    inc_stream = spark.readStream.schema(schema).parquet(str(inc_src / "*"))
    bf.start(inc_stream, str(bf_ckpt)).awaitTermination(240)
    n_after = bf.committed().count()
    # replays died against the base layer; fresh docs were admitted
    # under the new source's quota (5 fresh docs, cap 5)
    assert n_after == n_base + min(5, CONFIG["domain_cap"]["cap"])
    n_replayed = (
        bf.committed().groupBy("doc_id").count().filter("count > 1").count()
    )
    assert n_replayed == 0, "a backfilled doc was committed twice"
    print(f"OK: backfill committed {n_base} as the base layer; "
          f"streamed increment grew the store to {n_after} with zero "
          f"double-commits")

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Relational + sessionization lifecycle example: the analytics side of
the engine over the TPC-H-style tables and an event stream.

Four stops, each printing one OK line:
1. bloom-gated join — the runtime-filter pattern: fact rows that cannot
   match are dropped map-side, result equals the plain join exactly
2. top-10 after a fact-fact join (TPC-H Q3 shape) — per-partition heaps
   via TakeOrderedAndProject, never a global sort
3. batch gap sessionization over the events table
4. the streaming twin: native session_window with keyed state, run over
   file micro-batches, stream result == the batch operator

Run: python examples/analytics_job.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from datetime import datetime, timedelta
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from sarkac_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("analytics_example")
    tmp = tempfile.mkdtemp(prefix="analytics_example_")

    # 1. bloom-gated join: equal to the plain join, fact thinned map-side
    from sarkac_spark.operators.sketch import bloom_gated_join
    from sarkac_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "LARGE"
    ).select("p_partkey", "p_brand")
    gated = bloom_gated_join(li, part, "l_partkey", "p_partkey")
    plain = li.join(part, li["l_partkey"] == part["p_partkey"])
    n_gated, n_plain = gated.count(), plain.count()
    assert n_gated == n_plain
    print(f"OK: bloom-gated join == plain join ({n_plain} rows)")

    # 2. TPC-H Q3 shape: distributed top-10, no global sort
    from sarkac_spark.queries.relational import q_shipping_priority

    top = q_shipping_priority(spark, sf_dir).collect()
    assert len(top) <= 10
    print(f"OK: shipping_priority top-{len(top)}, best order "
          f"{top[0].l_orderkey} at {top[0].revenue_cents} cents")

    # 3. batch sessionization over events
    from sarkac_spark.operators.sessions import session_stats

    events = load_table(spark, sf_dir, "events")
    sess = session_stats(events, ["user_id"], "ts", gap_seconds=1800)
    print(f"OK: batch sessionize -> {sess.count()} sessions")

    # 4. streaming twin on a tiny synthetic stream (one file per trigger;
    #    the last two batches advance + flush the watermark)
    from sarkac_spark.streaming.sessions import StreamingSessionPipeline

    t0 = datetime(2001, 1, 1, 12, 0, 0)
    batches = [
        [(1, t0), (1, t0 + timedelta(seconds=30)), (2, t0)],
        [(1, t0 + timedelta(seconds=80))],           # merges into 1's open session
        [(9, t0 + timedelta(seconds=100_000))],      # watermark past everything
        [(9, t0 + timedelta(seconds=100_001))],      # flush trigger
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.parquet(f"{tmp}/src/b{i:02d}")
    pipe = StreamingSessionPipeline(
        spark, f"{tmp}/store", ["user_id"], "ts", gap_seconds=60
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/src/*")
    )
    pipe.start(stream, f"{tmp}/ckpt").awaitTermination(280)
    got = {
        (r.user_id, r.n_events)
        for r in pipe.sessions().filter(F.col("user_id") != 9).collect()
    }
    assert got == {(1, 3), (2, 1)}  # cross-trigger merge happened
    print(f"OK: streaming session_window finalized {len(got)} sessions, "
          "cross-trigger merge verified")


if __name__ == "__main__":
    main()

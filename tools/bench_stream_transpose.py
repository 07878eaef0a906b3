"""Batch-size transpose of the store-growth decade (VERDICT r9 #8,
stretch): BENCH_STREAM_DECADE fixed the trigger batch at 500 docs and
grew the committed store 1x/10x/100x; this tool fixes the store at the
100x point (2M committed docs) and grows the BATCH 500 -> 5k -> 50k,
for both ingest engines. The claim under test is per-trigger cost =
O(batch) on its second axis: trigger wall should scale ~linearly with
batch size against a CONSTANT store.

Reuses the stores/checkpoints the decade run left under
scale_data/stream_decade (run `bench_stream_decade.py --arm curator`
and `--arm stateful` at the same --mult first): the curator arm drives
`process_batch` directly against its committed store; the stateful arm
appends trigger files to its source dir and restarts the query on its
checkpoint, reading per-trigger walls from the query's own progress
events (restart/state-reload cost excluded by dropping each run's
first-trigger wall? No — each restart processes all new files in one
run, so only ONE state-reload is amortized across that batch size's
triggers; the per-trigger median is the reported figure).

Usage:
  python tools/bench_stream_transpose.py [--mult 100] [--batches 500,5000,50000]
      [--triggers 3] [--out BENCH_STREAM_TRANSPOSE.json]

Run alone (no concurrent Spark sessions): this is a timing measurement.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_stream_decade import MH, _trigger_batch
from gen_scale_data import _vocab_for

BASE_SEED = 20_000


def _seed_ctx(work: Path, n_seed: int):
    tbl = pq.read_table(work / f"seed_{n_seed}.parquet")
    return tbl.column("text").to_pylist()[: min(5000, n_seed)], _vocab_for(n_seed)


def curator_arm(spark, work: Path, mult: int, batches: list[int], triggers: int) -> list[dict]:
    from sarkac_spark.streaming.streaming_curator import StreamingCuratorPipeline

    n_seed = BASE_SEED * mult
    store = work / f"curator_x{mult}" / "store"
    if not store.exists():
        raise RuntimeError(f"run bench_stream_decade --arm curator --mult {mult} first")
    seed_texts, vocab = _seed_ctx(work, n_seed)
    pipe = StreamingCuratorPipeline(
        spark,
        str(store),
        config={
            "quality": {"min_score": 0.0},
            "dedup": {"minhash": dict(MH)},
            "domain_cap": {"domain_col": "source", "cap": 10**9},
        },
    )
    out = []
    epoch = 1000  # disjoint from the decade run's epochs
    for batch in batches:
        walls = []
        for t in range(triggers):
            rows = _trigger_batch(seed_texts, n_seed, epoch, batch, vocab)
            bdf = spark.createDataFrame(rows, "doc_id long, text string, source string")
            t0 = time.monotonic()
            pipe.process_batch(bdf, epoch)
            walls.append(round(time.monotonic() - t0, 3))
            epoch += 1
        out.append(
            {
                "arm": "curator",
                "mult": mult,
                "batch": batch,
                "trigger_walls": walls,
                "per_trigger_median": round(float(np.median(walls)), 3),
            }
        )
        print(json.dumps(out[-1]))
    return out


def stateful_arm(spark, work: Path, mult: int, batches: list[int], triggers: int) -> list[dict]:
    from sarkac_spark.curator import Curator
    from sarkac_spark.session import ROCKSDB_PROVIDER
    from sarkac_spark.streaming.stateful_ingest_dedup import StatefulDedupPipeline

    n_seed = BASE_SEED * mult
    root = work / f"stateful_x{mult}"
    src = root / "src"
    if not (root / "ckpt").exists():
        raise RuntimeError(f"run bench_stream_decade --arm stateful --mult {mult} first")
    seed_texts, vocab = _seed_ctx(work, n_seed)

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    pipe = StatefulDedupPipeline(
        spark,
        str(root / "store"),
        minhash=dict(MH),
        domain_cap={"domain_col": "source", "cap": 10**9},
    )
    quality_fn = Curator(
        spark, {"quality": {"min_score": 0.0}}, "doc_id", "text"
    )._quality_stage({"min_score": 0.0})

    def _as_dict(x):
        if isinstance(x, str):
            return json.loads(x)
        if isinstance(x, dict):
            return x
        return json.loads(x.json)

    out = []
    epoch = 1000
    for batch in batches:
        for t in range(triggers):
            rows = _trigger_batch(seed_texts, n_seed, epoch, batch, vocab)
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                        "text": pa.array([r[1] for r in rows], pa.string()),
                        "source": pa.array([r[2] for r in rows], pa.string()),
                    }
                ),
                src / f"t{epoch:05d}.parquet",
            )
            epoch += 1
        stream = (
            spark.readStream.schema("doc_id long, text string, source string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = pipe.start(quality_fn(stream), str(root / "ckpt"))
        q.awaitTermination(3600)
        progress = [_as_dict(x) for x in q.recentProgress]
        walls = [
            round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
            for p in progress
            if p["numInputRows"] > 0
        ]
        out.append(
            {
                "arm": "stateful",
                "mult": mult,
                "batch": batch,
                "trigger_walls": walls,
                "per_trigger_median": round(float(np.median(walls)), 3) if walls else None,
            }
        )
        print(json.dumps(out[-1]))
    return out


def main() -> int:
    args = sys.argv[1:]

    def opt(name, default, cast=int):
        return cast(args[args.index(name) + 1]) if name in args else default

    mult = opt("--mult", 100)
    batches = [int(x) for x in opt("--batches", "500,5000,50000", str).split(",")]
    triggers = opt("--triggers", 3)
    arm = opt("--arm", "all", str)
    out_path = opt("--out", "BENCH_STREAM_TRANSPOSE.json", str)

    from sarkac_spark.session import get_spark

    spark = get_spark("bench_stream_transpose")
    work = Path("scale_data/stream_decade")

    results = []
    if arm in ("curator", "all"):
        results += curator_arm(spark, work, mult, batches, triggers)
    if arm in ("stateful", "all"):
        results += stateful_arm(spark, work, mult, batches, triggers)

    verdict = {}
    for a in ("curator", "stateful"):
        pts = [r for r in results if r["arm"] == a and r["per_trigger_median"]]
        if len(pts) >= 2:
            wall_ratio = pts[-1]["per_trigger_median"] / max(pts[0]["per_trigger_median"], 1e-9)
            batch_ratio = pts[-1]["batch"] / pts[0]["batch"]
            verdict[f"{a}_wall_ratio"] = round(wall_ratio, 2)
            verdict[f"{a}_wall_vs_batch"] = round(wall_ratio / batch_ratio, 3)
    summary = {"points": results, "verdict": verdict}
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"out": out_path, **verdict}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Store-growth decade bench for the COMPOSED streaming pipelines
(VERDICT r8 #1): per-trigger cost of StreamingCuratorPipeline against
pre-seeded committed stores of 1x/10x/100x size, and of
StreamingSessionPipeline against 1x/10x/100x OPEN-SESSION key
cardinality. The sigma engines' BASELINE.md §c protocol, applied to the
composed pipelines: the 100 TB ingest claim is that per-trigger cost
tracks the BATCH (plus a column-pruned signature scan), not the
committed corpus — this tool is the measurement behind that sentence.

Curator arm protocol, per store multiplier:
  1. seed: generate mult*BASE_SEED docs (gen_scale_data shape — Heaps
     vocab, planted dup rates) and commit them as epoch 0 (untimed-gate
     setup; its wall is reported as seed_wall for the record).
  2. compact() — the steady state of a long-running ingest (reported
     separately as compact_wall; per-trigger cost is measured against
     the compacted store, never against trigger-fragmented files).
  3. run TRIGGERS identical timed triggers of BATCH docs each
     (20% exact dups of seeded docs, 20% near-dups [3-word swaps],
     60% fresh) through process_batch — the full quality -> dedup ->
     quota -> commit -> funnel path. Report each wall + the median.

Session arm protocol, per key-cardinality point: one seeding trigger
opens K sessions (one event per key), then TRIGGERS timed triggers of
BATCH events each land on existing keys WITHOUT closing any session
(event time advances < gap), so state stays K open sessions throughout.
Per-trigger walls come from the query's own progress events
(durationMs.triggerExecution) in a single availableNow run — no
restart/state-reload cost pollutes the numbers.

Output: one JSON line per arm point; --out writes the full table.

Usage:
  python tools/bench_stream_decade.py [--mult 100] [--arm curator|session|all]
      [--base 20000] [--batch 500] [--triggers 4] [--out BENCH_STREAM_DECADE.json]

Run alone (no concurrent Spark sessions): this is a timing measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from gen_scale_data import BASE_DOCS, WORDS_PER_DOC, _vocab_for, gen_documents

BASE_SEED = 20_000
N_SOURCES = 20
MH = {"k": 16, "bands": 4, "threshold": 0.5}


def _seed_table(n_docs: int) -> pa.Table:
    rng = np.random.default_rng(42)
    return gen_documents(n_docs, rng)


def _trigger_batch(
    seed_texts: list[str], n_docs: int, epoch: int, batch: int, vocab: np.ndarray
) -> list[tuple]:
    """BATCH rows: 20% exact dups of seeded docs, 20% near-dups (3-word
    swaps — the gen_scale_data near-dup shape), 60% fresh. Ids are
    disjoint from the seed range and from every other epoch."""
    rng = np.random.default_rng(1000 + epoch)
    rows = []
    base_id = 1_000_000_000 + epoch * 1_000_000
    n_exact = batch // 5
    n_near = batch // 5
    for i in range(batch):
        doc_id = base_id + i
        src = f"src{int(rng.integers(0, N_SOURCES))}"
        if i < n_exact:
            text = seed_texts[int(rng.integers(0, len(seed_texts)))]
        elif i < n_exact + n_near:
            t = seed_texts[int(rng.integers(0, len(seed_texts)))].split(" ")
            for pos in rng.integers(0, len(t), size=3):
                t[pos] = str(vocab[int(rng.integers(0, len(vocab)))])
            text = " ".join(t)
        else:
            text = " ".join(
                vocab[rng.integers(0, len(vocab), size=WORDS_PER_DOC)]
            )
        rows.append((doc_id, text, src))
    return rows


def curator_point(
    spark, work: Path, mult: int, batch: int, triggers: int,
    base_seed: int = BASE_SEED,
) -> dict:
    from pyspark.sql import functions as F

    from sarkac_spark.streaming.streaming_curator import StreamingCuratorPipeline

    n_seed = base_seed * mult
    store = work / f"curator_x{mult}" / "store"
    shutil.rmtree(store.parent, ignore_errors=True)
    store.parent.mkdir(parents=True)

    seed_path = work / f"seed_{n_seed}.parquet"
    tbl = _seed_table(n_seed)
    pq.write_table(tbl, seed_path)
    # a sample of seed texts for dup construction + the matching vocab
    seed_texts = tbl.column("text").to_pylist()[: min(5000, n_seed)]
    vocab = _vocab_for(n_seed)

    pipe = StreamingCuratorPipeline(
        spark,
        str(store),
        config={
            # min_score 0.0: the REAL quality stage runs (map-only
            # score + filter) but passes everything — the gopher
            # stopword gate's pass-rate depends on vocab density, which
            # Heaps scaling changes across multipliers, and a
            # selectivity drift would confound the store-growth axis
            # this bench isolates (the 1x->10x seed collapsed to 20%
            # under gopher before this pin).
            "quality": {"min_score": 0.0},
            "dedup": {"minhash": dict(MH)},
            "domain_cap": {"domain_col": "source", "cap": 10**9},
        },
    )
    seed_df = spark.read.parquet(str(seed_path)).select(
        "doc_id", "text", F.col("source")
    )
    t0 = time.monotonic()
    pipe.process_batch(seed_df, 0)
    seed_wall = time.monotonic() - t0

    t0 = time.monotonic()
    n_committed = pipe.compact()
    compact_wall = time.monotonic() - t0

    walls = []
    admitted = []
    for e in range(1, triggers + 1):
        rows = _trigger_batch(seed_texts, n_seed, e, batch, vocab)
        bdf = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        t0 = time.monotonic()
        pipe.process_batch(bdf, e)
        walls.append(round(time.monotonic() - t0, 3))
    funnel = {
        (r.epoch, r.stage): r.n_docs for r in pipe.funnel().collect()
    }
    for e in range(1, triggers + 1):
        admitted.append(int(funnel.get((e, "domain_cap"), -1)))
    return {
        "arm": "curator",
        "mult": mult,
        "n_seed": n_seed,
        "n_committed_seed": n_committed,
        "seed_wall": round(seed_wall, 2),
        "compact_wall": round(compact_wall, 2),
        "trigger_walls": walls,
        "per_trigger_median": round(float(np.median(walls)), 3),
        "admitted_per_trigger": admitted,
        "batch": batch,
    }


def stateful_point(
    spark, work: Path, mult: int, batch: int, triggers: int,
    base_seed: int = BASE_SEED,
) -> dict:
    """The keyed-state engine (StatefulDedupPipeline) at the same
    store-growth decade points as curator_point: seed mult*BASE_SEED
    docs through the stream (one untimed trigger — the band state is
    the signature store, so seeding IS the state build), then TRIGGERS
    identical timed triggers of the same 20/20/60 dup mix. Per-trigger
    walls come from the query's own progress events. Same quality
    (pass-through min_score) + quota(inf cap) composition as the
    curator arm, so the two arms differ only in the dedup engine."""
    from pyspark.sql import functions as F

    from sarkac_spark.curator import Curator
    from sarkac_spark.streaming.stateful_ingest_dedup import StatefulDedupPipeline

    n_seed = base_seed * mult
    root = work / f"stateful_x{mult}"
    shutil.rmtree(root, ignore_errors=True)
    src = root / "src"
    src.mkdir(parents=True)

    seed_path = work / f"seed_{n_seed}.parquet"
    if not seed_path.exists():
        pq.write_table(_seed_table(n_seed), seed_path)
    tbl = pq.read_table(seed_path)
    seed_texts = tbl.column("text").to_pylist()[: min(5000, n_seed)]
    vocab = _vocab_for(n_seed)

    # seed file + trigger files, processed one per trigger in order
    shutil.copy(seed_path, src / "b000.parquet")
    for e in range(1, triggers + 1):
        rows = _trigger_batch(seed_texts, n_seed, e, batch, vocab)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "source": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            src / f"b{e:03d}.parquet",
        )

    # the deployment shape for millions of band keys: RocksDB state
    # (off-heap, local disk, changelog checkpointing). The HDFS-backed
    # default keeps every key on the JVM heap — it OOMs the x100 seed
    # (2M docs -> ~8M band-key state entries) exactly as the
    # session.get_spark docstring warns. Runtime SQL conf, read at
    # query start.
    from sarkac_spark.session import ROCKSDB_PROVIDER

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
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = pipe.start(quality_fn(stream), str(root / "ckpt"))
    q.awaitTermination(3600)

    def _as_dict(x):
        if isinstance(x, str):
            return json.loads(x)
        if isinstance(x, dict):
            return x
        return json.loads(x.json)

    progress = [_as_dict(x) for x in q.recentProgress]
    prog = [
        (p["batchId"], p["numInputRows"], p["durationMs"]["triggerExecution"])
        for p in progress
        if p["numInputRows"] > 0
    ]
    timed = [round(d / 1000.0, 3) for _, n, d in prog[1:]]
    funnel = {(r.epoch, r.stage): r.n_docs for r in pipe.funnel().collect()}
    admitted = [
        int(funnel.get((e, "domain_cap"), -1)) for e in range(1, triggers + 1)
    ]
    return {
        "arm": "stateful",
        "mult": mult,
        "n_seed": n_seed,
        "n_committed_seed": int(funnel.get((0, "domain_cap"), -1)),
        "seed_wall": round(prog[0][2] / 1000.0, 2) if prog else None,
        "trigger_walls": timed,
        "per_trigger_median": round(float(np.median(timed)), 3) if timed else None,
        "admitted_per_trigger": admitted,
        "batch": batch,
    }


def bootstrap_point(
    spark, work: Path, mult: int, batch: int, triggers: int,
    base_seed: int = BASE_SEED,
) -> dict:
    """Bulk-onboard measurement (VERDICT r9 #1): seed the SAME corpus
    the stateful arm's replay committed (its epoch-0 store — a deduped
    corpus, the bootstrap precondition) via
    ``StatefulDedupPipeline.bootstrap_state`` instead of the doc-by-doc
    replay trigger, then run the same timed trigger mix. Reports
    bootstrap_wall (the headline: replay seed_wall vs this) and the
    per-trigger walls, which should match the stateful arm's. Requires
    the stateful arm to have run first in this invocation (same mult)."""
    from pyspark.sql import functions as F

    from sarkac_spark.curator import Curator
    from sarkac_spark.session import ROCKSDB_PROVIDER
    from sarkac_spark.streaming.stateful_ingest_dedup import StatefulDedupPipeline

    n_seed = base_seed * mult
    replay_store = work / f"stateful_x{mult}" / "store" / "epoch=0"
    if not replay_store.exists():
        raise RuntimeError(
            f"bootstrap arm needs the stateful arm's committed seed at "
            f"{replay_store} — run --arm stateful (same --mult) first"
        )
    root = work / f"bootstrap_x{mult}"
    shutil.rmtree(root, ignore_errors=True)
    src = root / "src"

    seed_path = work / f"seed_{n_seed}.parquet"
    tbl = pq.read_table(seed_path)
    seed_texts = tbl.column("text").to_pylist()[: min(5000, n_seed)]
    vocab = _vocab_for(n_seed)

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
    corpus = spark.read.parquet(str(replay_store)).select(
        "doc_id", "text", "source"
    )
    t0 = time.monotonic()
    n_corpus = pipe.bootstrap_state(corpus, str(root / "ckpt"), str(src))
    bootstrap_wall = time.monotonic() - t0

    # same trigger mix as the stateful arm (same rng seeds)
    for e in range(1, triggers + 1):
        rows = _trigger_batch(seed_texts, n_seed, e, batch, vocab)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "source": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            src / f"b{e:03d}.parquet",
        )
    quality_fn = Curator(
        spark, {"quality": {"min_score": 0.0}}, "doc_id", "text"
    )._quality_stage({"min_score": 0.0})
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = pipe.start(quality_fn(stream), str(root / "ckpt"))
    q.awaitTermination(3600)

    def _as_dict(x):
        if isinstance(x, str):
            return json.loads(x)
        if isinstance(x, dict):
            return x
        return json.loads(x.json)

    progress = [_as_dict(x) for x in q.recentProgress]
    prog = [
        (p["batchId"], p["numInputRows"], p["durationMs"]["triggerExecution"])
        for p in progress
        if p["numInputRows"] > 0
    ]
    timed = [round(d / 1000.0, 3) for _, n, d in prog]
    funnel = {(r.epoch, r.stage): r.n_docs for r in pipe.funnel().collect()}
    admitted = [
        int(funnel.get((e, "domain_cap"), -1)) for e in range(1, triggers + 1)
    ]
    return {
        "arm": "bootstrap",
        "mult": mult,
        "n_seed": n_seed,
        "n_corpus": n_corpus,
        "bootstrap_wall": round(bootstrap_wall, 2),
        "trigger_walls": timed,
        "per_trigger_median": round(float(np.median(timed)), 3) if timed else None,
        "admitted_per_trigger": admitted,
        "batch": batch,
    }


def _events_file(path: Path, user_lo: int, user_hi: int, t_offset_s: int,
                 n_events: int, eid_base: int) -> None:
    rng = np.random.default_rng(7 + eid_base)
    users = rng.integers(user_lo, user_hi, size=n_events)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = (
        t0
        + np.timedelta64(t_offset_s * 1_000_000, "us")
        + rng.integers(0, 30 * 1_000_000, size=n_events).astype("timedelta64[us]")
    )
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "event_id": pa.array(
                    np.arange(eid_base, eid_base + n_events), pa.int64()
                ),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        ),
        path,
    )


def session_point(spark, work: Path, n_keys: int, batch: int, triggers: int) -> dict:
    from sarkac_spark.streaming.sessions import StreamingSessionPipeline

    root = work / f"session_k{n_keys}"
    shutil.rmtree(root, ignore_errors=True)
    src = root / "src"
    src.mkdir(parents=True)

    # seed file opens one session per key; each timed trigger lands
    # `batch` events on existing keys, 60s later each time (< the 1800s
    # gap, so NO session closes — state stays n_keys open sessions)
    rng = np.random.default_rng(3)
    seed_users = np.arange(n_keys)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(seed_users, pa.int64()),
                "event_id": pa.array(np.arange(n_keys), pa.int64()),
                "ts": pa.array(
                    t0
                    + rng.integers(0, 30 * 1_000_000, size=n_keys).astype(
                        "timedelta64[us]"
                    ),
                    pa.timestamp("us"),
                ),
            }
        ),
        src / "b000.parquet",
    )
    for j in range(1, triggers + 1):
        _events_file(
            src / f"b{j:03d}.parquet",
            0,
            n_keys,
            t_offset_s=60 * j,
            n_events=batch,
            eid_base=n_keys + j * batch,
        )

    pipe = StreamingSessionPipeline(
        spark, str(root / "store"), ["user_id"], ts_col="ts",
        gap_seconds=1800, watermark_delay_seconds=0,
    )
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = pipe.start(stream, str(root / "ckpt"))
    q.awaitTermination(600)

    def _as_dict(x):
        if isinstance(x, str):
            return json.loads(x)
        if isinstance(x, dict):
            return x
        return json.loads(x.json)  # StreamingQueryProgress object

    progress = [_as_dict(x) for x in q.recentProgress]
    prog = [
        (p["batchId"], p["numInputRows"], p["durationMs"]["triggerExecution"])
        for p in progress
        if p["numInputRows"] > 0
    ]
    # first data trigger is the K-row seed; the rest are the timed ones
    timed = [round(d / 1000.0, 3) for _, n, d in prog[1:]]
    state_rows = None
    for p in reversed(progress):
        if p.get("stateOperators"):
            state_rows = p["stateOperators"][0].get("numRowsTotal")
            break
    return {
        "arm": "session",
        "n_keys": n_keys,
        "seed_trigger_wall": round(prog[0][2] / 1000.0, 3) if prog else None,
        "trigger_walls": timed,
        "per_trigger_median": round(float(np.median(timed)), 3) if timed else None,
        "state_rows": state_rows,
        "batch": batch,
    }


def main() -> int:
    args = sys.argv[1:]

    def opt(name, default, cast=int):
        return cast(args[args.index(name) + 1]) if name in args else default

    mult = opt("--mult", 100)
    base_seed = opt("--base", BASE_SEED)
    base_batch = opt("--batch", 500)
    triggers = opt("--triggers", 4)
    arm = opt("--arm", "all", str)
    out_path = opt("--out", "BENCH_STREAM_DECADE.json", str)
    sh_cap = opt("--sh-cap", None)
    if sh_cap is not None:
        # the parquet arm's sh_set knob (bottom-k sketch + union-bottom-k
        # verify): bounds the verify column the curator re-scans per
        # trigger — the measured residual slope of that arm
        MH["max_sh_set"] = int(sh_cap)

    from sarkac_spark.session import get_spark

    spark = get_spark("bench_stream_decade")
    work = Path("scale_data/stream_decade")
    work.mkdir(parents=True, exist_ok=True)

    mults = sorted({1, min(10, mult), mult})
    results = []
    if arm in ("curator", "all"):
        for m in mults:
            r = curator_point(spark, work, m, base_batch, triggers, base_seed)
            print(json.dumps(r))
            results.append(r)
    if arm in ("stateful", "all"):
        for m in mults:
            r = stateful_point(spark, work, m, base_batch, triggers, base_seed)
            print(json.dumps(r))
            results.append(r)
    if arm in ("bootstrap", "all"):
        for m in mults:
            r = bootstrap_point(spark, work, m, base_batch, triggers, base_seed)
            print(json.dumps(r))
            results.append(r)
    if arm in ("session", "all"):
        for k in [1_000 * m for m in mults]:
            r = session_point(spark, work, k, 2_000, max(3, triggers))
            print(json.dumps(r))
            results.append(r)

    # decade verdicts: per-trigger median ratio biggest/smallest point
    verdict = {}
    for a in ("curator", "stateful", "bootstrap", "session"):
        pts = [r for r in results if r["arm"] == a and r["per_trigger_median"]]
        if len(pts) >= 2:
            ratio = round(
                pts[-1]["per_trigger_median"] / max(pts[0]["per_trigger_median"], 1e-9),
                2,
            )
            verdict[f"{a}_per_trigger_ratio"] = ratio
    summary = {"points": results, "verdict": verdict}
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"out": out_path, **verdict}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

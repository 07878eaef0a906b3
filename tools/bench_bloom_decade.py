"""Decade + skew measurement for ``bloom_gated_join`` (VERDICT r8 #4).

The operator's 100 TB claim: when the dim is too wide/large to
broadcast, the plain join SHUFFLES THE WHOLE FACT, while the bloom
gate broadcasts an ``m/64``-word bitset and drops non-matching fact
rows map-side, BEFORE the exchange. r8 measured one point (sf0.1:
83.1% thinned, 0 false positives). This tool measures the missing
axes:

- **Decade**: fact grown 1x/10x/100x at FIXED dim. Gate wall must be
  map-side linear (<= 15x per decade, the linear-class bound from
  bench_scale_decade); thinning %% and fp count are re-measured at
  every point (fp rate is a property of (m, k, |dim|), so fixed dim =>
  ~constant fp count across fact growth).
- **Crossover**: gated join vs the plain shuffle join at each point,
  both run with broadcast disabled (the regime the operator exists
  for — a broadcastable dim needs no runtime filter). Reported, not
  bounded: the gate pays ~2 extra jobs of fixed cost, so it loses at
  tiny facts and wins as the exchange grows.
- **Skew**: one hot key = 30%% of the fact, measured with the hot key
  IN the dim keyset (gate passes it — the exchange still sees it; AQE
  skew-split territory, see test_aqe_splits_skewed_shuffle_join) and
  OUT of the dim keyset (the gate's best case: the entire hot clump
  dies map-side and the exchange never sees it).

Selectivity is fixed by construction: dim keys are DIM_N ids sampled
from the low HIT_FRACTION of the fact keyspace, so ~15%% of fact rows
survive the gate at every decade point (matching the sf0.1 shape).

Usage:
    python tools/bench_bloom_decade.py [--mult 100] [--base 100000]
        [--runs 2] [--out BENCH_BLOOM_DECADE.json]

One JSON line per point to stdout; markdown table to stderr; exit 1
if the gate's wall ratio exceeds the linear bound at any decade.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE_FACT = 100_000
DIM_N = 5_000
KEYSPACE = 200_000  # dim covers ids [0, 30k) -> ~15% of fact rows hit
HIT_FRACTION = 0.15
HOT_SHARE = 0.30
LINEAR_BOUND_PER_DECADE = 15.0


def _write_fact(path: Path, n: int, hot_key: int | None = None) -> None:
    rng = np.random.default_rng(11)
    keys = rng.integers(0, KEYSPACE, size=n)
    if hot_key is not None:
        hot = rng.random(n) < HOT_SHARE
        keys = np.where(hot, hot_key, keys)
    pq.write_table(
        pa.table(
            {
                "f_key": pa.array(keys, pa.int64()),
                "f_qty": pa.array(rng.integers(1, 50, size=n), pa.int64()),
                "f_price": pa.array(
                    np.round(rng.uniform(1, 1000, size=n), 2), pa.float64()
                ),
            }
        ),
        path,
        row_group_size=64 * 1024,
    )


def _write_dim(path: Path) -> np.ndarray:
    """DIM_N keys from the low HIT_FRACTION of the keyspace, each with
    a ~1 KB payload so the relation is genuinely too wide to want on
    the driver (the no-broadcast regime is also forced by conf)."""
    rng = np.random.default_rng(23)
    keys = rng.choice(
        int(KEYSPACE * HIT_FRACTION), size=DIM_N, replace=False
    ).astype(np.int64)
    payload = ["x" * 1024 for _ in range(DIM_N)]
    pq.write_table(
        pa.table(
            {
                "d_key": pa.array(keys, pa.int64()),
                "d_payload": pa.array(payload, pa.string()),
            }
        ),
        path,
    )
    return keys


def _best(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def measure_point(spark, fact_path: Path, dim_path: Path, runs: int) -> dict:
    from pyspark.sql import functions as F

    from sarkac_spark.operators.sketch import _bloom_gate, bloom_gated_join

    fact = spark.read.parquet(str(fact_path))
    dim = spark.read.parquet(str(dim_path))
    n_fact = fact.count()

    gate = _bloom_gate(fact, dim, "f_key", "d_key", 262144, 4)
    survivors = gate.count()
    gate_wall = _best(lambda: gate.count(), runs)

    # exact hit count -> false positives are survivors beyond true hits
    true_hits = fact.join(
        dim.select("d_key").withColumnRenamed("d_key", "f_key"),
        "f_key",
        "left_semi",
    ).count()

    gated_wall = _best(
        lambda: bloom_gated_join(fact, dim, "f_key", "d_key").count(), runs
    )
    plain_wall = _best(
        lambda: fact.join(dim, fact["f_key"] == dim["d_key"], "inner").count(),
        runs,
    )
    return {
        "n_fact": n_fact,
        "survivors": survivors,
        "thinned_pct": round(100.0 * (1 - survivors / n_fact), 1),
        "false_positives": survivors - true_hits,
        "gate_wall": round(gate_wall, 3),
        "gated_join_wall": round(gated_wall, 3),
        "plain_join_wall": round(plain_wall, 3),
    }


def main() -> int:
    args = sys.argv[1:]

    def opt(name, default, cast=int):
        return cast(args[args.index(name) + 1]) if name in args else default

    mult = opt("--mult", 100)
    base = opt("--base", BASE_FACT)
    runs = opt("--runs", 2)
    out_path = opt("--out", "BENCH_BLOOM_DECADE.json", str)

    from sarkac_spark.session import get_spark

    spark = get_spark("bench_bloom_decade")
    # the regime the operator exists for: dim NOT broadcastable (at
    # 100 TB the dim is GBs wide). AQE stays on — its skew handling is
    # part of the measured story.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    work = Path("scale_data/bloom_decade")
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    dim_path = work / "dim.parquet"
    dim_keys = _write_dim(dim_path)

    mults = sorted({1, min(10, mult), mult})
    points, failures = [], []
    for m in mults:
        fpath = work / f"fact_x{m}.parquet"
        _write_fact(fpath, base * m)
        r = {"arm": "decade", "mult": m, **measure_point(spark, fpath, dim_path, runs)}
        points.append(r)
        print(json.dumps(r))

    # decade verdict on the GATE (the map-side-linear claim)
    for a, b in zip(points, points[1:]):
        decades = b["mult"] / a["mult"]
        bound = LINEAR_BOUND_PER_DECADE * max(1.0, decades / 10.0)
        ratio = round(b["gate_wall"] / max(a["gate_wall"], 1e-9), 2)
        b["gate_wall_ratio"] = ratio
        if ratio > bound:
            failures.append(f"gate_wall x{a['mult']}->x{b['mult']}: {ratio}x > {bound}x")

    # skew arms at the top multiplier: hot key in / out of the dim keyset
    hot_in = int(dim_keys[0])
    hot_out = KEYSPACE + 1  # guaranteed outside every dim key
    for label, hot in (("skew_hot_in_dim", hot_in), ("skew_hot_out_dim", hot_out)):
        fpath = work / f"fact_{label}.parquet"
        _write_fact(fpath, base * mults[-1], hot_key=hot)
        r = {"arm": label, "mult": mults[-1], **measure_point(spark, fpath, dim_path, runs)}
        points.append(r)
        print(json.dumps(r))

    spark.stop()
    payload = {"base_fact": base, "dim_n": DIM_N, "points": points,
               "failures": failures}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)

    print("\n| arm | mult | fact rows | thinned | fp | gate (s) | gated join (s) | plain join (s) |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|---|", file=sys.stderr)
    for r in points:
        print(
            f"| {r['arm']} | {r['mult']} | {r['n_fact']} | {r['thinned_pct']}% "
            f"| {r['false_positives']} | {r['gate_wall']} "
            f"| {r['gated_join_wall']} | {r['plain_join_wall']} |",
            file=sys.stderr,
        )
    print(json.dumps({"metric": "bloom_decade_failures", "value": len(failures)}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

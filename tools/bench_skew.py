"""Skewed-key decade measurement for the sigma/stats family (VERDICT r7
#5): the named scale-killer "full shuffle on a skewed key" was never
measured — every decade corpus is uniform-ish. This generates events
corpora where ONE event_type carries 90% of rows, at 1x and 10x, and
measures the grouped-agg sigma queries on uniform vs skewed inputs.

Why the bounds below should hold BY PLAN SHAPE: every query measured
here reduces per (event_type, window) via hash aggregation — Spark's
partial (map-side) aggregation collapses the hot key to one row per
task BEFORE the exchange, so the shuffled volume is |groups|, not
|rows|, and the hot key's reducer receives n_tasks partial rows, not
90% of the corpus. If partial aggregation were lost (e.g. an agg
rewritten through a window or a distinct), the skewed run would show a
single-reducer straggler and the skew ratio would blow past the bound —
that is exactly the regression this harness exists to catch.

Bounds: skewed wall <= SKEW_BOUND x uniform wall at the same size
(skew should be ~free for a partial-agg plan; 2.0 leaves room for
scheduler noise on local[32]); 10x skewed wall <= 15x its 1x (the
linear decade bound, same as bench_scale_decade).

Usage:
    python tools/bench_skew.py [--runs 2] [--out BENCH_SKEW.json]

One JSON line to stdout; markdown table to stderr (BASELINE.md §d).
Exit 1 on any bound violation.
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = ["sigma_scan", "multi_field_sigma", "online_sigma", "trailing_stats"]
SKEW = 0.9
SKEW_BOUND = 2.0
DECADE_BOUND = 15.0


def _run(q, spark, sf_dir, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        q(spark, sf_dir).count()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> int:
    runs = 2
    out_path = "BENCH_SKEW.json"
    args = sys.argv[1:]
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--out" in args:
        out_path = args[args.index("--out") + 1]

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)
    from gen_scale_data import generate

    dirs = {
        ("uniform", 1): "scale_data/ev_u_x1",
        ("uniform", 10): "scale_data/ev_u_x10",
        ("skewed", 1): "scale_data/ev_s_x1",
        ("skewed", 10): "scale_data/ev_s_x10",
    }
    for (kind, mult), d in dirs.items():
        generate(d, mult, event_skew=SKEW if kind == "skewed" else None)

    import __spark_entry__ as entry
    from sarkac_spark.session import get_spark

    spark = get_spark("bench_skew")
    registry = entry.queries()

    results, failures = {}, []
    for name in QUERIES:
        q = registry[name]
        w = {k: _run(q, spark, d, runs) for k, d in dirs.items()}
        skew_1x = round(w[("skewed", 1)] / max(w[("uniform", 1)], 1e-9), 2)
        skew_10x = round(w[("skewed", 10)] / max(w[("uniform", 10)], 1e-9), 2)
        decade = round(w[("skewed", 10)] / max(w[("skewed", 1)], 1e-9), 2)
        ok = (
            skew_1x <= SKEW_BOUND
            and skew_10x <= SKEW_BOUND
            and decade <= DECADE_BOUND
        )
        results[name] = {
            "uniform_x1": round(w[("uniform", 1)], 3),
            "skewed_x1": round(w[("skewed", 1)], 3),
            "uniform_x10": round(w[("uniform", 10)], 3),
            "skewed_x10": round(w[("skewed", 10)], 3),
            "skew_ratio_x1": skew_1x,
            "skew_ratio_x10": skew_10x,
            "skewed_decade_ratio": decade,
            "ok": ok,
        }
        if not ok:
            failures.append(name)
        print(f"{name}: {results[name]}", file=sys.stderr)

    spark.stop()
    with open(out_path, "w") as f:
        json.dump({"skew": SKEW, "results": results, "failures": failures}, f,
                  indent=1)
    print(json.dumps({"metric": "skew_bound_failures", "value": len(failures),
                      "unit": "queries", "skew": SKEW}))
    print("\n| query | uniform 1x | skewed 1x | uniform 10x | skewed 10x | "
          "skew ratio 1x | skew ratio 10x | skewed decade |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|---|", file=sys.stderr)
    for n, r in results.items():
        print(f"| {n} | {r['uniform_x1']} | {r['skewed_x1']} | "
              f"{r['uniform_x10']} | {r['skewed_x10']} | {r['skew_ratio_x1']}x | "
              f"{r['skew_ratio_x10']}x | {r['skewed_decade_ratio']}x |",
              file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

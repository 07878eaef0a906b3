"""Trigger-count scaling of the two streaming sigma engines.

Runs the rescan pipeline (reference-faithful: foreachBatch recomputes
stats over the whole retained store every trigger) and the keyed-state
pipeline (applyInPandasWithState, O(batch)/trigger) over an identical
file-per-trigger source at a series of trigger counts, and prints one
JSON line per scale point. This is the quantitative form of the 100x
argument: rescan per-trigger cost grows with the retained store, so its
total is superlinear in trigger count, while the stateful engine stays
linear (fixed per-trigger overhead + O(batch) work).

Kept OUT of bench.py's default path on purpose — the 100-trigger rescan
point alone runs for minutes by design (that's the finding), which would
dominate the driver's per-round bench budget. bench.py carries the
affordable scale points; the full curve lives here and in BASELINE.md.

Usage: python tools/bench_stream_scale.py [spec ...]
Each spec is a trigger count (``50``, 400 msgs/trigger like bench.py) or
``NxM`` for N triggers of M messages (``20x20000`` scales the retained
STORE at fixed trigger count — the axis that actually separates the
engines: rescan cost tracks store size, stateful tracks batch size).
Defaults: 10 25 50 100.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from sarkac_spark.session import get_spark


def main() -> None:
    specs = [
        (int(a.split("x")[0]), int(a.split("x")[1]) if "x" in a else 400)
        for a in sys.argv[1:]
    ] or [(10, 400), (25, 400), (50, 400), (100, 400)]
    spark = get_spark("sarkac_stream_scale")
    # (bench.stream_pipeline_bench self-warms once per session with a
    # discarded pair, so the first scale point is not bent by one-time
    # streaming init)
    for n, m in specs:
        bench.STREAM_BATCHES = n
        bench.STREAM_MSGS_PER_BATCH = m
        out = bench.stream_pipeline_bench(spark)
        rescan = out[f"stream_rescan_{n}x{m}"]
        stateful = out[f"stream_stateful_{n}x{m}"]
        print(
            json.dumps(
                {
                    "triggers": n,
                    "msgs_per_trigger": m,
                    "rescan_sec": rescan,
                    "stateful_sec": stateful,
                    "rescan_per_trigger": round(rescan / n, 3),
                    "stateful_per_trigger": round(stateful / n, 3),
                    "speedup": round(rescan / stateful, 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

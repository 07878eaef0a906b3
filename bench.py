"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing methodology: each query is planned and executed to completion via
a count-ish action (``.foreach(noop)`` would add Python; we use
``df.write.format("noop")`` which executes the full plan JVM-side with no
sink cost). Session startup is excluded; one warm-up pass of the flagship
primes JVM/codegen.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod
from sarkac_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("sarkac_spark_bench")

    qs = entrymod.queries()

    # warm-up: JVM JIT + codegen + parquet footer caches
    try:
        next(iter(qs.values()))(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    # min of 2 runs per query: wall-clock on a shared box is noisy (+/-20%
    # observed); the min is the stable, load-independent signal
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

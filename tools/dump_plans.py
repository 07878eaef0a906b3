"""Dump ``.explain("formatted")`` for registry queries to files.

The optimization-round deliverable: ``plans/r12/<query>_<tag>.txt`` for
every query touched (and, with no names given, the whole registry).
Static planning only — nothing executes, so the full sweep is cheap and
safe to run next to other sessions.

Usage:
    python tools/dump_plans.py <tag> [query ...]        # default sf0.1
    SPARK_GRAFT_SF_DIR=... python tools/dump_plans.py before minhash_recall
"""

from __future__ import annotations

import os
import sys
from contextlib import redirect_stdout
from io import StringIO
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from sarkac_spark.session import get_spark

OUT_ROOT = Path(__file__).resolve().parent.parent / "plans"


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: dump_plans.py <tag> [query ...]", file=sys.stderr)
        return 2
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = OUT_ROOT / os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13")
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("dump_plans")
    qs = entrymod.queries()
    n = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            text = f"ERROR building/explaining {name}: {e}\n"
        (out_dir / f"{name}_{tag}.txt").write_text(text)
        n += 1
    print(f"wrote {n} plans to {out_dir} (tag={tag}, sf_dir={sf_dir})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Mechanical per-query bench drift attribution (VERDICT r10 ask #3).

Consumes two ``BENCH_LOCAL_full.json``-format maps (old, new) and
reports every wall mover beyond a threshold, with each mover's
physical-plan digest (``sarkac_spark.plans.plan_digest``) so "the plan
changed" vs "box drift on an unchanged plan" is one command:

- digest present in BOTH files and EQUAL     -> box drift (plan pinned)
- digest present in both and DIFFERENT       -> plan changed (attribute!)
- digest missing from the old file (pre-r11) -> unattributable by plan;
  the tool prints the new digest so the NEXT diff has both sides.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--threshold 0.30]
        [--out report.md]

Exit-code contract (r11 ask #3): a mover whose digest CHANGED is a
plan regression and exits 1 — loud failure; box drift on a pinned
plan is report-only (exit 0). Intentional plan changes are
acknowledged with ``--allow-plan-changes`` (report stays, exit 0).
The anti-pattern budget gate lives in tests/test_plan_sweep.py.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        raise SystemExit(f"{path}: not a bench map (no 'queries' key)")
    return d


def diff(old: dict, new: dict, threshold: float) -> dict:
    oq, nq = old["queries"], new["queries"]
    od = old.get("plan_digests", {})
    nd = new.get("plan_digests", {})
    movers = []
    for name in sorted(set(oq) & set(nq)):
        a, b = float(oq[name]), float(nq[name])
        if a <= 0:
            continue
        ratio = b / a
        if abs(ratio - 1.0) < threshold:
            continue
        d_old, d_new = od.get(name), nd.get(name)
        if d_old is not None and d_new is not None:
            verdict = "PLAN-CHANGED" if d_old != d_new else "box-drift (plan pinned)"
        elif d_new is not None:
            verdict = "no old digest (pre-r11 record); new digest recorded"
        else:
            verdict = "no digests (streaming entry or digest failed)"
        movers.append(
            {
                "query": name,
                "old_sec": a,
                "new_sec": b,
                "ratio": round(ratio, 3),
                "digest_old": d_old,
                "digest_new": d_new,
                "verdict": verdict,
            }
        )
    movers.sort(key=lambda m: -abs(m["ratio"] - 1.0))
    return {
        "threshold": threshold,
        "old_total": old.get("value"),
        "new_total": new.get("value"),
        "n_common": len(set(oq) & set(nq)),
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
        "movers": movers,
    }


def render(rep: dict, old_path: str, new_path: str) -> str:
    lines = [
        f"# bench diff: {Path(old_path).name} -> {Path(new_path).name}",
        "",
        f"totals: {rep['old_total']} s -> {rep['new_total']} s "
        f"({rep['n_common']} common queries, threshold "
        f"±{int(rep['threshold'] * 100)}%)",
    ]
    if rep["added"]:
        lines.append(f"added: {', '.join(rep['added'])}")
    if rep["removed"]:
        lines.append(f"removed: {', '.join(rep['removed'])}")
    lines.append("")
    if not rep["movers"]:
        lines.append("No movers beyond the threshold.")
    else:
        lines.append("| query | old s | new s | ratio | plan | verdict |")
        lines.append("|---|---|---|---|---|---|")
        for m in rep["movers"]:
            plan = (
                f"{m['digest_old']} -> {m['digest_new']}"
                if m["digest_old"] and m["digest_old"] != m["digest_new"]
                else (m["digest_new"] or "—")
            )
            lines.append(
                f"| {m['query']} | {m['old_sec']:.2f} | {m['new_sec']:.2f} "
                f"| {m['ratio']:.2f}x | `{plan}` | {m['verdict']} |"
            )
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.30)
    ap.add_argument("--out", default=None, help="also write markdown here")
    ap.add_argument(
        "--allow-plan-changes",
        action="store_true",
        help="acknowledge intentional plan changes: report, exit 0",
    )
    args = ap.parse_args()
    rep = diff(load(args.old), load(args.new), args.threshold)
    md = render(rep, args.old, args.new)
    print(md)
    if args.out:
        Path(args.out).write_text(md)
    changed = [m["query"] for m in rep["movers"] if m["verdict"] == "PLAN-CHANGED"]
    if changed and not args.allow_plan_changes:
        print(
            f"PLAN-CHANGED movers: {', '.join(changed)} — plan regression "
            "is a loud failure (re-run with --allow-plan-changes if "
            "intentional)",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

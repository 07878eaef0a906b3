"""Assemble BENCH_STREAM_DECADE.json from per-arm runs.

The three arms are timing benches that must run alone; when a run dies
mid-arm (the x100 stateful seed OOM'd the HDFS-backed state store
before the RocksDB rerun) the completed arms' points are still valid —
this tool merges per-arm JSONL/JSON fragments into the canonical
record, recomputing the per-arm verdict ratios (biggest/smallest
per-trigger median).

Usage: python tools/merge_stream_decade.py out.json frag1 [frag2 ...]
Fragments: either a bench --out JSON ({"points": [...]}) or a JSONL of
point lines.
"""

from __future__ import annotations

import json
import sys


def load_points(path: str) -> list[dict]:
    with open(path) as f:
        text = f.read().strip()
    if text.startswith("{") and '"points"' in text.splitlines()[0] or text.startswith("{\n"):
        try:
            doc = json.loads(text)
            if isinstance(doc, dict) and "points" in doc:
                return doc["points"]
        except json.JSONDecodeError:
            pass
    return [json.loads(line) for line in text.splitlines() if line.strip()]


def main() -> int:
    out, frags = sys.argv[1], sys.argv[2:]
    points: list[dict] = []
    seen = set()
    for frag in frags:
        for p in load_points(frag):
            key = (p["arm"], p.get("mult"), p.get("n_keys"))
            if key in seen:
                continue
            seen.add(key)
            points.append(p)
    order = {"curator": 0, "stateful": 1, "session": 2}
    points.sort(key=lambda p: (order.get(p["arm"], 9), p.get("mult") or 0,
                               p.get("n_keys") or 0))
    verdict = {}
    for a in order:
        pts = [p for p in points if p["arm"] == a and p.get("per_trigger_median")]
        if len(pts) >= 2:
            verdict[f"{a}_per_trigger_ratio"] = round(
                pts[-1]["per_trigger_median"] / max(pts[0]["per_trigger_median"], 1e-9), 2
            )
    with open(out, "w") as f:
        json.dump({"points": points, "verdict": verdict}, f, indent=1)
    print(json.dumps({"out": out, **verdict}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

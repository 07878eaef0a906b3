"""One-command corpus-quality audit — the pre-launch QA dashboard a
100 TB pipeline operator runs before committing a training run: ANN
recall against exact ground truth (is the similarity index trustworthy?),
MinHash LSH banding recall (is near-dup candidate generation missing
pairs?), per-source unigram KL drift (which sources diverge from the
corpus mixture?), embedding health (norm/NaN/zero-vector hygiene),
the classifier-vs-gopher confusion matrix (does the distilled quality
gate still track its teacher?), the Zipf fit (is the term
distribution still natural-corpus shaped?), PQ recall (are the
4-bit quantized codes still trustworthy for retrieval?), the IVF
refit decision (is the bucketed index's occupancy healthy, or is a
centroid re-fit due?), and PQ distortion (is the codebooks' k-means
cost trending up — the codebook-refit signal?).

All nine are existing registry queries (each independently verified by
the DuckDB oracle gate); this tool just runs them at one scale factor
and emits ONE JSON object so the result can be diffed, stored next to
the snapshot, or gated on in CI.

Usage: python tools/audit_report.py [sf_dir] [out.json]
  sf_dir defaults to /root/testdata/sf0.001; prints compact JSON to
  stdout and, when given, writes it to out.json too.

``--scale`` renders the full 100 TB scale-evidence table instead —
the decade/skew/thinning/stream numbers BASELINE.md §d assembles by
hand, read from the committed BENCH_SCALE_* / BENCH_SKEW /
BENCH_STREAM_DECADE records (no Spark session; one command, one
markdown table + verdict line).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# each audit is aggregate-sized by construction: recall scalars,
# per-source drift, health counters, a 4-cell confusion matrix, a
# 1-row Zipf fit
AUDITS = [
    "ann_recall",
    "minhash_recall",
    "unigram_kl",
    "embedding_health",
    "classifier_confusion",
    "zipf_fit",
    "pq_recall",
    "ivf_refit_decision",
    "pq_distortion",
]

# the committed scale-evidence records, in BASELINE.md §d order:
# (file, decade label). Every file shares the bench_scale_decade
# schema {multiplier, results: {query: {class, wall_x1, wall_xN,
# wall_ratio, rows_ratio, ok}}, failures}; BENCH_SKEW and
# BENCH_STREAM_DECADE have their own shapes rendered below.
SCALE_RECORDS = [
    ("BENCH_SCALE.json", "10x"),
    ("BENCH_SCALE_NEW.json", "10x"),
    ("BENCH_SCALE_R6B.json", "10x"),
    ("BENCH_SCALE_100x.json", "100x"),
    ("BENCH_SCALE_NEW_100x.json", "100x"),
    ("BENCH_SCALE_R7_100x.json", "100x"),
    ("BENCH_SCALE_R7B_100x.json", "100x"),
    ("BENCH_SCALE_SQRTN_100x.json", "100x"),
    ("BENCH_SCALE_MM_100x.json", "100x"),
]


def render_scale(repo: Path) -> tuple[str, bool]:
    """Render the one-command 100 TB evidence table: every decade /
    skew / thinning / stream-store-growth record BASELINE.md §d
    assembles by hand, read straight from the committed JSONs. Returns
    (markdown, all_ok)."""
    lines: list[str] = ["# 100 TB scale evidence (committed records)", ""]
    ok_all = True

    lines += [
        "## Batch decades (wall ratio at Nx data vs class bound)",
        "",
        "| query | class | decade | wall 1x (s) | wall Nx (s) | wall ratio | rows ratio | ok |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for fname, decade in SCALE_RECORDS:
        p = repo / fname
        if not p.exists():
            continue
        rec = json.loads(p.read_text())
        mult = rec.get("multiplier", int(decade.rstrip("x")))
        wall_hi = f"wall_x{mult}"
        for q, r in rec.get("results", {}).items():
            ok = r.get("ok", True)
            ok_all &= bool(ok)
            lines.append(
                f"| {q} | {r.get('class', '?')} | {mult}x "
                f"| {r.get('wall_x1', '—')} | {r.get(wall_hi, '—')} "
                f"| {r.get('wall_ratio', '—')}x | {r.get('rows_ratio', '—')}x "
                f"| {'ok' if ok else 'VIOLATION'} |"
            )
        for f in rec.get("failures", []):
            ok_all = False
            lines.append(f"| {f} | — | {mult}x | — | — | — | — | FAILED |")

    skew = repo / "BENCH_SKEW.json"
    if skew.exists():
        rec = json.loads(skew.read_text())
        lines += [
            "",
            f"## Skewed-key decade (hot key = {rec.get('skew', '?')} of rows)",
            "",
            "| query | skew ratio 1x | skew ratio 10x | skewed decade | ok |",
            "|---|---|---|---|---|",
        ]
        for q, r in rec.get("results", {}).items():
            ok = r.get("ok", True)
            ok_all &= bool(ok)
            lines.append(
                f"| {q} | {r.get('skew_ratio_x1', '—')}x "
                f"| {r.get('skew_ratio_x10', '—')}x "
                f"| {r.get('skewed_decade_ratio', '—')}x "
                f"| {'ok' if ok else 'VIOLATION'} |"
            )

    bloom = repo / "BENCH_BLOOM_DECADE.json"
    if bloom.exists():
        rec = json.loads(bloom.read_text())
        lines += [
            "",
            "## Runtime-filter join (bloom gate): fact decade + skew",
            "",
            "| arm | mult | fact rows | thinned | false pos | gate (s) | gated join (s) | plain join (s) |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for p_ in rec.get("points", []):
            lines.append(
                f"| {p_['arm']} | {p_['mult']}x | {p_['n_fact']} "
                f"| {p_['thinned_pct']}% | {p_['false_positives']} "
                f"| {p_['gate_wall']} | {p_['gated_join_wall']} "
                f"| {p_['plain_join_wall']} |"
            )
        for f in rec.get("failures", []):
            ok_all = False
            lines.append(f"| {f} | — | — | — | — | — | — | FAILED |")

    stream = repo / "BENCH_STREAM_DECADE.json"
    if stream.exists():
        rec = json.loads(stream.read_text())
        lines += [
            "",
            "## Composed streaming pipelines: per-trigger wall vs committed-store size",
            "",
            "| arm | store axis | per-trigger median (s) | trigger walls (s) |",
            "|---|---|---|---|",
        ]
        for p_ in rec.get("points", []):
            axis = (
                f"{p_['n_keys']} open sessions"
                if p_["arm"] == "session"
                else f"seed x{p_['mult']} ({p_.get('n_committed_seed', '?')} docs)"
            )
            lines.append(
                f"| {p_['arm']} | {axis} | {p_['per_trigger_median']} "
                f"| {p_['trigger_walls']} |"
            )
        v = rec.get("verdict", {})
        for k, ratio in v.items():
            bound_ok = ratio <= 2.0
            ok_all &= bound_ok
            lines.append("")
            lines.append(
                f"- **{k} = {ratio}x** across the store decade "
                f"({'ok: per-trigger cost is O(batch), not O(store)' if bound_ok else 'VIOLATION: O(store) term present'})"
            )

    lines += [
        "",
        f"**Verdict: {'0 violations — every committed scale record holds its bound' if ok_all else 'VIOLATIONS PRESENT — see rows above'}.**",
    ]
    return "\n".join(lines), ok_all


def run_audits(spark, sf_dir: str, audits: list[str] | None = None) -> dict:
    """Run the audit queries and return the report dict: per-audit rows
    (these queries are aggregate-sized by construction — recall scalars,
    per-source drift, health counters — so collecting them is bounded
    whatever the corpus size) plus wall seconds per audit."""
    from sarkac_spark.queries import all_queries

    qs = all_queries()
    report: dict = {"sf_dir": sf_dir, "audits": {}}
    for name in audits or AUDITS:
        t0 = time.perf_counter()
        rows = [r.asDict(recursive=True) for r in qs[name](spark, sf_dir).collect()]
        report["audits"][name] = {
            "rows": rows,
            "n_rows": len(rows),
            "seconds": round(time.perf_counter() - t0, 3),
        }
    return report


def main() -> int:
    if "--scale" in sys.argv:
        md, ok = render_scale(Path(__file__).resolve().parent.parent)
        print(md)
        return 0 if ok else 1

    from sarkac_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("sarkac_audit_report")
    try:
        report = run_audits(spark, sf_dir)
    finally:
        spark.stop()
    blob = json.dumps(report, separators=(",", ":"), default=str)
    print(blob)
    if out_path:
        Path(out_path).write_text(blob)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

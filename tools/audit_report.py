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

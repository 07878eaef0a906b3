"""Scale-decade measurement: run the dedup/ANN/sketch headliners at 1x
and 10x corpus size and check the measured growth against each
operator's designed complexity class.

Every 100 TB claim in this repo (band caps, single-scan shapes,
one-shuffle budgets) was plan-asserted; this converts "designed for
100x" into data for one decade. Both corpora come from the SAME
generator (tools/gen_scale_data.py, shape-matched to the driver's
sf0.1), so the ratio isolates scaling from distribution drift.

Classes and asserted wall-ratio bounds for a 10x decade (generous —
the point is catching an accidental quadratic, which shows up as
>=60x, not flaking on scheduler noise; fixed per-query overhead on
local[32] keeps real ratios well below the bound):

- linear  (sketches, exact dedup, fixed-query-set ANN): wall <= 15x,
  output rows <= 15x.
- nlogn   (banded dedup, windowed span/winnow): wall <= 20x,
  output rows <= 15x (pair counts are linear by the planted dup rate —
  a quadratic candidate explosion trips this long before wall).
- allpairs (embedding_neardup's blocked gram audit, semantic_dedup's
  within-bucket compare): O(n^2/buckets) BY DESIGN — measured and
  reported, not bounded; the scale paths for these workloads are
  lsh_topk / ivf_topk / the capped banded dedups above.

For the second decade (--mult 100, 500k docs), pass --queries to run
the core subset — the full 21-query sweep at 100x is wall-prohibitive
for the all-pairs arms, and the point is the banded/sketch paths.

Usage:
    python tools/bench_scale_decade.py [--mult 10] [--out BENCH_SCALE.json]
        [--queries name1,name2,...] [--runs 2]

Writes one JSON line to stdout and a markdown table to stderr (paste
into BASELINE.md). Exit 1 if any bounded query exceeds its class bound.
"""

from __future__ import annotations

import json
import os
import sys
import time

CLASSES = {
    "linear": [
        "dedup_exact", "cms_term_counts", "hll_distinct", "hist_quantiles",
        "bloom_vocab", "corpus_overlap", "quantize_audit",
        "cosine_topk", "ivf_topk", "lsh_topk",
        "dup_ngram_frac", "quality_classifier", "snapshot_diff",
        "bpe_merges", "zipf_fit", "delta_curation",
        "pq_assign", "pq_topk", "ivfpq_topk", "hash_embed",
        "mixture_realize", "classifier_confusion", "classifier_calibration",
        "bpe_tokenize",
        # round-7: fixed-query-set retrieval + per-doc scoring — all
        # single-scan / broadcast-dim shapes
        "pq_recall", "pq_rerank", "bpe_apply", "text_ivfpq",
        "ivf_refit_decision",
        "dedup_signatures", "bpe_fertility",
    ],
    "nlogn": [
        "dedup_minhash", "incremental_minhash", "ngram_jaccard",
        "dedup_simhash", "span_dedup", "winnow_pairs",
        "dedup_canonical", "dedup_clusters", "decontamination",
        "contamination_spans", "cluster_split",
        "curation_funnel",  # its dedup stage is the banded minhash
        "dedup_phash",  # r8: banded image near-dup (planted pair per 2 docs)
        "dedup_audio",  # r8: banded audio near-dup, same pairing machinery
        "dedup_video",  # r8: frame-sequence near-dup, frame-major bands
    ],
    "allpairs": ["embedding_neardup", "semantic_dedup"],
}
WALL_BOUND = {"linear": 15.0, "nlogn": 20.0}
# pair/row fanout bounds: the quadratic signature at 10x is >=60x, so
# these stay generous. nlogn pair counts are planted-dup driven and
# Poisson-noisy at small base counts (incremental_minhash has 4 pairs at
# 1x — one extra threshold-crosser is +25%), hence 30x not 15x.
ROWS_BOUND = {"linear": 15.0, "nlogn": 30.0}
# dictionary-shaped outputs scale with the term vocabulary, not with
# pair fanout — vocab growth is a corpus property (Heaps) that the
# generator intentionally scales, so rows are reported, not bounded;
# the quadratic hazard for these queries is wall, which stays bounded.
DICT_OUTPUT = {"bloom_vocab"}


def _run(q, spark, sf_dir, runs: int = 2) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(runs):  # min-of-N, same protocol as bench.py
        t0 = time.monotonic()
        rows = q(spark, sf_dir).count()
        best = min(best, time.monotonic() - t0)
    return best, rows


def _scaled_nlist_arm(spark, sf_dir: str, runs: int) -> dict:
    """The nlist ~ sqrt(n) IVF-PQ decade arm (VERDICT r7 #2): the
    registered ivfpq_topk runs with a FIXED 8-centroid IVF and
    nprobe=2, so its probed fraction is constant and ADC work grows
    linearly with the corpus (measured 31x wall at 100x). Real IVF
    sizes nlist ~ sqrt(n) with nprobe fixed, making probed work grow
    ~sqrt(n) — but that only pays off against a PREBUILT index (the
    production shape: built once / incrementally by ivf_maintenance,
    queried many times). This arm measures both legs separately:

    - build: ivfpq_store (assignment is one corpus scan x nlist argmax,
      so build work is ~n*sqrt(n) — REPORTED, not bounded; it amortizes
      across queries and is incremental in production).
    - query: ivfpq_query_store over the bucket-partitioned store with
      partition pruning — the leg that must stay sublinear.

    Centroids are the fit-free first-nlist vectors (the N_CENTROIDS
    convention); queries are vec_id < 10, as in the registered query.
    """
    import math
    import shutil

    from pyspark.sql import functions as F

    from sarkac_spark.operators.pq import (
        PQ_CODEBOOKS,
        ivfpq_query_store,
        ivfpq_store,
    )
    from sarkac_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    nlist = max(8, math.isqrt(n))
    cents = e.filter(F.col("vec_id") < nlist).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    path = os.path.join(sf_dir, "ivfpq_store_sqrtn")
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.monotonic()
    ivfpq_store(e, PQ_CODEBOOKS, cents).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(path)
    build_wall = time.monotonic() - t0
    store = spark.read.parquet(path)
    queries = e.filter(F.col("vec_id") < 10)
    best, rows = float("inf"), 0
    for _ in range(runs):
        t0 = time.monotonic()
        rows = ivfpq_query_store(
            store, queries, cents, PQ_CODEBOOKS, k=3, nprobe=2
        ).count()
        best = min(best, time.monotonic() - t0)
    return {
        "n_vecs": n, "nlist": nlist,
        "build_wall": round(build_wall, 3),
        "query_wall": round(best, 3), "query_rows": rows,
    }


def main() -> int:
    mult = 10
    out_path = "BENCH_SCALE.json"
    only: set[str] | None = None
    runs = 2
    args = sys.argv[1:]
    if "--mult" in args:
        mult = int(args[args.index("--mult") + 1])
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    if "--queries" in args:
        only = set(args[args.index("--queries") + 1].split(","))
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root: __spark_entry__
    sys.path.insert(0, here)
    from gen_scale_data import generate

    d1, d10 = "scale_data/x1", f"scale_data/x{mult}"
    generate(d1, 1)
    generate(d10, mult)

    import __spark_entry__ as entry
    from sarkac_spark.queries import fit_queries
    from sarkac_spark.session import get_spark

    spark = get_spark("bench_scale_decade")
    # fit_queries: bpe_tokenize lives on the pytest-only fit surface but
    # keeps its decade row here (wall-vs-corpus is measurable without an
    # oracle)
    queries = {**fit_queries(), **entry.queries()}

    results, failures = {}, []
    if "--scaled-nlist" in args:
        a1 = _scaled_nlist_arm(spark, d1, runs)
        aN = _scaled_nlist_arm(spark, d10, runs)
        qratio = round(aN["query_wall"] / max(a1["query_wall"], 1e-9), 2)
        bratio = round(aN["build_wall"] / max(a1["build_wall"], 1e-9), 2)
        # the query leg is the bounded one: with nlist ~ sqrt(n) and a
        # pruned store scan it must stay FAR below linear at any decade
        # (VERDICT r7 #2 gate: < 15x at 100x)
        ok = qratio <= 15.0
        results["ivfpq_query_sqrtn"] = {
            "class": "sqrtn", "wall_x1": a1["query_wall"],
            f"wall_x{mult}": aN["query_wall"], "wall_ratio": qratio,
            "rows_x1": a1["query_rows"], f"rows_x{mult}": aN["query_rows"],
            "rows_ratio": round(aN["query_rows"] / max(a1["query_rows"], 1), 2),
            "nlist_x1": a1["nlist"], f"nlist_x{mult}": aN["nlist"], "ok": ok,
        }
        if not ok:
            failures.append("ivfpq_query_sqrtn")
        results["ivfpq_build_sqrtn"] = {
            "class": "build", "wall_x1": a1["build_wall"],
            f"wall_x{mult}": aN["build_wall"], "wall_ratio": bratio,
            "rows_x1": a1["n_vecs"], f"rows_x{mult}": aN["n_vecs"],
            "rows_ratio": round(aN["n_vecs"] / max(a1["n_vecs"], 1), 2),
            "nlist_x1": a1["nlist"], f"nlist_x{mult}": aN["nlist"],
        }
        for n in ("ivfpq_query_sqrtn", "ivfpq_build_sqrtn"):
            print(f"{n}: {results[n]}", file=sys.stderr)
    for cls, names in CLASSES.items():
        for name in names:
            if only is not None and name not in only:
                continue
            q = queries[name]
            w1, r1 = _run(q, spark, d1, runs)
            wN, rN = _run(q, spark, d10, runs)
            wall_ratio = round(wN / max(w1, 1e-9), 2)
            rows_ratio = round(rN / max(r1, 1), 2)
            rec = {
                "class": cls, "wall_x1": round(w1, 3),
                f"wall_x{mult}": round(wN, 3), "wall_ratio": wall_ratio,
                "rows_x1": r1, f"rows_x{mult}": rN, "rows_ratio": rows_ratio,
            }
            if cls in WALL_BOUND:
                # bounds are calibrated per decade; scale linearly in the
                # multiplier beyond 10x (a quadratic at 100x shows ~6000x)
                scale = max(1.0, mult / 10.0)
                ok = wall_ratio <= WALL_BOUND[cls] * scale and (
                    name in DICT_OUTPUT or rows_ratio <= ROWS_BOUND[cls] * scale
                )
                rec["ok"] = ok
                if not ok:
                    failures.append(name)
            results[name] = rec
            print(f"{name}: {rec}", file=sys.stderr)

    spark.stop()
    payload = {"multiplier": mult, "results": results, "failures": failures}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"metric": "scale_decade_failures", "value": len(failures),
                      "unit": "queries", "multiplier": mult}))

    # markdown table for BASELINE.md
    print(f"\n| query | class | wall 1x (s) | wall {mult}x (s) | wall ratio | rows 1x | rows {mult}x | rows ratio |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|---|", file=sys.stderr)
    for n, r in sorted(results.items(), key=lambda kv: (kv[1]["class"], kv[0])):
        print(f"| {n} | {r['class']} | {r['wall_x1']} | {r[f'wall_x{mult}']} | "
              f"{r['wall_ratio']}x | {r['rows_x1']} | {r[f'rows_x{mult}']} | "
              f"{r['rows_ratio']}x |", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

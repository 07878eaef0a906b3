"""PCA/OPQ-before-PQ distortion probe across anisotropy regimes
(VERDICT r11 ask #4).

The r11 null result (1.0075x on the near-isotropic synthetics,
eigenvalue spread 4.2x) was honest but measured only in the regime
where rotation CANNOT help. This probe re-runs the comparison on
corpora shaped to the documented clip/text-encoder regime (100-1000x
eigenvalue spread, principal axes hidden behind a random orthogonal
mix so they do NOT align with PQ's fixed subspace split):

    arm "raw"      : fit_pq_codebooks + pq_distortion on the vectors
    arm "rotated"  : PCA-rotate first (pca_rotation + apply_rotation)
    arm "balanced" : PCA-rotate with OPQ's parametric eigenvalue
                     allocation (balanced_subspace_order) before the
                     subspace split

and records, per anisotropy level: the MEASURED eigenvalue spread and
off-diagonal/diagonal covariance mass (the decision-rule inputs), each
arm's total squared quantization error (exact integer micro-units),
and the raw/rotated + raw/balanced improvement ratios.

Usage:
    python tools/probe_pca_pq.py [--levels none,100,1000] [--n 2000]
        [--out BENCH_PCA_PQ.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from gen_scale_data import DIM, gen_embeddings  # noqa: E402

from sarkac_spark.operators.pq import (  # noqa: E402
    PQ_M,
    fit_pq_codebooks,
    pq_distortion,
)
from sarkac_spark.operators.similarity import (  # noqa: E402
    apply_rotation,
    balanced_subspace_order,
    pca_rotation,
)
from sarkac_spark.session import get_spark  # noqa: E402


def _total(df, codebooks, vec_col):
    rows = pq_distortion(df, codebooks, vec_col=vec_col).collect()
    return int(sum(r["total_sqdist_micro"] for r in rows))


def probe_level(spark, level: float | None, n: int, seed: int) -> dict:
    table = gen_embeddings(n, np.random.default_rng(seed), anisotropy=level)
    vecs = np.array(
        [np.asarray(v, dtype=np.float64) for v in table["embedding"].to_pylist()]
    )
    pdf = table.to_pandas()
    df = spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    ).cache()
    df.count()

    # decision-rule inputs, measured (numpy is exact enough here; the
    # distributed twin is embedding_covariance — oracle-checked)
    cov = np.cov(vecs.T, bias=True)
    eig = np.linalg.eigvalsh(cov)
    spread = float(eig[-1] / max(eig[0], 1e-300))
    diag = np.abs(np.diag(cov)).sum()
    off = np.abs(cov).sum() - diag
    offdiag_mass = float(off / diag)

    raw = _total(df, fit_pq_codebooks(df), "embedding")

    comps, mu = pca_rotation(df)
    rot = apply_rotation(df, comps, mu).cache()
    rot.count()
    rotated = _total(rot, fit_pq_codebooks(rot, vec_col="rotated"), "rotated")

    # eigenvalues in the components' (descending) order = variances of
    # the rotated axes
    evals_desc = sorted((float(x) for x in eig), reverse=True)
    order = balanced_subspace_order(evals_desc, PQ_M)
    comps_b = [comps[p] for p in order]
    bal = apply_rotation(df, comps_b, mu).cache()
    bal.count()
    balanced = _total(bal, fit_pq_codebooks(bal, vec_col="rotated"), "rotated")

    df.unpersist()
    rot.unpersist()
    bal.unpersist()
    return {
        "anisotropy_target": level,
        "n_vecs": n,
        "dim": DIM,
        "measured_eig_spread": round(spread, 2),
        "measured_offdiag_mass": round(offdiag_mass, 4),
        "total_sqdist_micro": {
            "raw": raw,
            "rotated": rotated,
            "balanced": balanced,
        },
        "improvement": {
            "raw_over_rotated": round(raw / max(rotated, 1), 4),
            "raw_over_balanced": round(raw / max(balanced, 1), 4),
        },
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="none,100,1000")
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out", default="BENCH_PCA_PQ.json")
    args = ap.parse_args()
    levels = [
        None if s.strip() == "none" else float(s) for s in args.levels.split(",")
    ]
    spark = get_spark("probe_pca_pq")
    results = [probe_level(spark, lvl, args.n, args.seed) for lvl in levels]
    spark.stop()
    out = {"probe": "pca_before_pq", "pq_m": PQ_M, "levels": results}
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

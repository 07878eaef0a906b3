"""Query registry — the driver-facing catalogue.

Each domain module contributes ``QUERIES`` (name -> (spark, sf_dir) ->
DataFrame) and ``ORACLE`` (name -> DuckDB SQL). ``__spark_entry__``
re-exports the merged dicts. Naming rule: every aggregate/computed column
is aliased identically in the Spark plan and the oracle SQL (the driver
sorts columns by name before hashing).
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from sarkac_spark.queries import control, core, llm, ml, relational

# Registry order is sweep order under the driver (which caps each round's
# sweep at 50 of 80+ queries). The ordering is SELF-MAINTAINING: at
# registry-build time we parse the repo's own CORRECTNESS_r*.json driver
# records and put every query that has never had a green driver row first
# (in module order among themselves), then the rest. Two rounds in a row a
# hand-frozen priority list left a new-that-round query without a driver
# row (round 2: five round-2 queries; round 3: ivf_probe2) — deriving the
# head from the driver's own records makes that class of gap impossible:
# a brand-new query has no CORRECTNESS row, so it sorts first by
# construction.
_MODULES = [relational, control, ml, core, llm]

# Static fallback ordering, used only when no CORRECTNESS_r*.json parses
# (e.g. a fresh clone without driver records). ivf_probe2 leads: the one
# registered query without a green driver row as of round 3 (VERDICT.md
# round 3, gap #1).
_PRIORITY = [
    "ivf_probe2",        # added post-freeze in r03 — never driver-swept
    "doc_cube",
    "inverted_index",
    "ann_recall",
    "doc_lm_score",
    "multimodal_payload",
    "pack_sequences",
    "span_dedup",
    "temperature_sample",
    "vocab_coverage",
    "semantic_dedup",
    "gopher_rules",
    "unigram_kl",
]


def driver_green_rounds(root: Path | None = None) -> dict[str, int]:
    """name -> LATEST round whose CORRECTNESS_r{N}.json has a green driver
    row for it, under ``root`` (default: this repo's top level). Green =
    hash_match is true, or the row is the documented rows-only check
    (err == "no_oracle") — either way the driver has proven it that round.
    Keeping the round (not a flat set) is what lets ``sweep_order`` rotate:
    with every query green, ordering the tail least-recently-proven-first
    means each 50-slot driver sweep refreshes the 50 stalest proofs instead
    of re-proving the same 50 forever (VERDICT.md round 4, gap #1)."""
    root = root or Path(__file__).resolve().parents[2]
    green: dict[str, int] = {}
    try:
        records = sorted(root.glob("CORRECTNESS_r*.json"))
    except OSError:
        return green
    for path in records:
        m = re.search(r"CORRECTNESS_r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True or row.get("err") == "no_oracle":
                green[name] = max(green.get(name, 0), rnd)
    return green


def driver_green_queries(root: Path | None = None) -> set[str]:
    """Flat-set view of ``driver_green_rounds`` (names with any green
    driver row)."""
    return set(driver_green_rounds(root))


def sweep_order(names, green: set[str] | dict[str, int] | None = None) -> list[str]:
    """Driver sweep order: never-driver-green queries first (module order
    preserved among themselves), then the green tail ordered OLDEST latest
    green round first (module order within a round) — so the driver's
    capped per-round sweep always refreshes the least-recently-proven
    proofs. A flat set for ``green`` (no round info) preserves module
    order within the tail. Falls back to the static _PRIORITY head when
    no driver records exist at all."""
    names = list(names)
    if green is None:
        green = driver_green_rounds()
    if isinstance(green, set):
        green = dict.fromkeys(green, 0)
    if green:
        pos = {n: i for i, n in enumerate(names)}
        head = [n for n in names if n not in green]
        tail = sorted(
            (n for n in names if n in green), key=lambda n: (green[n], pos[n])
        )
        return head + tail
    head = [n for n in _PRIORITY if n in names]
    return head + [n for n in names if n not in head]


def _merged(attr: str) -> dict:
    out: dict = {}
    for m in _MODULES:
        part = getattr(m, attr)
        overlap = out.keys() & part.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(part)
    return {k: out[k] for k in sweep_order(out)}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _merged("QUERIES")


def all_oracle_sql() -> dict[str, str]:
    return _merged("ORACLE")


def fit_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Pytest-only iterative-fit surface: real MLlib training runs plus
    the BPE merge-training loop — genuinely non-SQL-expressible, so they
    are deliberately NOT driver-registered (a driver sample of a
    no-oracle entry records ``err: no_oracle``; the registry must stay
    100% oracle-backed). Each fit's scoring stage IS registered with a
    full value-hash oracle (kmeans_scoring / lsh_scoring /
    minhash_scoring / bpe_apply), and the registered iterative-fit
    coverage is ``lloyd_kmeans``. Smoke-checked (runs, rows, stable
    schema) in tests/test_utilities.py."""
    out: dict = {}
    for m in _MODULES:
        part = getattr(m, "FIT_QUERIES", {})
        overlap = out.keys() & part.keys()
        if overlap:
            raise ValueError(f"duplicate fit query names: {overlap}")
        out.update(part)
    return out

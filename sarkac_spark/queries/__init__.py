"""Query registry — the driver-facing catalogue.

Each domain module contributes ``QUERIES`` (name -> (spark, sf_dir) ->
DataFrame) and ``ORACLE`` (name -> DuckDB SQL). ``__spark_entry__``
re-exports the merged dicts. Naming rule: every aggregate/computed column
is aliased identically in the Spark plan and the oracle SQL (the driver
sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sarkac_spark.queries import control, core, llm, ml, relational

# Registry order is sweep order under the driver (which caps each round's
# sweep at 50 of 80+ queries). Module-level ordering got the round-1 gaps
# verified in round 2, but left that round's *new* queries (sorted last)
# without a driver row. _PRIORITY makes the ordering query-granular: every
# query that has never had a green driver row in any round runs first, then
# the rest in module order (all already driver-green in r01 or r02, so they
# absorb any budget cut).
_MODULES = [relational, control, ml, core, llm]

# Never driver-swept (r01+r02) or red-then-fixed; see VERDICT.md round 2.
# New-in-round-3 queries follow — also without a driver row yet.
_PRIORITY = [
    "doc_cube",          # r02 red row — oracle typing fixed this round
    "inverted_index",    # r01 red row — fixed in r02, driver-unproven
    "ann_recall",
    "doc_lm_score",
    "multimodal_payload",
    "pack_sequences",
    "span_dedup",
    "temperature_sample",
    "vocab_coverage",
    "semantic_dedup",    # new r03
    "gopher_rules",      # new r03
    "unigram_kl",        # new r03
]


def _merged(attr: str) -> dict:
    out: dict = {}
    for m in _MODULES:
        part = getattr(m, attr)
        overlap = out.keys() & part.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(part)
    head = {k: out[k] for k in _PRIORITY if k in out}
    head.update(out)
    return head


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _merged("QUERIES")


def all_oracle_sql() -> dict[str, str]:
    return _merged("ORACLE")

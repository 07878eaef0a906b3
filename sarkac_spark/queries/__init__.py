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

# Registry order is sweep order under the driver. Round 1's sweep ran out
# of budget 50 queries in, leaving everything after unverified — so the
# modules that missed out (relational, ml) plus the new control charts
# run first; core/llm (all green in round 1) absorb any future budget cut.
_MODULES = [relational, control, ml, core, llm]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out

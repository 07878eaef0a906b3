"""Physical-plan introspection helpers.

The engine's scale guarantees are *plan shapes* — stats joins stay
broadcast, filters reach the parquet scan, one shuffle per stats pass —
and refactors can silently regress them while every value stays correct.
These helpers turn the executed-plan string into assertable facts; used
by ``tests/test_plans.py`` and handy interactively:

    from sarkac_spark.plans import shuffle_count, read_schemas
    shuffle_count(trailing_window_stats(...))   # -> 1
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The (pre-execution, AQE-initial) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """The AQE-FINAL plan string — triggers one ``collect()`` so the
    adaptive re-plan actually happens. Shows runtime facts the initial
    plan cannot: ReusedExchange dedup of repeated subtrees, skew-join
    splits, SMJ→BHJ conversions. Use for assertions of the form 'these
    N static subtree copies collapse to one exchange at runtime'."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def shuffle_count(df: DataFrame) -> int:
    """Number of hash-partitioned exchanges — the data-sized shuffles.
    Broadcast exchanges are deliberately NOT counted (they're the cheap
    kind this engine leans on)."""
    return executed_plan(df).count("Exchange hashpartitioning")


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry across the plan's scans."""
    return [
        m
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))
        if m.strip()
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — what actually gets read off
    disk; the column-pruning ground truth."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", executed_plan(df))

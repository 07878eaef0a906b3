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

import os
import re
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The (pre-execution, AQE-initial) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


# rdd id -> (resolved) child plan text of a lazy_checkpoint barrier.
# Lets resolved_plan()/plan_digest() hash THROUGH materialization
# barriers: without this, any plan change upstream of a checkpoint is
# invisible to the digest (the barrier plans as `Scan ExistingRDD`) and
# bench_diff would call a real plan regression "drift". Process-local,
# grows with checkpoints created this session (~KBs each) — acceptable
# for bench/test processes, which are short-lived.
_CKPT_CHILD_PLANS: dict[int, str] = {}


def lazy_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint(eager=False)`` + digest transparency.

    The house materialization barrier (compute a multiply-referenced
    relation once per action) with the child plan registered under the
    checkpoint RDD's id, so ``resolved_plan``/``plan_digest`` keep
    seeing the full computation. The child was already planned to
    create the RDD, so capturing its plan text here is free."""
    try:
        child_text = resolved_plan(df)  # resolves nested barriers too
    except Exception:  # noqa: BLE001 — transparency is best-effort
        child_text = None
    out = df.localCheckpoint(eager=False)
    if child_text is not None:
        try:
            rid = out._jdf.queryExecution().analyzed().rdd().id()
            _CKPT_CHILD_PLANS[rid] = child_text
        except Exception:  # noqa: BLE001
            pass
    return out


# Default floor for the size-gated plan shapes (see input_size_bytes):
# below this, a query takes its overhead-light small-input branch; at or
# above (or when the size is unknowable — non-file source, checkpointed
# input), it takes the scale shape. 64 MB sits an order of magnitude
# above the ~6 MB x100 documents corpus where the r13 interleaved A/B
# still favored the small-input shapes, and far below any input where
# an extra corpus scan could matter (a scan is ~seconds at 64 MB,
# hours at 100 TB). Override per session with
# spark.conf.set("spark.sarkac.smallInputBytes", ...) or the
# SARKAC_SMALL_INPUT_BYTES env var.
SMALL_INPUT_BYTES = 64 * 1024 * 1024


def input_size_bytes(df: DataFrame) -> int | None:
    """Best-effort total size of the files backing ``df``'s scans, or
    ``None`` when it cannot be known (non-file relation, checkpoint/RDD
    leaf, unreadable path). Callers MUST treat ``None`` as "large": the
    scale shape is always correct, merely heavier than necessary on toy
    inputs — so unknown never downgrades to the small-input branch."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — metadata probe only
        return None
    if not files:
        return None
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return None  # remote storage: size unknown here, treat as large
        try:
            total += os.path.getsize(unquote(u.path))
        except OSError:
            return None
    return total


def is_small_input(df: DataFrame, threshold: int | None = None) -> bool:
    """Size gate for dual-shape operators: True iff ``df``'s backing
    files are measurably smaller than the small-input floor. The floor
    is ``spark.sarkac.smallInputBytes`` (session conf) falling back to
    ``$SARKAC_SMALL_INPUT_BYTES`` then ``SMALL_INPUT_BYTES``."""
    if threshold is None:
        try:
            threshold = int(
                df.sparkSession.conf.get(
                    "spark.sarkac.smallInputBytes",
                    os.environ.get(
                        "SARKAC_SMALL_INPUT_BYTES", str(SMALL_INPUT_BYTES)
                    ),
                )
            )
        except Exception:  # noqa: BLE001
            threshold = SMALL_INPUT_BYTES
    size = input_size_bytes(df)
    return size is not None and size < threshold


def _ckpt_children_text(df: DataFrame) -> str:
    """Registered child-plan text for every lazy_checkpoint leaf in
    ``df``'s analyzed plan (empty when there are none)."""
    out: list[str] = []
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                child = _CKPT_CHILD_PLANS.get(leaf.rdd().id())
                if child:
                    out.append(child)
    except Exception:  # noqa: BLE001
        return ""
    if not out:
        return ""
    return "\n-- checkpointed subtree --\n" + "\n".join(out)


def resolved_plan(df: DataFrame) -> str:
    """``executed_plan`` plus the registered subtree text of every
    lazy_checkpoint barrier in the tree — the digest input that stays
    sensitive to changes on either side of a barrier."""
    return executed_plan(df) + _ckpt_children_text(df)


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


def plan_digest(df: DataFrame) -> str:
    """Stable 12-hex fingerprint of the physical plan SHAPE — equal
    across runs/sessions iff the plan is structurally the same. Strips
    everything instance-specific before hashing: expression ids
    (``#123``), codegen stage ids, plan node ids, file paths/sizes and
    row-count statistics. ``bench.py`` persists one per query so
    ``tools/bench_diff.py`` can answer 'did this wall move because the
    PLAN changed, or is it box drift?' mechanically across rounds.

    Known noise source (measured: 153/154 registry queries digest-stable
    across same-session rebuilds): queries with MULTIPLE DISTINCT
    aggregates (``profile_documents``) can flip the Expand grouping-key
    ORDER between builds (Catalyst's RewriteDistinctAggregates iterates
    an unordered set), which flips the digest with no semantic change.
    Treat a digest change as evidence to confirm with
    ``tools/plan_report.py``, not as proof by itself."""
    import hashlib

    s = resolved_plan(df)
    s = re.sub(r"#\d+[L]?", "#", s)  # expression ids
    s = re.sub(r"\b([xyz])_\d+#", r"\1_#", s)  # session-global lambda-var counter
    s = re.sub(r"_common_expr_\d+", "_common_expr_", s)  # CSE counter, also global
    s = re.sub(r"gid# = \d+", "gid# = ", s)  # distinct-agg group ids, unordered
    s = re.sub(r"\[(id|plan_id)=#?\d+\]", "", s)  # exchange/plan node ids
    s = re.sub(r"\(\d+\)", "", s)  # codegen stage / ordinal markers
    s = re.sub(r"Statistics\([^)]*\)", "Statistics()", s)
    s = re.sub(r"(Location|InMemoryFileIndex)[^\n,\]]*", r"\1", s)
    s = re.sub(r"file:[^\s,\]\)]*", "file:", s)  # absolute paths
    s = re.sub(r"\d+\.\d+ [KMGT]?i?B", "", s)  # size annotations
    s = re.sub(r"cachedcount=\d+|rowCount=\d+", "", s)
    return hashlib.sha256(s.encode()).hexdigest()[:12]

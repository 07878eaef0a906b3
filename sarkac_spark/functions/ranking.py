"""Rank a tiny, already-truncated relation without a WindowExec.

The repo's top-k queries all end the same way: ``orderBy(metric desc,
key).limit(k)`` (distributed TakeOrderedAndProject), then an ordinal over
the k survivors. A row_number window over those k rows needs a partition
spec; a constant key constant-folds to an empty spec, which every plan
audit flags (``WindowExec: No Partition Defined``). Rounds 1-2 instead
used ``coalesce(1).sortWithinPartitions(...).monotonically_increasing_id``
— plan-clean but resting on physical row order surviving into a
non-deterministic id function, an assumption Spark documents as
unspecified.

``rank_topk`` replaces both with declared semantics: over k rows, the
rank of a row is 1 + the number of rows that sort strictly ahead of it,
computed as a broadcast self-join + count. O(k^2) pairs for k <= ~1000 —
noise next to the scan that produced the k rows — and every step is
plain relational algebra the optimizer may rearrange freely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_topk(
    df: DataFrame,
    desc_col: str,
    asc_col: str,
    rank_col: str = "rank",
) -> DataFrame:
    """Append ``rank_col`` = position under (``desc_col`` DESC,
    ``asc_col`` ASC) to a small relation.

    Requires ``asc_col`` to be unique (the usual tie-break key): ranks are
    then dense, gap-free, and deterministic. All columns of ``df`` must be
    groupable scalars.
    """
    other = df.select(
        F.col(desc_col).alias("__rk_d"), F.col(asc_col).alias("__rk_a")
    )
    ahead = (F.col("__rk_d") > F.col(desc_col)) | (
        (F.col("__rk_d") == F.col(desc_col)) & (F.col("__rk_a") < F.col(asc_col))
    )
    return (
        df.join(F.broadcast(other), ahead, "left")
        .groupBy(*df.columns)
        .agg((F.count("__rk_a") + 1).cast("long").alias(rank_col))
    )

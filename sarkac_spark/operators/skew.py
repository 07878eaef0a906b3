"""Skew mitigation: salted shuffle joins.

``profiling.skew_report`` is the *diagnosis* (run it before committing a
100 TB shuffle to a key); this module is the *treatment* for the case AQE
can't fix — e.g. a hot key whose rows exceed one executor's memory, or a
static plan where AQE skew-join is off. Salting splits each hot key's
rows across ``n_salt`` reducers: the large side gets a deterministic salt
in [0, n_salt) per row, the small side is replicated once per salt value,
and the join key becomes (key, salt). Result is row-identical to the
plain join; the cost is an n_salt× blow-up of the small side — so salt
the side that is small *after* pushed-down filters, and keep n_salt at
the skew factor, not the cluster size.

The salt must be DETERMINISTIC per row (hash of a stable row id, never
``rand()``): Spark retries tasks and reuses stages; a nondeterministic
salt can drop or duplicate rows under retry.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salt_large(df: DataFrame, row_id: str, n_salt: int) -> DataFrame:
    """Tag each row of the large side with hash(row_id) % n_salt."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(row_id)), F.lit(n_salt)).cast("int")
    )


def replicate_small(df: DataFrame, n_salt: int) -> DataFrame:
    """Replicate the small side once per salt value (map-side explode —
    no shuffle; the blow-up is n_salt×, which is why n_salt stays small)."""
    salts = F.array([F.lit(i) for i in range(n_salt)])
    return df.withColumn(SALT_COL, F.explode(salts))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    large_row_id: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` ⋈ ``small`` on ``on`` with the shuffle key salted to
    (on..., salt). Each hot key's rows land on n_salt reducers instead of
    one. Row-identical to ``large.join(small, on, how)``."""
    lj = salt_large(large, large_row_id, n_salt)
    rj = replicate_small(small, n_salt)
    return lj.join(rj, [*on, SALT_COL], how).drop(SALT_COL)

"""Keyed-state streaming cooldown — the pure Structured Streaming
variant of W6 (reference DSLHandler.js:13,199-210: after emitting an
anomaly for a (topic, path, window) key, suppress re-emits for 2 min).

``SigmaStreamPipeline`` implements cooldown with parquet-persisted state
inside ``foreachBatch`` (exact, simple, replayable). This module is the
*streaming-native* alternative: ``applyInPandasWithState`` keeps the
last-emit timestamp in the state store per key, so the operator works on
any unbounded stream without external state files, scales with the state
store (RocksDB on a real cluster), and survives restarts via the
checkpoint.

Semantics match ``operators/cooldown.cooldown_exact``: within a batch
the key's anomalies are scanned in event-time order; emit one, suppress
everything closer than the cooldown, carry the last emit across batches
in keyed state. (Between out-of-order *batches* the reference's
wall-clock cache can differ — it keys on processing time; we key on
event time, the documented choice everywhere else in this engine.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sarkac_spark.config import ANOMALY_COOLDOWN_SECONDS

STATE_SCHEMA = "last_emit_us long"


def stateful_cooldown(
    anomalies: DataFrame,
    key_cols: tuple[str, ...] = ("topic", "path", "window_seconds"),
    ts_col: str = "event_ts_us",
    cooldown_seconds: int = ANOMALY_COOLDOWN_SECONDS,
) -> DataFrame:
    """Apply emit-then-suppress over a *streaming* anomaly DataFrame.

    Output schema = input schema. State per key: the last emitted
    event-time (epoch us). No timeout: one long per configured series is
    the state ceiling (the reference's TTL cache exists to bound memory;
    a single long per key needs no bound).
    """
    out_schema = ", ".join(f"{c} {t}" for c, t in anomalies.dtypes)
    cd_us = cooldown_seconds * 1_000_000

    def scan(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            keep = []
            for i, t in zip(pdf.index, pdf[ts_col]):
                t = int(t)
                if last is None or (t - last) >= cd_us:
                    keep.append(i)
                    last = t
            if keep:
                yield pdf.loc[keep]
        if last is not None:
            state.update((last,))

    return anomalies.groupBy(*key_cols).applyInPandasWithState(
        scan,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

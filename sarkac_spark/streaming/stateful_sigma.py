"""Keyed-state streaming sigma scoring — the pure Structured Streaming
scoring plane that ``windowed_stats_stream`` could not provide.

Why this operator exists: Structured Streaming forbids a stream-stream
join *after* an aggregation, so "score the live stream against the
windowed stats stream" is not expressible with built-in operators. The
reference's hot path (score each incoming value against per-series
trailing stats, lib/dsl/DSLHandler.js:178-234) therefore maps to a
custom stateful operator: ``applyInPandasWithState`` keyed by
(topic, field_path), whose state is the series' retained points inside
the largest window.

Semantics: each row is scored against the stats of the *strictly
earlier* (event-time) points of its series — identical to the batch
``operators.anomaly.online_sigma_scan`` (the test asserts equality on
the same data split across micro-batches in arrival order). Guards as
everywhere: n >= min_count, stddev > 0, |score| > 1.

The cooldown (W6, DSLHandler.js:13,199-210) is folded INTO this
operator's state (per-window last-emit timestamp) rather than chained
as a second stateful operator: chaining two arbitrary
``applyInPandasWithState`` stages in one streaming query is outside
Spark's supported multi-stateful-operator combinations, and the
cooldown state is two longs per window — free to carry here.

Scale notes: state per key is bounded by (max window x series rate) —
the same bound as the reference's MongoDB retention (SigmaModel.js:39-45)
— evicted on every batch; with RocksDB state store this runs on any
number of series. Per-batch scoring is vectorized (numpy prefix sums
over the merged sorted points: O((|state|+|batch|) log |batch|) per key,
no Python loop over rows); only the few anomaly survivors take the
sequential cooldown scan.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sarkac_spark.config import MIN_EVENTS_FOR_STATS

STATE_SCHEMA = (
    "ts_us array<long>, vals array<double>, last_emit_us array<long>"
)
OUT_SCHEMA = (
    "topic string, path string, window_seconds long, event_ts_us long, "
    "value double, median double, std_dev double, three_sigma double"
)


def stateful_sigma_scan(
    store_stream: DataFrame,
    windows: Sequence[int] = (86400,),
    min_count: int = MIN_EVENTS_FOR_STATS,
    key_cols: tuple[str, str] = ("topic", "field_path"),
    ts_col: str = "produced",
    value_col: str = "value",
    round_digits: int | None = 6,
    cooldown_seconds: int | None = None,
    task_windows: dict[tuple[str, str], Sequence[int]] | None = None,
) -> DataFrame:
    """Score a long-format value stream ``(topic, field_path, produced,
    value)`` online, keeping per-series history in keyed state.

    Output: one row per (anomalous value, window). Late rows (event time
    older than already-seen points) are scored against the points that
    had arrived before them with smaller event time — arrival order is
    the cache model, exactly the reference's (W4: a late insert simply
    participates in the next scan).

    ``cooldown_seconds``: when set, emit-then-suppress per
    (series, window) — after one emit, anomalies closer than the
    cooldown (event time) are dropped, with the last-emit carried in
    state across batches (W6 exact semantics).

    ``task_windows``: per-(topic, path) window subsets (the DSL task
    list, A6); keys absent from the map are scored on every window —
    pass the map to avoid computing windows a series never configured.
    """
    windows = sorted(set(int(w) for w in windows))
    max_w_us = max(windows) * 1_000_000
    win_us = np.array([w * 1_000_000 for w in windows], dtype=np.int64)
    win_index = {w: i for i, w in enumerate(windows)}
    cd_us = None if cooldown_seconds is None else cooldown_seconds * 1_000_000
    tasks = (
        None
        if task_windows is None
        else {k: sorted(set(int(w) for w in v)) for k, v in task_windows.items()}
    )

    def scan(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        my_windows = windows if tasks is None else tasks.get(tuple(key), [])
        if state.exists:
            st_ts, st_vals, st_emit = state.get
            st_ts = np.asarray(st_ts, dtype=np.int64)
            st_vals = np.asarray(st_vals, dtype=np.float64)
            last_emit = list(st_emit)
        else:
            st_ts = np.empty(0, dtype=np.int64)
            st_vals = np.empty(0, dtype=np.float64)
            last_emit = [-(1 << 62)] * len(windows)

        for pdf in pdfs:
            if not my_windows:
                break
            pdf = pdf.sort_values(ts_col, kind="stable")
            ser = pdf[ts_col]
            if isinstance(ser.dtype, pd.DatetimeTZDtype):
                ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
            b_ts = ser.astype("datetime64[us]").astype("int64").to_numpy()
            b_vals = pdf[value_col].to_numpy(dtype=np.float64)

            # merge state + batch into one time-sorted view; prefix sums
            # give O(1) trailing stats per (row, window)
            all_ts = np.concatenate([st_ts, b_ts])
            all_vals = np.concatenate([st_vals, b_vals])
            order = np.argsort(all_ts, kind="stable")
            all_ts, all_vals = all_ts[order], all_vals[order]

            s1 = np.concatenate([[0.0], np.cumsum(all_vals)])
            s2 = np.concatenate([[0.0], np.cumsum(all_vals * all_vals)])

            out_rows = []
            for w in my_windows:
                w_us = win_us[win_index[w]]
                lo = np.searchsorted(all_ts, b_ts - w_us, side="left")
                # strictly earlier event time: exclude the whole peer
                # group at b_ts (matches RANGE ... -1 PRECEDING)
                hi = np.searchsorted(all_ts, b_ts, side="left")
                n = (hi - lo).astype(np.float64)
                ok = n >= min_count
                if not ok.any():
                    continue
                safe_n = np.where(n > 0, n, 1)
                mean = np.where(ok, (s1[hi] - s1[lo]) / safe_n, np.nan)
                var = np.where(ok, (s2[hi] - s2[lo]) / safe_n - mean * mean, np.nan)
                std = np.sqrt(np.maximum(var, 0.0))
                with np.errstate(divide="ignore", invalid="ignore"):
                    score = (b_vals - mean) / (3.0 * std)
                hit = ok & (std > 0) & (np.abs(score) > 1.0)
                if not hit.any():
                    continue
                idx = np.flatnonzero(hit)
                if cd_us is not None:
                    kept = []
                    last = last_emit[win_index[w]]
                    for i in idx:  # few survivors; sequential is fine
                        if b_ts[i] - last >= cd_us:
                            kept.append(i)
                            last = int(b_ts[i])
                    last_emit[win_index[w]] = last
                    idx = np.asarray(kept, dtype=np.int64)
                    if idx.size == 0:
                        continue
                out_rows.append(
                    pd.DataFrame(
                        {
                            "topic": key[0],
                            "path": key[1],
                            "window_seconds": w,
                            "event_ts_us": b_ts[idx],
                            "value": b_vals[idx],
                            "median": mean[idx],
                            "std_dev": std[idx],
                            "three_sigma": score[idx],
                        }
                    )
                )
            if out_rows:
                out = pd.concat(out_rows, ignore_index=True)
                if round_digits is not None:
                    for c in ("median", "std_dev", "three_sigma"):
                        out[c] = out[c].round(round_digits)
                yield out

            # retention eviction (W3): keep points inside the largest
            # window of the max event time seen so far
            st_ts, st_vals = all_ts, all_vals
            if st_ts.size:
                keep = st_ts >= st_ts[-1] - max_w_us
                st_ts, st_vals = st_ts[keep], st_vals[keep]

        state.update((st_ts.tolist(), st_vals.tolist(), last_emit))

    return store_stream.groupBy(*key_cols).applyInPandasWithState(
        scan,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Keyed-state streaming CUSUM — the sequential-detector twin of
``operators/control.cusum_scan``, for long-running streams.

The batch operator's reflection form ``c_t = S_t - min_{i<=t} S_i`` is
algebraically the Page recursion ``c_t = max(0, c_{t-1} + z_t - k)`` —
two doubles of state per (series, arm). That makes CUSUM the cheapest
possible stateful operator: unlike the sigma twin there is no retained
point window at all; state is O(1) per series forever.

Reference stats: a CUSUM standardizes against *in-control* baseline
stats. Batch ``cusum_scan`` estimates them from the whole scanned
relation; a stream has no "whole relation", so the baseline rides in as
a plain dict (series -> (mu, sd)) — computed from a training window
(e.g. ``trailing_window_stats``) and refreshed by restarting the query,
exactly how control charts are recalibrated in practice. Scoring is
z = round((x - mu)/sd, 6), matching the batch operator bit-for-bit, so
feeding the same rows in event-time order reproduces the batch flags
(pinned by test, the same contract as stateful_sigma ≡ online_sigma).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sarkac_spark.operators.control import CUSUM_H, CUSUM_K

STATE_SCHEMA = "c_hi double, c_lo double"
OUT_SCHEMA = (
    "series string, event_ts_us long, value double, "
    "cusum_hi double, cusum_lo double, direction string"
)


def stateful_cusum_scan(
    stream: DataFrame,
    baseline: dict[str, tuple[float, float]],
    key_col: str = "series",
    ts_col: str = "ts_us",
    value_col: str = "value",
    k: float = CUSUM_K,
    h: float = CUSUM_H,
) -> DataFrame:
    """Score a keyed value stream with two-sided CUSUM, carrying the two
    arm accumulators in keyed state.

    ``baseline``: series -> (mu, sd) in-control stats; series absent
    from the map (or with sd <= 0) pass through unscored — the same
    "no stats, no alert" guard as everywhere else in the engine.
    Input rows must arrive in event-time order per series (use a
    watermark + sort upstream if the source reorders); arrival order IS
    the scan order, the reference's cache model.
    """

    def scan(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        series = key[0]
        stats = baseline.get(series)
        if stats is None or stats[1] <= 0:
            state.update((0.0, 0.0))
            return
        mu, sd = stats
        c_hi, c_lo = state.get if state.exists else (0.0, 0.0)

        def arms(z: "np.ndarray", carry: float, sign: float):
            # vectorized Page recursion via the same reflection form the
            # batch operator uses: c_t = max(carry + S_t, S_t - min S_i)
            # — the running min includes S_t itself, which supplies the
            # 0 floor. Identical float op order to batch when carry = 0.
            d = sign * z - k
            s = np.cumsum(d)
            return np.maximum(carry + s, s - np.minimum.accumulate(s))

        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="stable")
            ts = pdf[ts_col].to_numpy(dtype=np.int64)
            x = pdf[value_col].to_numpy(dtype=np.float64)
            z = np.round((x - mu) / sd, 6)
            hi = arms(z, c_hi, 1.0)
            lo = arms(z, c_lo, -1.0)
            c_hi, c_lo = float(hi[-1]), float(lo[-1])
            r_hi, r_lo = np.round(hi, 6), np.round(lo, 6)
            mask = (r_hi > h) | (r_lo > h)
            if mask.any():
                both = (r_hi > h) & (r_lo > h)
                direction = np.where(
                    both, "both", np.where(r_hi > h, "up", "down")
                )
                yield pd.DataFrame(
                    {
                        "series": series,
                        "event_ts_us": ts[mask],
                        "value": x[mask],
                        "cusum_hi": r_hi[mask],
                        "cusum_lo": r_lo[mask],
                        "direction": direction[mask],
                    }
                )

        state.update((c_hi, c_lo))

    return stream.groupBy(key_col).applyInPandasWithState(
        scan,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

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


EWMA_STATE_SCHEMA = (
    "closed_means array<double>, open_bucket array<long>, "
    "open_sum array<double>, open_n array<long>"
)
EWMA_OUT_SCHEMA = (
    "series string, bucket_us long, v double, ewma double, "
    "band_lo double, band_hi double"
)


def stateful_ewma_scan(
    stream: DataFrame,
    baseline: dict[str, tuple[float, float]],
    key_col: str = "series",
    ts_col: str = "ts_us",
    value_col: str = "value",
    bucket_seconds: int = 3600,
    n_lags: int = 8,
    limit_sigma: float = 3.0,
) -> DataFrame:
    """Streaming EWMA control chart — the keyed-state twin of
    ``operators/control.ewma_scan``.

    State per series: the last ``n_lags - 1`` *closed* bucket means plus
    the still-open buckets' (sum, count) accumulators — O(n_lags + open
    buckets), independent of history length. A bucket closes when a
    strictly later bucket's data arrives (per-series event-time
    watermark); on close its mean enters the kernel window and the
    bucket is scored against ``mu ± limit_sigma·sd·sqrt(1/3)`` with the
    same truncated power-of-two kernel (head renormalization included)
    as the batch operator. Late points for an already-closed bucket are
    dropped — the watermark tradeoff every streaming aggregation makes;
    the batch operator remains the retrospective exact scorer.

    ``baseline``: series -> (mu, sd) in-control stats over bucket means,
    injected like the CUSUM twin (a stream has no whole-relation stats);
    series absent from the map pass through unscored.
    """
    bucket_us_width = bucket_seconds * 1_000_000
    weights = [1.0 / (1 << (j + 1)) for j in range(n_lags)]

    def scan(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        series = key[0]
        stats = baseline.get(series)
        if stats is None or stats[1] <= 0:
            state.update(([], [], [], []))
            return
        mu, sd = stats
        band = limit_sigma * sd * (1.0 / 3.0) ** 0.5

        if state.exists:
            closed, ob, osum, on = state.get
            closed = list(closed)
            open_b = {b: [s, n] for b, s, n in zip(ob, osum, on)}
        else:
            closed, open_b = [], {}

        def kernel(tail: list[float]) -> float:
            num = sum(w * x for w, x in zip(weights, reversed(tail)))
            den = sum(weights[: len(tail)])
            return round(num / den, 6)

        for pdf in pdfs:
            b = (
                pdf[ts_col].to_numpy(dtype=np.int64) // bucket_us_width
            ) * bucket_us_width
            x = pdf[value_col].to_numpy(dtype=np.float64)
            for bb, xx in zip(b, x):
                acc = open_b.setdefault(int(bb), [0.0, 0])
                acc[0] += float(xx)
                acc[1] += 1
            out = {c: [] for c in ("bucket_us", "v", "ewma", "band_lo", "band_hi")}
            if open_b:
                hwm = max(open_b)
                for bb in sorted(k for k in open_b if k < hwm):
                    s, n = open_b.pop(bb)
                    v = round(s / n, 6)
                    closed.append(v)
                    del closed[: max(0, len(closed) - n_lags)]
                    e = kernel(closed[-n_lags:])
                    if abs(e - mu) > band:
                        out["bucket_us"].append(bb)
                        out["v"].append(v)
                        out["ewma"].append(e)
                        out["band_lo"].append(round(mu - band, 6))
                        out["band_hi"].append(round(mu + band, 6))
            if out["bucket_us"]:
                yield pd.DataFrame({"series": series, **out})

        keep = sorted(open_b)
        state.update(
            (
                closed[-(n_lags - 1) :],
                keep,
                [open_b[k][0] for k in keep],
                [open_b[k][1] for k in keep],
            )
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        scan,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SEASONAL_STATE_SCHEMA = (
    "cell_n array<long>, cell_sum array<double>, cell_sumsq array<double>"
)
SEASONAL_OUT_SCHEMA = (
    "series string, hour_of_day int, event_ts_us long, value double, "
    "season_mean double, season_sd double, season_z double"
)


def stateful_seasonal_scan(
    stream: DataFrame,
    key_col: str = "series",
    ts_col: str = "ts_us",
    value_col: str = "value",
    z_threshold: float = 3.0,
    min_count: int = 3,
) -> DataFrame:
    """Online seasonal (hour-of-day) sigma scoring — the streaming member
    of ``operators/control.seasonal_sigma_scan``.

    Unlike the CUSUM/EWMA twins this one needs NO injected baseline: the
    seasonal model is 24 running (n, sum, sumsq) cells per series —
    fixed-size state that *is* the baseline, updated online. Each value
    is scored against its own cell's stats over strictly-earlier points
    (the online analogue of the batch operator's retrospective
    whole-relation cells; the batch scan stays the exact retrospective
    scorer, same division of labor as online_sigma vs sigma_scan), with
    the engine's usual guards: n >= min_count, sd > 0.

    A nightly dip therefore stops alerting as soon as its cell has
    min_count observations, while a daytime-level value at 3am scores
    against the 3am cell and trips immediately — the property tests pin
    both behaviors.
    """

    def scan(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        series = key[0]
        if state.exists:
            n, s1, s2 = (list(a) for a in state.get)
        else:
            n, s1, s2 = [0] * 24, [0.0] * 24, [0.0] * 24

        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="stable")
            ts = pdf[ts_col].to_numpy(dtype=np.int64)
            x = pdf[value_col].to_numpy(dtype=np.float64)
            # numpy % follows Python sign-of-divisor semantics, so
            # pre-1970 (negative) epochs wrap into [0, 24) correctly
            hours = (ts % 86_400_000_000) // 3_600_000_000
            out = {
                c: []
                for c in (
                    "hour_of_day",
                    "event_ts_us",
                    "value",
                    "season_mean",
                    "season_sd",
                    "season_z",
                )
            }
            for t, v, hh in zip(ts, x, hours):
                h = int(hh)
                if n[h] >= min_count:
                    mean = round(s1[h] / n[h], 6)
                    var = s2[h] / n[h] - (s1[h] / n[h]) ** 2
                    sd = round(max(var, 0.0) ** 0.5, 6)
                    if sd > 0:
                        z = round((float(v) - mean) / sd, 6)
                        if abs(z) > z_threshold:
                            out["hour_of_day"].append(h)
                            out["event_ts_us"].append(int(t))
                            out["value"].append(float(v))
                            out["season_mean"].append(mean)
                            out["season_sd"].append(sd)
                            out["season_z"].append(z)
                n[h] += 1
                s1[h] += float(v)
                s2[h] += float(v) * float(v)
            if out["event_ts_us"]:
                yield pd.DataFrame({"series": series, **out})

        state.update((n, s1, s2))

    return stream.groupBy(key_col).applyInPandasWithState(
        scan,
        outputStructType=SEASONAL_OUT_SCHEMA,
        stateStructType=SEASONAL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Holt-Winters additive triple exponential smoothing — forecasting on
an aggregated series.

The distributed work in a forecasting job is the AGGREGATION (fact →
per-period series); the smoothing recurrence itself runs on a frame
whose cardinality is bounded by the calendar (365 rows/year at daily
grain forever), so it executes as ONE applyInPandas task over that tiny
frame — the ts_seasonal_decompose scale note, with the recurrence in
vectorized-enough plain Python because l_t/b_t/s_t genuinely chain
(nonlinear in the data; no window form exists).

Standard initialization (Hyndman & Athanasopoulos, FPP3 §8.3):
l_m = mean(x_1..x_m); b_m = (mean of second season - mean of first)/m;
s_i = x_i - l_m for the first season.  Then for t > m:

    l_t = alpha (x_t - s_{t-m}) + (1-alpha)(l_{t-1} + b_{t-1})
    b_t = beta  (l_t - l_{t-1}) + (1-beta) b_{t-1}
    s_t = gamma (x_t - l_t)     + (1-gamma) s_{t-m}

Forecast h steps out: l_n + h b_n + s_{n-m + ((h-1) mod m) + 1}.
Fixed-point iteration over carried seasonal state has no SQL form, so
the registered query is rows-only; tests/test_forecast.py pins the
Spark path against this module's own sequential reference on identical
series and sanity-checks seasonal recovery on a constructed signal.
"""

from __future__ import annotations

import numpy as np

HW_ALPHA, HW_BETA, HW_GAMMA = 0.3, 0.1, 0.2
HW_SEASON = 7
HW_HORIZON = 7


def holt_winters_additive(
    x: np.ndarray,
    m: int = HW_SEASON,
    alpha: float = HW_ALPHA,
    beta: float = HW_BETA,
    gamma: float = HW_GAMMA,
    horizon: int = HW_HORIZON,
) -> tuple[np.ndarray, float]:
    """Returns (forecasts[horizon], in-sample one-step SSE)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n < 2 * m:
        raise ValueError(f"Holt-Winters needs >= {2 * m} points, got {n}")
    level = x[:m].mean()
    trend = (x[m : 2 * m].mean() - x[:m].mean()) / m
    season = list(x[:m] - level)
    sse = 0.0
    for t in range(m, n):
        s_tm = season[t - m]
        pred = level + trend + s_tm
        sse += (x[t] - pred) ** 2
        new_level = alpha * (x[t] - s_tm) + (1 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1 - beta) * trend
        season.append(gamma * (x[t] - new_level) + (1 - gamma) * s_tm)
        level = new_level
    fc = np.array(
        [
            level + h * trend + season[n - m + (h - 1) % m]
            for h in range(1, horizon + 1)
        ]
    )
    return fc, sse

"""Quality gates for the signal_ext operators: NumPy/pandas referees
(third implementation besides the DuckDB oracle) and invariant checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.signal_ext import (
    ts_cross_correlation,
    ts_hampel_outliers,
    ts_holt_linear_smoothing,
    ts_seasonal_strength,
)
from guidewire_spark.plans.catalog import load_table


def _daily_series(spark, sf_dir, event_type=None) -> pd.Series:
    pdf = load_table(spark, sf_dir, "events").toPandas()
    if event_type is not None:
        pdf = pdf[pdf.event_type == event_type]
    milli = (pdf.value * 1000).round().astype("int64")
    return (
        pd.DataFrame({"day": pdf.ts.dt.floor("D"), "m": milli})
        .groupby("day")["m"]
        .agg(lambda s: int(s.sum()) // len(s))
        .sort_index()
    )


def test_holt_matches_numpy_recurrence(spark, sf_dir):
    y = _daily_series(spark, sf_dir).to_numpy().astype(float)
    l, b = y[0], y[1] - y[0]
    for t in range(1, len(y)):
        nl = 0.5 * y[t] + 0.5 * (l + b)
        b = 0.25 * (nl - l) + 0.75 * b
        l = nl
    row = ts_holt_linear_smoothing(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(y)
    assert abs(row["level_milli"] - l) < 1e-3
    assert abs(row["trend_milli"] - b) < 1e-3
    assert abs(row["forecast_next_milli"] - (l + b)) < 1e-3


def test_cross_correlation_matches_numpy(spark, sf_dir):
    v = _daily_series(spark, sf_dir, "view")
    p = _daily_series(spark, sf_dir, "purchase")
    rows = {r["lag"]: r for r in ts_cross_correlation(spark, sf_dir).collect()}
    for lag in range(-3, 4):
        shifted = p.copy()
        shifted.index = shifted.index - pd.Timedelta(days=lag)
        joined = pd.concat([v, shifted], axis=1, join="inner")
        a, b = joined.iloc[:, 0].to_numpy(), joined.iloc[:, 1].to_numpy()
        ref = np.corrcoef(a, b)[0, 1]
        assert abs(rows[lag]["xcorr"] - ref) < 1e-6
        assert rows[lag]["n"] == len(joined)


def test_hampel_median_mad_are_exact_window_stats(spark, sf_dir):
    y = _daily_series(spark, sf_dir).to_numpy()
    rows = sorted(
        ts_hampel_outliers(spark, sf_dir).collect(), key=lambda r: r["x"]
    )
    assert len(rows) == len(y) - 6  # only full 7-day windows
    for i, r in enumerate(rows):
        win = np.sort(y[i : i + 7])
        med = int(win[3])
        mad = int(np.sort(np.abs(y[i : i + 7] - med))[3])
        assert r["med"] == med and r["mad"] == mad
        assert r["is_outlier"] == (
            10000 * abs(int(r["y"]) - med) > 3 * 14826 * mad
        )


def test_seasonal_strength_is_r_squared(spark, sf_dir):
    daily = _daily_series(spark, sf_dir)
    df = pd.DataFrame({"y": daily.to_numpy()}, index=daily.index)
    df["dow"] = df.index.dayofweek
    sst = ((df.y - df.y.mean()) ** 2).sum()
    sse = sum(
        ((g.y - g.y.mean()) ** 2).sum() for _, g in df.groupby("dow")
    )
    row = ts_seasonal_strength(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(df)
    assert abs(row["seasonal_strength"] - (1 - sse / sst)) < 1e-5
    assert row["seasonal_strength"] <= 1.0


def test_spc_rule_two_of_three_matches_numpy(spark, sf_dir):
    from guidewire_spark.operators.signal_ext import ts_spc_rule_two_of_three

    y = _daily_series(spark, sf_dir).to_numpy().astype(float)
    mean, sd = y.mean(), y.std(ddof=0)
    z = (y - mean) / sd
    rows = sorted(
        ts_spc_rule_two_of_three(spark, sf_dir).collect(), key=lambda r: r["x"]
    )
    assert len(rows) == len(y) - 2  # complete 3-windows only
    for i, r in enumerate(rows):
        win = z[i : i + 3]
        na, nb = int((win > 2).sum()), int((win < -2).sum())
        assert (r["n_above"], r["n_below"]) == (na, nb)
        assert r["alarm"] == (na >= 2 or nb >= 2)
        assert r["side"] == ("high" if na >= 2 else "low" if nb >= 2 else "none")

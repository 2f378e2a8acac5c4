"""Quality gates for the stats_ext operators: independent NumPy/pandas
referees for the hypothesis-test statistics and rolling windows (not
the DuckDB oracle — a third implementation), invariant checks for the
quantizer and audit operators, and plan audits for the shuffle-reuse
claims in the docstrings.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from guidewire_spark.operators.stats_ext import (
    agg_benford_first_digit,
    agg_ks_statistic,
    agg_mann_whitney_u,
    anon_k_anonymity,
    embedding_quantize_int8,
    ts_ohlc_bars,
    window_rolling_median,
)
from guidewire_spark.plans.catalog import load_table


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _events_pdf(spark, sf_dir) -> pd.DataFrame:
    return load_table(spark, sf_dir, "events").toPandas()


def test_ks_matches_numpy_ecdf(spark, sf_dir):
    pdf = _events_pdf(spark, sf_dir)
    a = np.sort(pdf.loc[pdf.event_type == "view", "value"].to_numpy())
    b = np.sort(pdf.loc[pdf.event_type == "click", "value"].to_numpy())
    grid = np.concatenate([a, b])
    d = np.max(
        np.abs(
            np.searchsorted(a, grid, side="right") / len(a)
            - np.searchsorted(b, grid, side="right") / len(b)
        )
    )
    row = agg_ks_statistic(spark, sf_dir).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["ks_d"] - d) < 1e-6


def test_mann_whitney_matches_numpy_midranks(spark, sf_dir):
    pdf = _events_pdf(spark, sf_dir)
    sub = pdf[pdf.event_type.isin(["view", "click"])]
    ranks = sub["value"].rank(method="average")  # midranks
    r_a = ranks[sub.event_type == "view"].sum()
    n_a = int((sub.event_type == "view").sum())
    n_b = int((sub.event_type == "click").sum())
    u_a = r_a - n_a * (n_a + 1) / 2.0
    z = (u_a - n_a * n_b / 2.0) / math.sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0)
    row = agg_mann_whitney_u(spark, sf_dir).collect()[0]
    assert abs(row["u_a"] - u_a) < 1e-3
    assert abs(row["z"] - z) < 1e-3


def test_ohlc_matches_pandas_groupby(spark, sf_dir):
    pdf = _events_pdf(spark, sf_dir)
    pdf["bucket"] = pdf["ts"].dt.floor("h")
    pdf = pdf.sort_values(["ts", "event_id"])
    g = pdf.groupby(["event_type", "bucket"])["value"]
    expected = pd.DataFrame(
        {
            "open": g.first().round(4),
            "high": g.max().round(4),
            "low": g.min().round(4),
            "close": g.last().round(4),
            "n_events": g.size(),
        }
    )
    got = (
        ts_ohlc_bars(spark, sf_dir)
        .toPandas()
        .set_index(["event_type", "bucket"])
        .sort_index()
    )
    assert len(got) == len(expected)
    for col in ("open", "high", "low", "close"):
        assert np.allclose(got[col], expected[col], atol=1e-4), col
    assert (got["n_events"] == expected["n_events"]).all()


def test_rolling_median_matches_pandas(spark, sf_dir):
    pdf = _events_pdf(spark, sf_dir)
    sub = (
        pdf[pdf.event_type == "view"]
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    expected = sub["value"].rolling(7, min_periods=1).median().round(4)
    got = (
        window_rolling_median(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .toPandas()
        .set_index("event_id")
        .loc[sub["event_id"].to_numpy(), "med7"]
        .reset_index(drop=True)
    )
    assert np.allclose(got, expected, atol=1e-4)


def test_quantizer_invariants(spark, sf_dir):
    rows = embedding_quantize_int8(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["q_max"] <= 127
        # absmax scaling: worst-case reconstruction error is scale/2
        # (rounding), with slack for the 6dp output rounding
        assert r["err_max"] <= r["scale"] / 2 + 1e-5
        assert r["q_l1"] >= 0 and r["dims"] > 0


def test_k_anonymity_partitions_customers(spark, sf_dir):
    got = anon_k_anonymity(spark, sf_dir).toPandas()
    total = load_table(spark, sf_dir, "customer").count()
    assert got["group_size"].sum() == total
    assert ((got["group_size"] < 5) == got["at_risk"]).all()


def test_benford_frequencies_sum_to_one(spark, sf_dir):
    got = agg_benford_first_digit(spark, sf_dir).toPandas()
    assert set(got["d"]).issubset(set(range(1, 10)))
    assert abs(got["observed"].sum() - 1.0) < 1e-4
    # Benford expectation itself sums to 1 over digits 1..9
    assert abs(got["benford"].sum() - 1.0) < 1e-4


def test_ohlc_single_shuffle_reused_by_aggregate(spark, sf_dir):
    """The window and the final aggregate share (event_type, bucket)
    keys: one Exchange feeds both — a second would mean the aggregate
    re-shuffled data already distributed correctly."""
    tree = (
        plan_of(ts_ohlc_bars(spark, sf_dir))
        .split("== Physical Plan ==")[1]
        .strip()
        .split("\n\n")[0]
    )
    assert tree.count("Exchange") == 1
    assert tree.count("Window") == 2
    assert tree.count("HashAggregate") == 2  # partial + final, no re-shuffle


def test_rolling_median_partitions_by_series(spark, sf_dir):
    """No WindowExec over a single global partition: the frame is
    per-series, so the plan must partition by event_type (never the
    empty-partition all-to-one-task shape)."""
    plan = plan_of(window_rolling_median(spark, sf_dir))
    assert "hashpartitioning(event_type" in plan

"""Quality gates for the inference_ext operators: independent
NumPy/pandas referees (a third implementation besides the DuckDB
oracle), mathematical invariants of the statistics, and plan audits
for the one-shuffle claims in the docstrings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.inference_ext import (
    agg_bayesian_ab_beta,
    agg_cohens_d_effect_size,
    agg_cramers_v,
    agg_js_divergence,
    agg_spearman_rank_corr,
    agg_theil_sen_slope,
    agg_trimmed_winsorized,
)
from guidewire_spark.plans.catalog import load_table


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_spearman_matches_pandas(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "lineitem").toPandas()
    rows = {
        r["l_returnflag"]: r
        for r in agg_spearman_rank_corr(spark, sf_dir).collect()
    }
    for flag, grp in pdf.groupby("l_returnflag"):
        # midrank + Pearson-on-ranks referee (scipy-free)
        rx = grp["l_quantity"].rank(method="average").to_numpy()
        ry = grp["l_extendedprice"].rank(method="average").to_numpy()
        ref = np.corrcoef(rx, ry)[0, 1]
        assert abs(rows[flag]["spearman_rho"] - ref) < 1e-6
        assert rows[flag]["n"] == len(grp)


def test_cramers_v_in_unit_interval_and_matches_chi2(spark, sf_dir):
    row = agg_cramers_v(spark, sf_dir).collect()[0]
    assert 0.0 <= row["cramers_v"] <= 1.0
    # referee: pandas crosstab chi2
    pdf = load_table(spark, sf_dir, "orders").toPandas()
    obs = pd.crosstab(pdf.o_orderpriority, pdf.o_orderstatus).to_numpy()
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert abs(row["chi2"] - chi2) < 1e-3
    v = np.sqrt(chi2 / (obs.sum() * (min(obs.shape) - 1)))
    assert abs(row["cramers_v"] - v) < 1e-6


def test_cohens_d_matches_numpy(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "events").toPandas()
    milli = (pdf.value * 1000).round().astype("int64")
    a = milli[pdf.event_type == "click"].to_numpy()
    b = milli[pdf.event_type == "view"].to_numpy()
    pooled = np.sqrt(
        ((len(a) - 1) * a.var(ddof=1) + (len(b) - 1) * b.var(ddof=1))
        / (len(a) + len(b) - 2)
    )
    d = (a.mean() - b.mean()) / pooled
    row = agg_cohens_d_effect_size(spark, sf_dir).collect()[0]
    assert abs(row["cohens_d"] - d) < 1e-6


def test_js_divergence_bounded_and_symmetric(spark, sf_dir):
    row = agg_js_divergence(spark, sf_dir).collect()[0]
    # JS in bits is bounded by 1; near 0 for parity cohorts (same mix)
    assert 0.0 <= row["js_bits"] <= 1.0
    pdf = load_table(spark, sf_dir, "events").toPandas()
    c = pd.crosstab(pdf.event_type, pdf.user_id % 2)
    p = (c[0] / c[0].sum()).to_numpy()
    q = (c[1] / c[1].sum()).to_numpy()
    m = (p + q) / 2
    js = 0.5 * np.sum(p * np.log2(p / m)) + 0.5 * np.sum(q * np.log2(q / m))
    assert abs(row["js_bits"] - js) < 1e-5


def test_trimmed_winsorized_between_min_and_max(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "lineitem").toPandas()
    rows = {
        r["l_returnflag"]: r
        for r in agg_trimmed_winsorized(spark, sf_dir).collect()
    }
    for flag, grp in pdf.groupby("l_returnflag"):
        cents = (grp.l_extendedprice * 100).round().astype("int64")
        n = len(cents)
        t = n // 10
        kept = np.sort(cents.to_numpy())[t : n - t]
        ref_trim = kept.mean() / 100
        ref_wins = (
            kept.sum() + t * kept[0] + t * kept[-1]
        ) / n / 100
        assert abs(rows[flag]["trimmed_mean"] - ref_trim) < 1e-3
        assert abs(rows[flag]["winsorized_mean"] - ref_wins) < 1e-3


def test_theil_sen_matches_numpy_pairwise_median(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "events").toPandas()
    milli = (pdf.value * 1000).round().astype("int64")
    daily = (
        pd.DataFrame({"day": pdf.ts.dt.floor("D"), "m": milli})
        .groupby("day")["m"]
        .agg(lambda s: int(s.sum()) // len(s))
        .sort_index()
    )
    x = (daily.index - pd.Timestamp("2024-01-01")).days.to_numpy()
    y = daily.to_numpy()
    slopes = [
        (y[j] - y[i]) / (x[j] - x[i])
        for i in range(len(x))
        for j in range(i + 1, len(x))
    ]
    row = agg_theil_sen_slope(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == len(slopes)
    assert abs(row["sen_slope_milli"] - np.median(slopes)) < 1e-6


def test_bayesian_posterior_moments_exact(spark, sf_dir):
    rows = agg_bayesian_ab_beta(spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        a, b = 1 + r["conv"], 1 + r["n"] - r["conv"]
        assert abs(r["post_mean"] - a / (a + b)) < 1e-8
        var = a * b / ((a + b) ** 2 * (a + b + 1))
        assert abs(r["post_var"] - var) < 1e-10
        # posterior mean is shrunk toward 1/2 relative to the MLE
        mle = r["conv"] / r["n"]
        assert min(mle, 0.5) - 1e-12 <= r["post_mean"] <= max(mle, 0.5) + 1e-12


def test_spearman_windows_all_partition_by_flag(spark, sf_dir):
    # the rank and tie-count windows all partition by l_returnflag (or
    # a superset) — no all-to-one single-partition window in the plan
    plan = plan_of(agg_spearman_rank_corr(spark, sf_dir))
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "l_returnflag" in m.group(1), plan


def test_theil_sen_pairs_are_day_bounded(spark, sf_dir):
    row = agg_theil_sen_slope(spark, sf_dir).collect()[0]
    n_days = (
        load_table(spark, sf_dir, "events")
        .selectExpr("count(distinct date_trunc('day', ts)) as d")
        .collect()[0]["d"]
    )
    assert row["n_pairs"] == n_days * (n_days - 1) // 2

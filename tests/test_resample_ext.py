"""Quality gates for the resample_ext operators: a pure-Python
replica of the hash permutation test and LOO-encoding invariants.
"""

from __future__ import annotations

import numpy as np

from guidewire_spark.operators.resample_ext import (
    agg_permutation_test,
    window_target_encoding,
)
from guidewire_spark.plans.catalog import load_table


def test_permutation_test_matches_python_replica(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    milli = (e.value * 1000).round().astype("int64")
    per_user = (
        e.assign(m=milli).groupby("user_id")
        .agg(n=("m", "size"), s=("m", "sum"))
        .reset_index()
    )

    def diff(flags):
        a = per_user[flags == 0]
        b = per_user[flags == 1]
        return a.s.sum() / a.n.sum() - b.s.sum() / b.n.sum()

    d_obs = diff(per_user.user_id % 2)
    beats = 0
    arm = per_user.user_id % 2
    degenerate = 0
    for b in range(64):
        flips = ((per_user.user_id * 2654435761 + b * 40503) // 65536) % 2
        # The old low-bit flip was ALWAYS the identity arm labeling or
        # its complement (two odd multipliers mod 2), collapsing every
        # replica onto |d_obs| and pinning p at 1.0.  Bit 16 must give
        # genuinely reshuffled labelings.
        if (flips == arm).all() or (flips == 1 - arm).all():
            degenerate += 1
        if abs(diff(flips)) >= abs(d_obs):
            beats += 1
    assert degenerate == 0
    p = (1 + beats) / 65
    row = agg_permutation_test(spark, sf_dir).collect()[0]
    assert row["n_perms"] == 64
    assert abs(row["observed_diff"] - d_obs / 1000) < 1e-5
    assert abs(row["p_value"] - p) < 1e-6  # operator rounds to 6 dp
    assert 1 / 65 <= row["p_value"] <= 1.0


def test_target_encoding_loo_property(spark, sf_dir):
    rows = window_target_encoding(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events").toPandas()
    sub = e[e.event_id % 25 == 0].copy()
    sub["y"] = (sub.value > 250).astype(int)
    stats = sub.groupby("event_type")["y"].agg(["sum", "count"])
    assert len(rows) == len(sub)
    y_by_id = dict(zip(sub.event_id, sub.y))
    for r in rows:
        s, c = stats.loc[r["event_type"]]
        y = y_by_id[r["event_id"]]
        ref = (s - y) / (c - 1) if c > 1 else 0.5
        assert abs(r["te_loo"] - ref) < 1e-6
        assert 0.0 <= r["te_loo"] <= 1.0


def test_cohens_h_matches_numpy(spark, sf_dir):
    from guidewire_spark.operators.resample_ext import agg_cohens_h

    e = load_table(spark, sf_dir, "events").toPandas()
    m = e.user_id % 2
    conv = e.event_type == "purchase"
    p0 = conv[m == 0].mean()
    p1 = conv[m == 1].mean()
    h = 2 * np.arcsin(np.sqrt(p0)) - 2 * np.arcsin(np.sqrt(p1))
    row = agg_cohens_h(spark, sf_dir).collect()[0]
    assert abs(row["p0"] - p0) < 1e-6 and abs(row["p1"] - p1) < 1e-6
    assert abs(row["cohens_h"] - h) < 1e-6


def test_group_zscore_matches_numpy(spark, sf_dir):
    from guidewire_spark.operators.resample_ext import window_zscore_by_group

    e = load_table(spark, sf_dir, "events").toPandas()
    milli = (e.value * 1000).round().astype("int64")
    df = e.assign(m=milli)
    stats = df.groupby("event_type")["m"].agg(["mean", "std"])
    got = {r["event_id"]: r for r in window_zscore_by_group(spark, sf_dir).collect()}
    sub = df[df.event_id % 40 == 0]
    assert len(got) == len(sub)
    for _, r in sub.iterrows():
        mu, sd = stats.loc[r.event_type]
        assert abs(got[r.event_id]["z"] - (r.m - mu) / sd) < 1e-5


def test_lognormal_fit_matches_numpy(spark, sf_dir):
    from guidewire_spark.operators.resample_ext import agg_lognormal_fit

    li = load_table(spark, sf_dir, "lineitem").toPandas()
    rows = {r["l_returnflag"]: r for r in agg_lognormal_fit(spark, sf_dir).collect()}
    for flag, grp in li.groupby("l_returnflag"):
        lx = np.round(np.log(grp.l_extendedprice.to_numpy()), 12)
        r = rows[flag]
        assert r["n"] == len(lx)
        assert abs(r["mu_log"] - lx.mean()) < 1e-5
        assert abs(r["sigma_log"] - lx.std(ddof=1)) < 1e-5
        implied = np.exp(lx.mean() + lx.var(ddof=1) / 2)
        assert abs(r["implied_mean"] - implied) < 1.0


def test_neyman_allocation_properties(spark, sf_dir):
    from guidewire_spark.operators.resample_ext import sample_neyman_allocation

    rows = sample_neyman_allocation(spark, sf_dir).collect()
    assert len(rows) == 5
    total = sum(r["neyman_n"] for r in rows)
    assert 1000 - 5 <= total <= 1000  # floor undershoot only
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-5
    # referee on the weights
    e = load_table(spark, sf_dir, "events").toPandas()
    milli = (e.value * 1000).round().astype("int64")
    g = e.assign(m=milli).groupby("event_type")["m"].agg(["size", "std"])
    weights = g["size"] * g["std"]
    for r in rows:
        ref = weights[r["event_type"]] / weights.sum()
        assert abs(r["share"] - ref) < 1e-5

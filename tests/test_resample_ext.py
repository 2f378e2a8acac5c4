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
    for b in range(64):
        flips = (per_user.user_id * 2654435761 + b * 40503) % 2
        if abs(diff(flips)) >= abs(d_obs):
            beats += 1
    p = (1 + beats) / 65
    row = agg_permutation_test(spark, sf_dir).collect()[0]
    assert row["n_perms"] == 64
    assert abs(row["observed_diff"] - d_obs / 1000) < 1e-5
    assert abs(row["p_value"] - p) < 1e-9
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

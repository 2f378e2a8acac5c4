"""Quality gates for the shrinkage_ext operators: numpy referees and
shrinkage-direction invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.shrinkage_ext import (
    agg_gamma_poisson_shrinkage,
    ts_retention_half_life,
)
from guidewire_spark.plans.catalog import load_table


def test_gamma_poisson_shrinks_toward_population_mean(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    counts = e.groupby("user_id").size()
    mu = counts.mean()
    var = counts.var(ddof=1)
    assert var > mu  # overdispersed fixture: the MoM prior is defined
    alpha = mu * mu / (var - mu)
    beta = mu / (var - mu)
    rows = agg_gamma_poisson_shrinkage(spark, sf_dir).collect()
    assert len(rows) == (counts.index % 10 == 0).sum()
    for r in rows:
        x = r["raw_count"]
        ref = (x + alpha) / (1 + beta)
        assert abs(r["shrunk_rate"] - ref) < 1e-4
        # shrinkage always moves the estimate TOWARD the mean
        if x > mu:
            assert mu - 1e-9 <= r["shrunk_rate"] <= x + 1e-9
        else:
            assert x - 1e-9 <= r["shrunk_rate"] <= mu + 1e-9


def test_retention_half_life_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    day = e.ts.dt.floor("D")
    d0 = day.groupby(e.user_id).transform("min")
    age = (day - d0).dt.days
    n_users = e.user_id.nunique()
    curve = (
        pd.DataFrame({"u": e.user_id, "age": age})
        .drop_duplicates()
        .query("1 <= age <= 14")
        .groupby("age")
        .size()
    )
    k = curve.index.to_numpy(float)
    lr = np.round(np.log(curve.to_numpy(float) / n_users), 12)
    slope = np.polyfit(k, lr, 1)[0]
    row = ts_retention_half_life(spark, sf_dir).collect()[0]
    assert row["n_points"] == len(k)
    assert abs(row["decay_per_day"] - slope) < 1e-6
    assert abs(row["half_life_days"] - (-np.log(2) / slope)) < 1e-2

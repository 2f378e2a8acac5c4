"""Quality gates for the mleval_ext operators: sklearn-free numpy
referees for AUC and log loss, decay-score monotonicity, and
centroid-separation geometry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.mleval_ext import (
    agg_auc_roc,
    agg_log_loss,
    embedding_centroid_separation,
    window_exponential_decay_score,
)
from guidewire_spark.plans.catalog import load_table


def test_auc_matches_numpy_midrank_formula(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    milli = (e.value * 1000).round().astype("int64")
    y = (e.event_type == "purchase").astype(int).to_numpy()
    ranks = pd.Series(milli).rank(method="average").to_numpy()
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    auc = (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    row = agg_auc_roc(spark, sf_dir).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    assert abs(row["auc"] - auc) < 1e-6
    assert 0.0 <= row["auc"] <= 1.0


def test_log_loss_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    p = np.clip(e.value.to_numpy() / 500.0, 0.001, 0.999)
    y = (e.event_type == "purchase").astype(int).to_numpy()
    ll = -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()
    row = agg_log_loss(spark, sf_dir).collect()[0]
    assert row["n"] == len(y)
    assert abs(row["log_loss"] - ll) < 1e-5


def test_decay_score_matches_numpy_and_is_recency_weighted(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    anchor = e.ts.max()
    sub = e[e.user_id % 25 == 0]
    got = {
        r["user_id"]: r
        for r in window_exponential_decay_score(spark, sf_dir).collect()
    }
    for uid, grp in sub.groupby("user_id"):
        milli = (grp.value * 1000).round().astype("int64").to_numpy()
        age_days = (anchor - grp.ts).dt.total_seconds().to_numpy() / 86400
        ref = (milli * np.power(2.0, -age_days / 7)).sum() / 1000
        r = got[uid]
        assert r["n_events"] == len(grp)
        assert abs(r["decayed_score"] - ref) < 1e-2
        # decay never exceeds the undecayed total
        assert r["decayed_score"] <= milli.sum() / 1000 + 1e-9


def test_centroid_separation_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").toPandas()
    vecs = np.round(np.stack(e.embedding.to_numpy()).astype(float) * 10000)
    labels = sorted(e.label.unique())
    cents = {l: vecs[e.label.to_numpy() == l].sum(axis=0) for l in labels}
    got = {
        (r["label_a"], r["label_b"]): r["centroid_cos"]
        for r in embedding_centroid_separation(spark, sf_dir).collect()
    }
    assert len(got) == len(labels) * (len(labels) - 1) // 2
    for (a, b), cos in got.items():
        ref = cents[a] @ cents[b] / (
            np.linalg.norm(cents[a]) * np.linalg.norm(cents[b])
        )
        assert abs(cos - ref) < 1e-6


def test_auc_ranks_over_distinct_value_aggregate(spark, sf_dir):
    # the ordered pass must consume the per-distinct-score aggregate,
    # never raw rows: the plan aggregates by milli BEFORE the window
    from guidewire_spark.operators.mleval_ext import agg_auc_roc as q

    df = q(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Window" in plan
    # a single-key grouping (by the milli score) feeds the window
    assert "Keys [1]: [_groupingexpression" in plan or "Keys [1]: [milli" in plan, plan

"""Quality gates for the integrity_ext operators: coverage-probability
sanity for the median CI, join accounting for pair coverage, and a
sklearn-free MCC referee.
"""

from __future__ import annotations

import numpy as np

from guidewire_spark.operators.integrity_ext import (
    agg_mcc_threshold,
    agg_median_ci_order_stat,
    multimodal_pair_coverage,
)
from guidewire_spark.plans.catalog import load_table


def test_median_ci_brackets_the_median(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    milli = np.sort((e.value * 1000).round().astype("int64").to_numpy())
    n = len(milli)
    row = agg_median_ci_order_stat(spark, sf_dir).collect()[0]
    assert row["n"] == n
    # the interval is the exact order statistics at the formula ranks
    r_lo = int(np.floor(n / 2 - 0.979981992270027 * np.sqrt(n)))
    r_hi = int(np.ceil(1 + n / 2 + 0.979981992270027 * np.sqrt(n)))
    assert row["ci_lo_milli"] == milli[r_lo - 1]
    assert row["ci_hi_milli"] == milli[r_hi - 1]
    # and it brackets the sample median
    assert row["ci_lo_milli"] <= row["median"] * 1000 <= row["ci_hi_milli"]


def test_pair_coverage_accounting(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id").toPandas()
    v = load_table(spark, sf_dir, "embeddings").select("vec_id").toPandas()
    docs, vecs = set(d.doc_id), set(v.vec_id)
    row = multimodal_pair_coverage(spark, sf_dir).collect()[0]
    assert row["paired"] == len(docs & vecs)
    assert row["docs_missing_embedding"] == len(docs - vecs)
    assert row["dangling_embeddings"] == len(vecs - docs)
    assert abs(row["doc_coverage"] - len(docs & vecs) / len(docs)) < 1e-9


def test_mcc_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    pred = e.value > 250
    pos = e.event_type == "purchase"
    tp = int((pred & pos).sum())
    fp = int((pred & ~pos).sum())
    fn = int((~pred & pos).sum())
    tn = int((~pred & ~pos).sum())
    mcc = (tp * tn - fp * fn) / np.sqrt(
        float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    row = agg_mcc_threshold(spark, sf_dir).collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert abs(row["mcc"] - mcc) < 1e-6
    assert -1.0 <= row["mcc"] <= 1.0


def test_risk_odds_ratio_matches_numpy(spark, sf_dir):
    from guidewire_spark.operators.integrity_ext import agg_risk_odds_ratio

    e = load_table(spark, sf_dir, "events").toPandas()
    exp = e.value > 250
    out = e.event_type == "purchase"
    a = int((exp & out).sum())
    b = int((exp & ~out).sum())
    c = int((~exp & out).sum())
    d = int((~exp & ~out).sum())
    row = agg_risk_odds_ratio(spark, sf_dir).collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, c, d)
    assert abs(row["risk_ratio"] - (a / (a + b)) / (c / (c + d))) < 1e-6
    assert abs(row["odds_ratio"] - a * d / (b * c)) < 1e-6
    assert abs(row["log_or_se"] - np.sqrt(1 / a + 1 / b + 1 / c + 1 / d)) < 1e-6


def test_bowley_skew_matches_numpy(spark, sf_dir):
    from guidewire_spark.operators.integrity_ext import agg_quantile_skewness

    li = load_table(spark, sf_dir, "lineitem").toPandas()
    rows = {r["l_returnflag"]: r for r in agg_quantile_skewness(spark, sf_dir).collect()}
    for flag, grp in li.groupby("l_returnflag"):
        c = (grp.l_extendedprice * 100).round().astype("int64").to_numpy()
        q1, q2, q3 = np.percentile(c, [25, 50, 75], method="linear")
        ref = (q3 + q1 - 2 * q2) / (q3 - q1)
        r = rows[flag]
        assert r["n"] == len(c)
        assert abs(r["bowley_skew"] - ref) < 1e-6
        assert -1.0 <= r["bowley_skew"] <= 1.0


def test_mann_kendall_matches_python(spark, sf_dir):
    import pandas as pd

    from guidewire_spark.operators.integrity_ext import ts_mann_kendall_trend

    e = load_table(spark, sf_dir, "events").toPandas()
    milli = (e.value * 1000).round().astype("int64")
    y = (
        pd.DataFrame({"day": e.ts.dt.floor("D"), "m": milli})
        .groupby("day")["m"]
        .agg(lambda s: int(s.sum()) // len(s))
        .sort_index()
        .to_numpy()
    )
    n = len(y)
    s = sum(
        int(np.sign(y[j] - y[i])) for i in range(n) for j in range(i + 1, n)
    )
    var = n * (n - 1) * (2 * n + 5) / 18
    z = (s - np.sign(s)) / np.sqrt(var) if s != 0 else 0.0
    row = ts_mann_kendall_trend(spark, sf_dir).collect()[0]
    assert row["s"] == s and row["n_pairs"] == n * (n - 1) // 2
    assert abs(row["z"] - z) < 1e-6

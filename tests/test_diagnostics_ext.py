"""Quality gates for the diagnostics_ext operators: numpy referees for
Ljung-Box and the stationary step, fertility invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.diagnostics_ext import (
    ts_ljung_box_q,
    ts_markov_stationary_step,
    vocab_subword_fertility,
)
from guidewire_spark.plans.catalog import load_table


def test_ljung_box_matches_numpy(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "events").toPandas()
    milli = (pdf.value * 1000).round().astype("int64")
    y = (
        pd.DataFrame({"day": pdf.ts.dt.floor("D"), "m": milli})
        .groupby("day")["m"]
        .agg(lambda s: int(s.sum()) // len(s))
        .sort_index()
        .to_numpy()
        .astype(float)
    )
    n = len(y)
    q = 0.0
    n_lags = 0
    for k in range(1, 8):
        a, b = y[k:], y[:-k]
        if a.std() == 0 or b.std() == 0:
            continue
        r = np.corrcoef(a, b)[0, 1]
        q += r * r / (n - k)
        n_lags += 1
    q *= n * (n + 2)
    row = ts_ljung_box_q(spark, sf_dir).collect()[0]
    assert row["n_days"] == n and row["n_lags"] == n_lags
    assert abs(row["lb_q"] - q) < 1e-3
    assert row["lb_q"] >= 0


def test_fertility_at_least_one(spark, sf_dir):
    rows = vocab_subword_fertility(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # a BPE-ish tokenization never merges across whitespace, so it
        # produces at least one token per word
        assert r["fertility"] >= 1.0
        assert r["bpe_tokens"] >= r["words"]


def test_stationary_step_matches_numpy_ppm(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "events").toPandas()
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    pdf["prev"] = pdf.groupby("user_id")["event_type"].shift()
    pairs = pdf.dropna(subset=["prev"])
    cnt = pairs.groupby(["prev", "event_type"]).size().unstack(fill_value=0)
    states = sorted(cnt.index)
    ppm = {}
    for s in states:
        row_sum = int(cnt.loc[s].sum())
        for t in states:
            ppm[(s, t)] = (int(cnt.loc[s].get(t, 0)) * 1_000_000) // row_sum
    k = len(states)
    v = {s: 1_000_000 // k for s in states}
    for _ in range(2):
        nv = {t: 0 for t in states}
        for t in states:
            nv[t] = sum(v[s] * ppm[(s, t)] for s in states) // 1_000_000
        v = nv
    got = {r["state"]: r for r in ts_markov_stationary_step(spark, sf_dir).collect()}
    assert set(got) == set(states)
    for s in states:
        assert got[s]["v2_ppm"] == v[s]
    # mass stays within the documented floor-truncation loss
    total = sum(r["v2_ppm"] for r in got.values())
    assert 1_000_000 - 3 * k * k <= total <= 1_000_000


def test_pacf_matches_numpy_durbin_levinson(spark, sf_dir):
    import pandas as pd

    from guidewire_spark.operators.diagnostics_ext import ts_pacf_closed_form

    pdf = load_table(spark, sf_dir, "events").toPandas()
    milli = (pdf.value * 1000).round().astype("int64")
    y = (
        pd.DataFrame({"day": pdf.ts.dt.floor("D"), "m": milli})
        .groupby("day")["m"]
        .agg(lambda s: int(s.sum()) // len(s))
        .sort_index()
        .to_numpy()
        .astype(float)
    )
    rs = [np.corrcoef(y[k:], y[:-k])[0, 1] for k in (1, 2, 3)]
    r1, r2, r3 = rs
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    p21 = r1 * (1 - p22)
    p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    row = ts_pacf_closed_form(spark, sf_dir).collect()[0]
    assert abs(row["pacf1"] - r1) < 1e-6
    assert abs(row["pacf2"] - p22) < 1e-6
    assert abs(row["pacf3"] - p33) < 1e-6


def test_dominant_period_matches_numpy_argmax(spark, sf_dir):
    import pandas as pd

    from guidewire_spark.operators.diagnostics_ext import ts_period_dominant

    pdf = load_table(spark, sf_dir, "events").toPandas()
    milli = (pdf.value * 1000).round().astype("int64")
    y = (
        pd.DataFrame({"day": pdf.ts.dt.floor("D"), "m": milli})
        .groupby("day")["m"]
        .agg(lambda s: int(s.sum()) // len(s))
        .sort_index()
        .to_numpy()
        .astype(float)
    )
    rs = {
        k: round(float(np.corrcoef(y[k:], y[:-k])[0, 1]), 6)
        for k in range(2, 15)
        if len(y) > k
    }
    best = max(rs.values())
    expected = min(k for k, r in rs.items() if r == best)
    row = ts_period_dominant(spark, sf_dir).collect()[0]
    assert row["dominant_period"] == expected
    assert abs(row["acf_peak"] - best) < 1e-6


def test_hill_numbers_ladder(spark, sf_dir):
    from guidewire_spark.operators.diagnostics_ext import (
        agg_diversity_hill_numbers,
    )

    d = load_table(spark, sf_dir, "documents").toPandas()
    p = d.source.value_counts(normalize=True).to_numpy()
    row = agg_diversity_hill_numbers(spark, sf_dir).collect()[0]
    assert row["hill_q0"] == len(p)
    assert abs(row["hill_q1"] - np.exp(-(p * np.log(p)).sum())) < 1e-3
    assert abs(row["hill_q2"] - 1 / (p * p).sum()) < 1e-3
    # the diversity ladder is non-increasing in q
    assert row["hill_q0"] >= row["hill_q1"] >= row["hill_q2"] > 0

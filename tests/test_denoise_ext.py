"""Quality gates for the denoise_ext operators: numpy referees for the
embedding decontamination and Holt-Winters recurrence, coverage
invariants for the span-corruption plan, and a plan audit for the
broadcast contract.
"""

from __future__ import annotations

import numpy as np

from guidewire_spark.operators.denoise_ext import (
    contamination_embedding_cosine,
    doc_span_corruption_plan,
    ts_holt_winters_seasonal,
)
from guidewire_spark.plans.catalog import load_table


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_embedding_decon_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").toPandas()
    vecs = np.round(np.stack(e.embedding.to_numpy()).astype(float) * 10000)
    ids = e.vec_id.to_numpy()
    bench = vecs[ids % 50 == 0]
    train = vecs[ids % 50 != 0]
    sims = (train @ bench.T) / (
        np.linalg.norm(train, axis=1, keepdims=True)
        * np.linalg.norm(bench, axis=1)
    )
    max_cos = sims.max(axis=1)
    row = contamination_embedding_cosine(spark, sf_dir).collect()[0]
    assert row["n_train"] == len(train)
    assert row["n_contaminated"] == int((max_cos >= 0.95).sum())
    assert abs(row["worst_cos"] - max_cos.max()) < 1e-6


def test_embedding_decon_broadcasts_bench_side(spark, sf_dir):
    plan = plan_of(contamination_embedding_cosine(spark, sf_dir))
    assert "BroadcastExchange" in plan  # bench side map-side, by contract


def test_span_plan_coverage_and_determinism(spark, sf_dir):
    rows = doc_span_corruption_plan(spark, sf_dir).collect()
    assert len(rows) > 0
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, spans in by_doc.items():
        n_tokens = spans[0]["n_tokens"]
        # every span starts inside the document and has the fixed length
        for s in spans:
            assert 0 <= s["start_tok"] < n_tokens - 2
            assert s["len_tok"] == 3
            # deterministic hash placement
            assert s["start_tok"] == (
                doc_id * 2654435761 + s["span_idx"] * 40503
            ) % (n_tokens - 2)
        # plan size targets ~15% corruption in 3-token spans
        assert len(spans) == max(n_tokens * 15 // 100 // 3, 1)
    # rerun → identical plan (no RNG anywhere)
    again = doc_span_corruption_plan(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_holt_winters_matches_numpy_recurrence(spark, sf_dir):
    import pandas as pd

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
    l = y[:7].sum() / 7
    b = (y[7:14].sum() / 7 - y[:7].sum() / 7) / 7
    s = list(y[:7] - l)
    for t in range(7, len(y)):
        nl = 0.5 * (y[t] - s[0]) + 0.5 * (l + b)
        b = 0.25 * (nl - l) + 0.75 * b
        s = s[1:] + [0.25 * (y[t] - nl) + 0.75 * s[0]]
        l = nl
    row = ts_holt_winters_seasonal(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(y)
    assert abs(row["level_milli"] - l) < 1e-2
    assert abs(row["trend_milli"] - b) < 1e-2
    assert abs(row["forecast_next_milli"] - (l + b + s[0])) < 1e-2


def test_holt_winters_short_series_degrades_to_empty(spark, tmp_path):
    """< 14 daily points: zero rows, never a negative-length slice
    error (the init consumes two full weeks)."""
    import datetime as dt

    short = spark.createDataFrame(
        [
            (
                i,
                i,
                "view",
                dt.datetime(2024, 1, 1 + i, 12, 0, 0),
                float(100 + i),
            )
            for i in range(10)
        ],
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    d = str(tmp_path / "short_events")
    short.write.parquet(d + "/events.parquet")
    assert ts_holt_winters_seasonal(spark, str(tmp_path / "short_events")).count() == 0

"""Quality gates for the curriculum_ext operators: SAX word sanity,
curriculum stage invariants, and systematic-sampling coverage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.curriculum_ext import (
    mix_curriculum_schedule,
    sample_systematic_nth,
    ts_sax_symbolization,
)
from guidewire_spark.plans.catalog import load_table


def test_sax_matches_numpy(spark, sf_dir):
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
    mean, sd = y.mean(), y.std(ddof=0)
    bp = 0.6744897501960817
    rows = sorted(
        ts_sax_symbolization(spark, sf_dir).collect(), key=lambda r: r["seg"]
    )
    assert len(rows) == len(y) // 5
    for r in rows:
        seg = y[r["seg"] * 5 : r["seg"] * 5 + 5]
        z = (seg.mean() - mean) / sd
        assert abs(r["z"] - z) < 1e-6
        ref = "a" if z < -bp else "b" if z < 0 else "c" if z < bp else "d"
        assert r["symbol"] == ref


def test_curriculum_stages_are_ordered_and_partition_budget(spark, sf_dir):
    out = (
        mix_curriculum_schedule(spark, sf_dir)
        .toPandas()
        .sort_values("order_idx")
    )
    assert (np.diff(out.cum_share.to_numpy()) > 0).all()
    assert abs(out.cum_share.iloc[-1] - 1.0) < 1e-9
    # stages are contiguous, start at 1, and non-decreasing in order
    stages = out.stage.to_numpy()
    assert stages[0] == 1 and set(stages) <= {1, 2, 3}
    assert (np.diff(stages) >= 0).all()


def test_systematic_sample_coverage(spark, sf_dir):
    got = sample_systematic_nth(spark, sf_dir).toPandas()
    pdf = load_table(spark, sf_dir, "events").toPandas()
    for uid, grp in pdf.groupby("user_id"):
        n = len(grp)
        expect = (n + 9) // 10  # every 10th starting at rank 1
        assert len(got[got.user_id == uid]) == expect
    # the sampled set always contains each user's earliest event
    first = pdf.sort_values(["ts", "event_id"]).groupby("user_id").head(1)
    sampled_ids = set(got.event_id)
    assert set(first.event_id) <= sampled_ids

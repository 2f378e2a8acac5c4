"""Quality gates for the lastmile_ext operators: numpy referees for
QTE and dispersion, and the expected audit outcome for the script
mismatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.lastmile_ext import (
    agg_index_of_dispersion,
    agg_quantile_treatment_effect,
    text_script_lang_mismatch,
)
from guidewire_spark.plans.catalog import load_table


def test_qte_matches_numpy_percentiles(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    milli = (e.value * 1000).round().astype("int64")
    a = milli[e.user_id % 2 == 0].to_numpy()
    b = milli[e.user_id % 2 == 1].to_numpy()
    row = agg_quantile_treatment_effect(spark, sf_dir).collect()[0]
    assert (row["n0"], row["n1"]) == (len(a), len(b))
    for p, col in ((50, "qte_p50"), (90, "qte_p90")):
        ref = (
            np.percentile(a, p, method="linear")
            - np.percentile(b, p, method="linear")
        ) / 1000
        assert abs(row[col] - ref) < 1e-6


def test_script_mismatch_flags_the_synthetic_zh_shard(spark, sf_dir):
    rows = {r["lang"]: r for r in text_script_lang_mismatch(spark, sf_dir).collect()}
    # the generator labels docs zh but writes Latin text — every zh doc
    # must be flagged; Latin-labeled shards must be clean
    assert rows["zh"]["n_mismatched"] == rows["zh"]["n_docs"] > 0
    for lang in ("en", "fr", "es", "de"):
        assert rows[lang]["n_mismatched"] == 0


def test_dispersion_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    got = {r["event_type"]: r for r in agg_index_of_dispersion(spark, sf_dir).collect()}
    daily = (
        pd.DataFrame({"t": e.event_type, "day": e.ts.dt.floor("D")})
        .groupby(["t", "day"])
        .size()
    )
    for t, grp in daily.groupby(level=0):
        c = grp.to_numpy(float)
        ref = c.var(ddof=1) / c.mean()
        assert got[t]["n_days"] == len(c)
        assert abs(got[t]["dispersion_index"] - ref) < 1e-6

"""Quality gates for the pyds_ext operators: raw-row checks for the
Python data source (partition parallelism + determinism), a numpy
referee for peaks, and a statsmodels-free z-test referee.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.pyds_ext import (
    _register_squares_source,
    agg_two_proportion_z,
    pyds_partitioned_source,
    ts_peak_detection,
)
from guidewire_spark.plans.catalog import load_table


def test_python_datasource_rows_and_partitions(spark):
    _register_squares_source(spark)
    df = (
        spark.read.format("gw_synth")
        .option("n", "1000")
        .option("partitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["i"]: r for r in df.collect()}
    assert len(rows) == 1000
    for i in (0, 1, 499, 999):
        r = rows[i]
        assert r["user_id"] == i % 100
        assert r["amount_cents"] == (i * 2654435761) % 100000
        assert r["day"] == i % 30


def test_pyds_aggregate_matches_python(spark, sf_dir):
    got = {r["bucket"]: r for r in pyds_partitioned_source(spark, sf_dir).collect()}
    ref: dict[int, list[int]] = {}
    for i in range(10000):
        b = i % 100 % 10
        ref.setdefault(b, [0, 0])
        ref[b][0] += 1
        ref[b][1] += (i * 2654435761) % 100000
    for b, (n, s) in ref.items():
        assert got[b]["n"] == n and got[b]["sum_cents"] == s


def test_peaks_match_numpy(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "events").toPandas()
    milli = (pdf.value * 1000).round().astype("int64")
    y = (
        pd.DataFrame({"day": pdf.ts.dt.floor("D"), "m": milli})
        .groupby("day")["m"]
        .agg(lambda s: int(s.sum()) // len(s))
        .sort_index()
        .to_numpy()
    )
    expected = {
        i
        for i in range(1, len(y) - 1)
        if y[i] > y[i - 1]
        and y[i] > y[i + 1]
        and y[i] - max(y[i - 1], y[i + 1]) >= 2000
    }
    got = {r["x"] for r in ts_peak_detection(spark, sf_dir).collect()}
    assert got == expected


def test_two_proportion_z_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    m = e.user_id % 2
    conv = e.event_type == "purchase"
    n0, c0 = int((m == 0).sum()), int(conv[m == 0].sum())
    n1, c1 = int((m == 1).sum()), int(conv[m == 1].sum())
    p = (c0 + c1) / (n0 + n1)
    z = (c0 / n0 - c1 / n1) / np.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
    row = agg_two_proportion_z(spark, sf_dir).collect()[0]
    assert (row["n0"], row["c0"], row["n1"], row["c1"]) == (n0, c0, n1, c1)
    assert abs(row["z"] - z) < 1e-6

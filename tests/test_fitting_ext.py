"""Quality gates for the fitting_ext operators: solve the distributed
normal equations against numpy.lstsq, check tile-plan geometry, WAP
failure semantics, and the interval-frame window against pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from guidewire_spark.operators.fitting_ext import (
    agg_ols_normal_equations,
    multimodal_tile_plan,
    sql_window_interval_frame,
    tokenizer_char_coverage,
)
from guidewire_spark.plans.catalog import load_table


def test_normal_equations_solve_matches_lstsq(spark, sf_dir):
    rows = agg_ols_normal_equations(spark, sf_dir).collect()
    g = np.zeros((9, 9))
    for r in rows:
        g[r["i"], r["j"]] = r["v"]
        g[r["j"], r["i"]] = r["v"]
    xtx, xty = g[:8, :8], g[:8, 8]
    beta = np.linalg.solve(xtx, xty)

    # referee: build the design matrix from raw events
    pdf = load_table(spark, sf_dir, "events").toPandas()
    milli = (pdf.value * 1000).round().astype("int64")
    daily = (
        pd.DataFrame({"day": pdf.ts.dt.floor("D"), "m": milli})
        .groupby("day")["m"]
        .agg(lambda s: int(s.sum()) // len(s))
        .sort_index()
    )
    x = (daily.index - pd.Timestamp("2024-01-01")).days.to_numpy()
    dow = (daily.index.dayofweek.to_numpy() + 1) % 7  # 0=Sunday
    X = np.column_stack(
        [np.ones_like(x), x] + [(dow == d).astype(int) for d in range(1, 7)]
    )
    ref, *_ = np.linalg.lstsq(X.astype(float), daily.to_numpy().astype(float),
                              rcond=None)
    assert np.allclose(beta, ref, atol=1e-6)


def test_char_coverage_bounds(spark, sf_dir):
    row = tokenizer_char_coverage(spark, sf_dir).collect()[0]
    d = load_table(spark, sf_dir, "documents").toPandas()
    total = int(d.text.str.len().sum())
    distinct = len(set("".join(d.text)))
    assert row["total_chars"] == total
    assert row["n_distinct_chars"] == distinct
    assert 1 <= row["chars_for_9995"] <= distinct
    # referee: greedy coverage on pandas frequencies
    freq = pd.Series(list("".join(d.text))).value_counts()
    need = int(np.ceil(total * 0.9995))
    cum, k = 0, 0
    for n in freq.to_numpy():
        if cum >= need:
            break
        cum += int(n)
        k += 1
    assert row["chars_for_9995"] == k


def test_tile_plan_covers_every_pixel_once(spark, sf_dir):
    tiles = multimodal_tile_plan(spark, sf_dir).toPandas()
    for doc_id, grp in tiles.groupby("doc_id"):
        w, h = int(grp.w.iloc[0]), int(grp.h.iloc[0])
        # tiles partition the image: areas sum to w*h, no overlaps
        area = ((grp.x1 - grp.x0) * (grp.y1 - grp.y0)).sum()
        assert area == w * h
        assert (grp.x1 <= w).all() and (grp.y1 <= h).all()
        assert len(grp) == -(-w // 16) * (-(-h // 16))


def test_wap_audit_blocks_bad_publish(spark, sf_dir, tmp_path):
    from guidewire_spark.sources.snapshot import read_delta
    from guidewire_spark.sources.writer import shallow_clone, write_delta
    import pyspark.sql.functions as SF

    staging = str(tmp_path / "staging")
    published = str(tmp_path / "published")
    bad = (
        load_table(spark, sf_dir, "nation")
        .select(
            SF.lit(None).cast("long").alias("n_nationkey"),
            "n_name",
            SF.col("n_regionkey").cast("long").alias("regionkey"),
        )
    )
    write_delta(bad, staging, mode="append")
    staged = read_delta(spark, staging)
    audit = staged.agg(
        SF.sum(SF.col("n_nationkey").isNull().cast("int")).alias("null_keys")
    ).collect()[0]
    # the audit catches the nulls; publish must not happen
    assert audit["null_keys"] > 0
    import os

    assert not os.path.isdir(os.path.join(published, "_delta_log"))


def test_interval_frame_matches_pandas_rolling(spark, sf_dir):
    out = sql_window_interval_frame(spark, sf_dir).toPandas()
    pdf = load_table(spark, sf_dir, "events").toPandas()
    pdf = pdf[pdf.user_id % 25 == 0].copy()
    pdf["milli"] = (pdf.value * 1000).round().astype("int64")
    for uid, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("ts")
        s = grp.set_index("ts")["milli"]
        ref = s.rolling("1D").sum()  # trailing 24h inclusive window
        got = out[out.user_id == uid].sort_values("ts_us")
        assert np.array_equal(
            got.trailing_day_milli.to_numpy(), ref.to_numpy().astype("int64")
        )

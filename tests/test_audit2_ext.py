"""Quality gates for the audit2_ext operators: a brute-force skyline
referee plus a no-global-window plan audit, script-profile sanity on
multilingual docs, and freshness invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.audit2_ext import (
    dq_freshness_lag,
    skyline_pareto_frontier,
    text_unicode_script_profile,
)
from guidewire_spark.plans.catalog import load_table


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_skyline_matches_bruteforce(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").toPandas()
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    o["us"] = o.o_orderdate.astype("int64") // 1000
    pts = o[["o_orderkey", "cents", "us"]].to_numpy()
    keep = []
    for k, c, u in pts:
        dominated = (
            ((pts[:, 1] > c) & (pts[:, 2] <= u))
            | ((pts[:, 1] >= c) & (pts[:, 2] < u))
        ).any()
        if not dominated:
            keep.append(int(k))
    got = {r["o_orderkey"] for r in skyline_pareto_frontier(spark, sf_dir).collect()}
    assert got == set(keep)


def test_skyline_windows_are_partitioned(spark, sf_dir):
    # the data-sized window must be partitioned by pid (its exchange
    # hashes on pid); the only SinglePartition window allowed is the
    # partition-count-sized prefix combine
    plan = plan_of(skyline_pareto_frontier(spark, sf_dir))
    assert "SPARK_PARTITION_ID()" in plan
    assert "hashpartitioning(pid" in plan  # big window's exchange
    assert "rangepartitioning(price_cents" in plan  # phase-1 ordering


def test_script_profile_zh_docs_are_mostly_cjk(spark, sf_dir):
    rows = text_unicode_script_profile(spark, sf_dir).collect()
    by_lang: dict[str, dict[str, int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["script"]] = r["n_chars"]
    # the synthetic corpus labels documents zh but generates Latin
    # text — precisely the mislabeling this audit exists to surface:
    # the profile must show the zh shard is NOT CJK-dominated
    zh = by_lang.get("zh", {})
    if zh:
        non_space = sum(zh.values()) - zh.get("space", 0)
        assert zh.get("latin", 0) + zh.get("digit", 0) > 0.5 * non_space
    en = by_lang["en"]
    assert en.get("latin", 0) > en.get("cjk", 0)
    # totals reconcile with the raw corpus
    d = load_table(spark, sf_dir, "documents").toPandas()
    assert sum(sum(v.values()) for v in by_lang.values()) == int(
        d.text.str.len().sum()
    )


def test_freshness_lags_consistent(spark, sf_dir):
    rows = dq_freshness_lag(spark, sf_dir).collect()
    assert len(rows) == 5
    freshest = [r for r in rows if r["lag_s"] == 0]
    assert len(freshest) >= 1 and not any(r["stale"] for r in freshest)
    for r in rows:
        assert r["stale"] == (r["lag_s"] * 1_000_000 > 3600 * 1_000_000) or (
            # boundary: lag in (3600s, 3601s) truncates to 3600
            r["stale"] and r["lag_s"] == 3600
        )

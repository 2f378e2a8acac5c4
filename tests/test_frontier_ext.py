"""Gates for frontier_ext: PII planted-detection, DiD identity, and
elasticity sign sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from guidewire_spark.plans.catalog import load_table


def test_pii_scan_detects_planted_pii(spark, tmp_path):
    from guidewire_spark.operators.frontier_ext import dq_pii_pattern_scan

    docs = [
        (1, "contact me at jane.doe@example.com or (555) 123-4567", "en",
         "web", 50),
        (2, "ssn on file 123-45-6789 twice: 987-65-4321", "en", "web", 40),
        (3, "perfectly clean prose with no identifiers at all", "en",
         "web", 48),
    ]
    d = str(tmp_path / "pii_docs")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(d + "/documents.parquet")
    got = {r["pattern"]: (r["n_hits"], r["n_docs"])
           for r in dq_pii_pattern_scan(spark, d).collect()}
    assert got["email"] == (1, 1)
    assert got["phone_us"] == (1, 1)
    assert got["ssn_like"] == (2, 1)


def test_did_decomposition_identity(spark, sf_dir):
    from guidewire_spark.operators.frontier_ext import agg_diff_in_diff

    row = agg_diff_in_diff(spark, sf_dir).collect()[0]
    assert abs(
        row["did_estimate"] - (row["treated_delta"] - row["control_delta"])
    ) < 2e-6  # identity up to the 6dp rounding of each term


def test_elasticity_matches_numpy_fit(spark, sf_dir):
    import numpy as np

    from guidewire_spark.operators.frontier_ext import (
        agg_price_elasticity_loglog,
    )

    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["unit_cents"] = (li.l_extendedprice / li.l_quantity * 100).round()
    pq = li.groupby("l_partkey").agg(
        unit_cents=("unit_cents", "mean"), qty=("l_quantity", lambda s: s.round().sum())
    )
    pq = pq[(pq.unit_cents.astype("int64") > 0) & (pq.qty > 0)]
    x = np.round(np.log(pq.unit_cents.astype("int64").astype(float)), 12)
    y = np.round(np.log(pq.qty.astype(float)), 12)
    slope, intercept = np.polyfit(x, y, 1)
    row = agg_price_elasticity_loglog(spark, sf_dir).collect()[0]
    assert row["n_parts"] == len(pq)
    assert abs(row["elasticity"] - slope) < 1e-4
    assert abs(row["log_intercept"] - intercept) < 1e-3


def test_shapley_efficiency_property(spark, sf_dir):
    """Shapley values must satisfy efficiency: they sum to
    v(grand coalition) - v(empty coalition) exactly (up to per-term
    rounding)."""
    from guidewire_spark.operators.frontier_ext import (
        agg_shapley_channel_attribution,
    )

    e = load_table(spark, sf_dir, "events").toPandas()
    per_user = e.pivot_table(
        index="user_id",
        values="event_id",
        columns="event_type",
        aggfunc="count",
    ).notna()
    for col in ("view", "click", "share", "purchase"):
        if col not in per_user:
            per_user[col] = False
    grp = per_user.groupby(["view", "click", "share"])["purchase"].mean()

    def v(key):
        return grp.get(key, 0.0)

    total = v((True, True, True)) - v((False, False, False))
    rows = {r["channel"]: r["shapley_value"]
            for r in agg_shapley_channel_attribution(spark, sf_dir).collect()}
    assert set(rows) == {"view", "click", "share"}
    assert abs(sum(rows.values()) - total) < 5e-6

"""Invariant gates for the bands/metrics/survival operators: the
mathematical properties each statistic must satisfy regardless of
data, plus referee checks where a simple independent computation
exists."""

from __future__ import annotations

from pyspark.sql import functions as F

from guidewire_spark.operators.bands_ext import (
    agg_weighted_median,
    dedup_dup_ratio_by_source,
    ts_bollinger_bands,
    window_pareto_8020,
)
from guidewire_spark.operators.metrics_ext import (
    sample_balanced_classes,
    text_zipf_slope,
    ts_max_drawdown,
    ts_weekly_churn_rate,
)
from guidewire_spark.operators.survival_ext import ts_kaplan_meier
from guidewire_spark.plans.catalog import load_table


def test_bollinger_bands_bracket_mid(spark, sf_dir):
    got = ts_bollinger_bands(spark, sf_dir).toPandas()
    assert (got["upper_band"] >= got["mid"]).all()
    assert (got["lower_band"] <= got["mid"]).all()
    # bands are symmetric around mid to rounding tolerance
    assert (
        (got["upper_band"] - got["mid"]) - (got["mid"] - got["lower_band"])
    ).abs().max() < 1e-3


def test_weighted_median_within_range(spark, sf_dir):
    got = agg_weighted_median(spark, sf_dir).toPandas().set_index("l_returnflag")
    rng = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .toPandas()
        .set_index("l_returnflag")
    )
    for flag in got.index:
        assert rng.loc[flag, "lo"] <= got.loc[flag, "weighted_median"]
        assert got.loc[flag, "weighted_median"] <= rng.loc[flag, "hi"]


def test_pareto_point_consistency(spark, sf_dir):
    row = window_pareto_8020(spark, sf_dir).collect()[0]
    assert 0 < row["k_customers"] <= row["n_customers"]
    assert row["revenue_share"] >= 0.8  # first crossing is at/above 80%
    assert abs(row["customer_frac"] - row["k_customers"] / row["n_customers"]) < 1e-4


def test_dup_ratio_accounting(spark, sf_dir):
    got = dedup_dup_ratio_by_source(spark, sf_dir).toPandas()
    assert (got["n_docs"] == got["n_unique"] + got["n_duplicates"]).all()
    assert ((got["dup_ratio"] >= 0) & (got["dup_ratio"] < 1)).all()


def test_drawdown_nonnegative_and_bounded(spark, sf_dir):
    got = ts_max_drawdown(spark, sf_dir).toPandas()
    assert (got["max_drawdown"] >= 0).all()


def test_balanced_classes_exact_k(spark, sf_dir):
    got = sample_balanced_classes(spark, sf_dir).toPandas()
    per_label = got.groupby("label").size()
    assert per_label.nunique() == 1  # every class exactly k
    sizes = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .count()
        .toPandas()["count"]
    )
    assert per_label.iloc[0] == sizes.min()


def test_churn_rates_valid(spark, sf_dir):
    got = ts_weekly_churn_rate(spark, sf_dir).toPandas()
    assert ((got["churn_rate"] >= 0) & (got["churn_rate"] <= 1)).all()
    assert (got["churned_users"] <= got["active_users"]).all()


def test_zipf_slope_negative(spark, sf_dir):
    row = text_zipf_slope(spark, sf_dir).collect()[0]
    assert row["n_points"] > 10  # sf0.001 vocabulary is small
    assert row["zipf_slope"] < 0  # frequency falls with rank, always


def test_kaplan_meier_monotone_nonincreasing(spark, sf_dir):
    got = (
        ts_kaplan_meier(spark, sf_dir)
        .toPandas()
        .sort_values("t_hours")
        .reset_index(drop=True)
    )
    assert ((got["survival"] > 0) & (got["survival"] <= 1)).all()
    assert (got["survival"].diff().dropna() <= 1e-9).all()  # non-increasing
    assert (got["d"] <= got["n_at_risk"]).all()

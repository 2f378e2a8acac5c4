"""Quality gates for mlprep_ext: quantile-normalization distribution
identity, FFD packing invariants (the rows-only operator's contract),
HLL intersection accuracy vs exact, and link-prediction score
bounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from guidewire_spark.operators.mlprep_ext import (
    agg_hll_intersection_estimate,
    graph_jaccard_link_prediction,
    mix_quantile_normalize,
    pack_first_fit_decreasing,
)
from guidewire_spark.plans.catalog import load_table


def test_quantile_normalize_equalizes_distributions(spark, sf_dir):
    got = mix_quantile_normalize(spark, sf_dir).toPandas()
    # after QN, every equal-sized source has the IDENTICAL multiset of
    # normalized values (the defining property of quantile normalization)
    sizes = got.groupby("source").size()
    groups = {
        src: tuple(sorted(g["normalized"]))
        for src, g in got.groupby("source")
        if sizes[src] == sizes.iloc[0]
    }
    assert len(set(groups.values())) == 1
    # normalized values are drawn from the pooled distribution
    pooled = sorted(got["n_chars"])
    assert set(got["normalized"]) <= set(pooled)


def test_quantile_normalize_grid_tracks_exact_twin(spark, sf_dir):
    """The percentile-grid scale path must approximate the exact
    operator: per-document relative error bounded, and the grid output
    must preserve the exact twin's within-source ordering.  (The
    registered query now emits the aggregate accuracy booleans itself;
    this test drives the underlying per-doc pipeline directly.)"""
    from guidewire_spark.operators.mlprep_ext import (
        _grid_normalized,
        mix_quantile_normalize_grid,
    )

    summary = mix_quantile_normalize_grid(spark, sf_dir).collect()[0]
    assert summary["median_rel_err_lt_2pct"]
    assert summary["p95_rel_err_lt_10pct"]

    exact = mix_quantile_normalize(spark, sf_dir).toPandas().set_index("doc_id")
    grid = _grid_normalized(spark, sf_dir).toPandas().set_index("doc_id")
    j = exact.join(grid, lsuffix="_e", rsuffix="_g")
    rel = (
        (j["normalized_g"] - j["normalized_e"]).abs()
        / j["normalized_e"].clip(lower=1)
    )
    assert rel.median() < 0.02
    assert rel.quantile(0.95) < 0.10
    # monotone in rank within each source (interpolating a sorted grid
    # at a monotone quantile cannot invert the order)
    for _, g in j.reset_index().groupby("source_g"):
        s = g.sort_values("normalized_e")["normalized_g"]
        assert s.is_monotonic_increasing


def test_ffd_packing_invariants(spark, sf_dir):
    got = pack_first_fit_decreasing(spark, sf_dir).toPandas()
    total_docs = load_table(spark, sf_dir, "documents").count()
    assert len(got) == total_docs
    assert got["doc_id"].is_unique
    capacity = 2000
    fills = got.groupby(["lang", "shard_id"])["n_chars"].sum()
    singles = got.groupby(["lang", "shard_id"])["n_chars"].count()
    # every multi-doc shard respects capacity; oversize docs are singletons
    over = fills[fills > capacity]
    for key in over.index:
        assert singles[key] == 1
    # shard_fill column is consistent with the actual fill
    merged = got.merge(
        fills.rename("actual"), left_on=["lang", "shard_id"], right_index=True
    )
    assert (merged["shard_fill"] == merged["actual"]).all()
    # FFD bound: shards <= 1.23 * volume lower bound + 1, per lang
    for lang, g in got.groupby("lang"):
        n_shards = g["shard_id"].nunique()
        lower = math.ceil(g["n_chars"].sum() / capacity)
        n_oversize = (g["n_chars"] > capacity).sum()
        assert n_shards <= math.ceil(1.23 * lower) + 1 + n_oversize


def test_hll_intersection_within_tolerance(spark, sf_dir):
    row = agg_hll_intersection_estimate(spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events")
    viewers = e.where(F.col("event_type") == "view").select("user_id").distinct()
    buyers = e.where(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = viewers.intersect(buyers).count()
    assert row["exact_intersection"] == exact
    assert row["union_within_bound"]
    assert row["intersection_within_bound"]


def test_link_prediction_scores_are_valid_jaccard(spark, sf_dir):
    got = graph_jaccard_link_prediction(spark, sf_dir).toPandas()
    assert len(got) <= 20
    assert (got["common"] >= 1).all()
    assert ((got["score_ppm"] > 0) & (got["score_ppm"] <= 1_000_000)).all()
    assert (got["s1"] < got["s2"]).all()

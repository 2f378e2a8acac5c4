"""Quality gates for pipeline_ext + the left-outer stream-stream
join: allocator invariants, SCD2 history-shape properties, assignment
totality, a pandas referee for the sequence-pattern counter, and the
outer-join flush guarantee (the class of bug where unmatched rows
strand in the state store when the query stops)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from guidewire_spark.operators.pipeline_ext import (
    delta_scd2_merge,
    embedding_assign_centroid,
    mix_token_budget_allocation,
    ts_pattern_three_rises,
)
from guidewire_spark.plans.catalog import load_table


def test_token_budget_allocator_invariants(spark, sf_dir):
    got = mix_token_budget_allocation(spark, sf_dir).toPandas()
    # never allocate more than a source supplies, never exceed budget
    assert (got["quota"] <= got["tokens"]).all()
    assert got["quota"].sum() <= 40000
    # waterfilling: if any source is below its supply, the budget must
    # be (nearly) exhausted — integer division may strand < n_sources
    if (got["quota"] < got["tokens"]).any():
        assert got["quota"].sum() >= 40000 - 2 * len(got)
    assert ((got["utilization"] > 0) & (got["utilization"] <= 1.0)).all()


def test_scd2_history_shape(spark, sf_dir):
    got = delta_scd2_merge(spark, sf_dir).toPandas()
    cur = got[got["is_current"]]
    # exactly one current row per business key
    assert cur["c_custkey"].is_unique
    # closed rows: valid_to set, and a successor current row exists
    closed = got[~got["is_current"]]
    assert closed["valid_to"].notna().all()
    assert set(closed["c_custkey"]) <= set(cur["c_custkey"])
    succ = cur.set_index("c_custkey").loc[closed["c_custkey"]]
    assert (succ["c_mktsegment"] == "UPGRADED").all()
    assert (succ["valid_from"] == "2024-06-01").all()


def test_centroid_assignment_is_total(spark, sf_dir):
    got = embedding_assign_centroid(spark, sf_dir).toPandas()
    total = load_table(spark, sf_dir, "embeddings").count()
    # every vector assigned to exactly one centroid
    assert got["n"].sum() == total
    labels = set(
        r[0]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("label")
        .distinct()
        .collect()
    )
    assert set(got["assigned_label"]) <= labels


def test_three_rises_matches_pandas(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "events").toPandas()
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    def count_rises(s: pd.Series) -> int:
        v, v1, v2 = s, s.shift(1), s.shift(2)
        return int(((v > v1) & (v1 > v2)).sum())
    expected = pdf.groupby("user_id")["value"].apply(count_rises)
    got = (
        ts_pattern_three_rises(spark, sf_dir)
        .toPandas()
        .set_index("user_id")["n_patterns"]
    )
    assert got.sort_index().equals(expected.sort_index().astype("int64"))


def test_stream_left_outer_flushes_all_unmatched(spark, sf_dir):
    """The outer join must emit EVERY unmatched purchase before the
    query stops — the watermark-pushdown bug class this operator's
    docstring documents left the newest ~25 h stranded in state."""
    from guidewire_spark.streaming.jobs import stream_stream_left_outer_join

    got = stream_stream_left_outer_join(spark, sf_dir)
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 4 == 1)
    p = e.where(F.col("event_type") == "purchase").alias("p")
    v = e.where(F.col("event_type") == "view").alias("v")
    batch = p.join(
        v,
        (F.col("p.user_id") == F.col("v.user_id"))
        & (F.col("v.ts") >= F.col("p.ts") - F.expr("INTERVAL 24 HOURS"))
        & (F.col("v.ts") <= F.col("p.ts")),
        "left_outer",
    )
    assert got.count() == batch.count()
    assert (
        got.where(F.col("view_id").isNull()).count()
        == batch.where(F.col("v.event_id").isNull()).count()
    )
    assert got.where(F.col("purchase_id") < 0).count() == 0

"""Property gates for the two-phase global-order helpers: random data
and random partition counts must reproduce the single-window answer
exactly — ranks, running sums, totals, and boundary-stitched leads.
This is the boundary-stitch correctness the 7 round-5 retrofits lean
on (partition cuts land in arbitrary places; offsets must compose).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from guidewire_spark.operators.twophase import (
    ntile_from_rank,
    two_phase_lead,
    two_phase_ordered,
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # value (duplicates likely)
        st.one_of(  # payload, with NULLs (the window-NULL semantics path)
            st.none(), st.integers(min_value=-100, max_value=100)
        ),
    ),
    min_size=1,
    max_size=60,
)


@given(rows=rows_strategy, parts=st.integers(min_value=1, max_value=7))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_two_phase_ordered_matches_global_window(spark, rows, parts):
    data = [(i, v, p) for i, (v, p) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, v long, p long")
    got = (
        two_phase_ordered(
            df,
            [F.asc("v"), F.asc("id")],
            parts=parts,
            rank_name="rnk",
            total_name="n",
            cumsums={"cum": "p"},
            sum_totals={"tot": "p"},
        )
        .orderBy("rnk")
        .collect()
    )
    ref = sorted(data, key=lambda t: (t[1], t[0]))
    non_null = [p for _, _, p in data if p is not None]
    total_p = sum(non_null) if non_null else None
    run, seen = 0, 0
    assert len(got) == len(ref)
    for rank0, ((rid, rv, rp), row) in enumerate(zip(ref, got)):
        if rp is not None:
            run += rp
            seen += 1
        assert (row["id"], row["v"], row["p"]) == (rid, rv, rp)
        assert row["rnk"] == rank0 + 1
        assert row["n"] == len(ref)
        # SUM window semantics: NULL until the first non-null, then
        # nulls ignored
        assert row["cum"] == (run if seen else None)
        assert row["tot"] == total_p


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=60
    ),
    parts=st.integers(min_value=1, max_value=7),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_two_phase_lead_stitches_boundaries(spark, keys, parts):
    keys = sorted(set(keys))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["nk"]
        for r in two_phase_lead(
            df, "k", parts=parts, lead_name="nk"
        ).collect()
    }
    for a, b in zip(keys, keys[1:]):
        assert got[a] == b
    assert got[keys[-1]] is None  # the global tail stays NULL


def test_ntile_from_rank_matches_window_ntile(spark):
    df = spark.range(0, 97).select(F.col("id"))
    from pyspark.sql import Window

    ref = df.select(
        "id", F.ntile(7).over(Window.orderBy("id")).alias("want")
    )
    got = two_phase_ordered(
        df, [F.asc("id")], rank_name="rnk", total_name="n"
    ).withColumn("have", ntile_from_rank(7, "rnk", "n"))
    j = ref.join(got, "id").where(F.col("want") != F.col("have"))
    assert j.count() == 0


def test_two_phase_guards(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    df = spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("v"))
    with _pytest.raises(ValueError, match="share output names"):
        two_phase_ordered(
            df, [F.asc("id")], cumsums={"x": "v"}, sum_totals={"x": "v"}
        )
    clash = df.withColumn("__offset", F.lit(1))
    with _pytest.raises(ValueError, match="collide"):
        two_phase_ordered(clash, [F.asc("id")])
    with _pytest.raises(ValueError, match="collide"):
        two_phase_lead(clash, "id")


def test_two_phase_lead_excludes_null_keys(spark):
    df = spark.createDataFrame(
        [(None,), (1,), (3,), (None,), (7,)], "k int"
    )
    got = {
        r["k"]: r["nk"]
        for r in two_phase_lead(df, "k", parts=3, lead_name="nk").collect()
    }
    # NULL keys are absent ids, not sequence members
    assert got == {1: 3, 3: 7, 7: None}


def test_two_phase_partitioning_is_pinned_for_both_consumers(spark, sf_dir):
    """Round-6 latent-bug regression: the parts-row summary is a
    SECOND consumer of the sampled range exchange.  When column
    pruning makes the two consumers' scans differ, the exchange is
    not reused and each branch samples its OWN boundaries — local
    ranks under boundary set A plus offsets under set B produce
    duplicate/gapped global ranks.  _pin_partitioning (persist) must
    keep the pid assignment shared: a wide downstream (per-frame
    percentile aggregation that prunes differently per branch) must
    yield exactly one row per input row, every time."""
    from guidewire_spark.operators.stats_ext import window_rolling_median
    from guidewire_spark.plans.catalog import load_table

    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    want = e.count()
    for _ in range(3):
        got = window_rolling_median(spark, sf_dir).collect()
        assert len(got) == want
        assert len({r["event_id"] for r in got}) == want
    # the plan carries the cache pin and the range exchange inside it
    plan = window_rolling_median(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan

"""Quality gates for the parity_ext operators: a plan audit for the
existence-mark join, referees for the rate test and power analysis.
"""

from __future__ import annotations

import numpy as np

from guidewire_spark.operators.parity_ext import (
    agg_power_analysis_mde,
    join_existence_mark,
    sql_identifier_clause,
    ts_poisson_rate_test,
)
from guidewire_spark.plans.catalog import load_table


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_identifier_clause_plan_matches_literal_table(spark, sf_dir):
    # the IDENTIFIER binding must not defeat pushdown: the scan reads
    # only the two referenced columns
    plan = plan_of(sql_identifier_clause(spark, sf_dir))
    assert "o_orderstatus" in plan and "o_totalprice" in plan
    assert "o_custkey" not in plan  # unreferenced column pruned


def test_existence_mark_uses_existence_join(spark, sf_dir):
    plan = plan_of(join_existence_mark(spark, sf_dir))
    assert "ExistenceJoin" in plan, plan


def test_existence_mark_flags_match_pandas(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    open_custs = set(o.loc[o.o_orderstatus == "O", "o_custkey"])
    got = {
        r["c_custkey"]: r["has_open_order"]
        for r in join_existence_mark(spark, sf_dir).collect()
    }
    assert len(got) == len(c)
    for k in c.c_custkey:
        assert got[k] == (k in open_custs)


def test_poisson_rate_test_matches_counts(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    n0 = int((e.user_id % 2 == 0).sum())
    n1 = int((e.user_id % 2 == 1).sum())
    row = ts_poisson_rate_test(spark, sf_dir).collect()[0]
    assert (row["n0"], row["n1"]) == (n0, n1)
    assert abs(row["z"] - (n0 - n1) / np.sqrt(n0 + n1)) < 1e-6
    assert abs(row["rate_ratio"] - n0 / n1) < 1e-6


def test_power_analysis_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    milli = (e.value * 1000).round().astype("int64").to_numpy()
    n_min = min(
        int((e.user_id % 2 == 0).sum()), int((e.user_id % 2 == 1).sum())
    )
    var = milli.var(ddof=1)
    mde = (1.959963985 + 0.8416212336) * np.sqrt(2 * var / n_min)
    row = agg_power_analysis_mde(spark, sf_dir).collect()[0]
    assert row["n_per_arm"] == n_min
    assert abs(row["sd"] - np.sqrt(var) / 1000) < 1e-4
    assert abs(row["mde_abs"] - mde / 1000) < 1e-4
    assert abs(row["mde_rel"] - mde / milli.mean()) < 1e-4
    # sanity: the MDE shrinks with n — recomputing at 4x the traffic
    # halves it
    assert abs(
        (1.959963985 + 0.8416212336) * np.sqrt(2 * var / (4 * n_min)) / mde
        - 0.5
    ) < 1e-9


def test_sql_scripting_loop_terminates_at_correct_threshold(spark, sf_dir):
    from guidewire_spark.operators.parity_ext import (
        sql_scripting_threshold_search,
    )
    from guidewire_spark.plans.catalog import load_table as _lt

    row = sql_scripting_threshold_search(spark, sf_dir).collect()[0]
    o = _lt(spark, sf_dir, "orders").toPandas()
    # the returned threshold is the FIRST 50k multiple under 100
    t = row["threshold"]
    assert (o.o_totalprice > t).sum() == row["n_above"] < 100
    assert t % 50000 == 0
    if t > 50000:
        assert (o.o_totalprice > t - 50000).sum() >= 100


def test_pandas_api_stays_distributed(spark, sf_dir):
    # the pandas-API pipeline must compile to a Spark plan, not
    # collect: to_spark() exposes the logical plan with an aggregate
    from guidewire_spark.operators.parity_ext import pandas_api_groupby

    df = pandas_api_groupby(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "HashAggregate" in plan or "SortAggregate" in plan
    assert df.count() == 3

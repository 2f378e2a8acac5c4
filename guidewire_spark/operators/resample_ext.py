"""Resampling inference and leakage-free feature encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from guidewire_spark.plans.catalog import load_table
from guidewire_spark.registry import query


def _r(col: F.Column, dp: int, prec: str = "decimal(24,10)") -> F.Column:
    """Engine-stable rounding: DECIMAL bridge then round, as double."""
    return F.round(col.cast(prec), dp).cast("double")


@query(
    "agg_permutation_test",
    oracle="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm, COUNT(*) AS n,
             SUM(CAST(ROUND(value * 1000, 0) AS BIGINT)) AS s
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT (CAST(SUM(CASE WHEN arm = 0 THEN s ELSE 0 END) AS DOUBLE)
              / SUM(CASE WHEN arm = 0 THEN n ELSE 0 END))
             - (CAST(SUM(CASE WHEN arm = 1 THEN s ELSE 0 END) AS DOUBLE)
                / SUM(CASE WHEN arm = 1 THEN n ELSE 0 END)) AS d_obs
      FROM per_user
    ),
    reps AS (
      SELECT b, (user_id * 2654435761 + b * 40503) % 2 AS flip, n, s
      FROM per_user, UNNEST(range(0, 64)) t(b)
    ),
    perm AS (
      SELECT b,
             (CAST(SUM(CASE WHEN flip = 0 THEN s ELSE 0 END) AS DOUBLE)
              / SUM(CASE WHEN flip = 0 THEN n ELSE 0 END))
             - (CAST(SUM(CASE WHEN flip = 1 THEN s ELSE 0 END) AS DOUBLE)
                / SUM(CASE WHEN flip = 1 THEN n ELSE 0 END)) AS d_b
      FROM reps GROUP BY b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_perms,
           CAST(ROUND(CAST(MAX(obs.d_obs) / 1000 AS DECIMAL(24,10)), 6)
                AS DOUBLE) AS observed_diff,
           CAST(ROUND(CAST(
             (1.0 + SUM(CASE WHEN abs(perm.d_b) >= abs(obs.d_obs)
                        THEN 1 ELSE 0 END)) / (COUNT(*) + 1)
           AS DECIMAL(24,10)), 6) AS DOUBLE) AS p_value
    FROM perm CROSS JOIN obs
    """,
)
def agg_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-respecting permutation test of the mean value
    difference between the parity cohorts: 64 label reassignments
    drawn from a DETERMINISTIC integer hash per (user, replica) —
    flips happen at the USER level, never the event level, honoring
    the randomization unit exactly like agg_ratio_metric_delta does
    for variance — and the p-value is the add-one fraction of
    permuted |diffs| beating the observed one.  The agnostic test
    when agg_ab_welch_t's normality is in doubt; the hash replicas
    make it replayable (the agg_poisson_bootstrap_ci discipline).
    One pass reduces users to (n, Σmilli); the 64-replica fan-out
    multiplies the USER-cardinality table, not events, and
    partial-aggregates straight back down."""
    e = load_table(spark, sf_dir, "events")
    milli = F.round(F.col("value") * 1000, 0).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum(milli).alias("s")
    ).withColumn("arm", F.col("user_id") % 2)
    side = lambda flag_col, v: F.sum(
        F.when(F.col(flag_col) == v, F.col("s")).otherwise(0)
    ).cast("double") / F.sum(
        F.when(F.col(flag_col) == v, F.col("n")).otherwise(0)
    )
    obs = per_user.agg((side("arm", 0) - side("arm", 1)).alias("d_obs"))
    reps = per_user.select(
        "n",
        "s",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
        "user_id",
    ).withColumn(
        "flip", (F.col("user_id") * 2654435761 + F.col("b") * 40503) % 2
    )
    perm = reps.groupBy("b").agg(
        (side("flip", 0) - side("flip", 1)).alias("d_b")
    )
    joined = perm.crossJoin(F.broadcast(obs))
    return joined.agg(
        F.count("*").cast("long").alias("n_perms"),
        _r(F.max("d_obs") / 1000, 6).alias("observed_diff"),
        _r(
            (
                1.0
                + F.sum(
                    F.when(
                        F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1
                    ).otherwise(0)
                )
            )
            / (F.count("*") + 1),
            6,
        ).alias("p_value"),
    )


@query(
    "window_target_encoding",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type,
             CASE WHEN value > 250 THEN 1 ELSE 0 END AS y
      FROM events WHERE event_id % 25 = 0
    ),
    enc AS (
      SELECT event_id, event_type, y,
             SUM(y) OVER (PARTITION BY event_type) AS sy,
             COUNT(*) OVER (PARTITION BY event_type) AS cy
      FROM base
    )
    SELECT event_id, event_type,
           CAST(ROUND(CAST(
             CASE WHEN cy > 1
                  THEN CAST(sy - y AS DOUBLE) / (cy - 1)
                  ELSE 0.5 END
           AS DECIMAL(24,10)), 6) AS DOUBLE) AS te_loo
    FROM enc
    """,
)
def window_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of event_type against the
    high-value outcome: each row's feature is the category's mean
    target EXCLUDING the row itself, (Σy − y)/(n−1) — the standard
    high-cardinality categorical encoding, and the leave-one-out form
    is what prevents the target leaking into its own feature (plain
    mean encoding memorizes singleton categories; LOO collapses them
    to the 0.5 prior).  One category-partitioned window pair over a
    single shuffle; all sums exact integers, the division the only
    float."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 25 == 0)
    base = e.select(
        "event_id",
        "event_type",
        F.when(F.col("value") > 250, 1).otherwise(0).alias("y"),
    )
    w = Window.partitionBy("event_type")
    enc = base.select(
        "event_id",
        "event_type",
        "y",
        F.sum("y").over(w).alias("sy"),
        F.count("*").over(w).alias("cy"),
    )
    te = F.when(
        F.col("cy") > 1,
        (F.col("sy") - F.col("y")).cast("double") / (F.col("cy") - 1),
    ).otherwise(F.lit(0.5))
    return enc.select("event_id", "event_type", _r(te, 6).alias("te_loo"))

"""Window-function operators (SURVEY.md §2.4 "Window functions").

Windows partitioned by a key shuffle once on that key and then sort
within partitions — at 100 TB the partition key must be chosen so no
single partition explodes (here: per-customer / per-order partitions,
both naturally bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from guidewire_spark.operators.twophase import ntile_from_rank, two_phase_ordered
from guidewire_spark.plans.catalog import load_table
from guidewire_spark.registry import query


@query(
    "window_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per customer (unique tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "window_ntile_percent",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a global ordering —
    computed TWO-PHASE (twophase.two_phase_ordered) rather than with
    a single-partition window: the (c_acctbal, c_custkey) order is
    total (unique tiebreak), so rank has no peers and
    percent_rank = (rnk−1)/(n−1), cume_dist = rnk/n, and NTILE
    follows from ntile_from_rank's remainder arithmetic — all exact
    reproductions of the window functions, with every data-sized
    stage parallel."""
    c = load_table(spark, sf_dir, "customer")
    ranked = two_phase_ordered(
        c.select("c_custkey", "c_acctbal"),
        [F.asc("c_acctbal"), F.asc("c_custkey")],
        rank_name="rnk",
        total_name="n",
    )
    pct = F.when(
        F.col("n") > 1,
        (F.col("rnk") - 1).cast("double") / (F.col("n") - 1),
    ).otherwise(F.lit(0.0))
    return ranked.select(
        "c_custkey",
        ntile_from_rank(4, "rnk", "n").cast("long").alias("quartile"),
        F.round(pct, 6).alias("pct_rank"),
        F.round(F.col("rnk").cast("double") / F.col("n"), 6).alias("cume"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey) OVER w AS prev_order,
           LEAD(o_orderkey) OVER w AS next_order,
           FIRST_VALUE(o_orderkey) OVER w AS first_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value along each customer's order history."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum with an explicit ROWS frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_sliding_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
    FROM orders
    """,
)
def window_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row moving average."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("avg3"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT p_partkey, p_size,
           COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS peers_within_2
    FROM part
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based): parts with size within 2 below.

    Scale shape: a COUNT over a value-range frame only depends on the
    frame KEY, so the window runs over the size-cardinality aggregate
    (p_size has a bounded domain, ≤ 50 rows) — demonstrating the same
    RANGE-frame API — and the per-size answer broadcast-joins back to
    the parts.  The naive form (global RANGE window directly over the
    part table) funnels every row through one task; this one shuffles
    a 50-row table."""
    p = load_table(spark, sf_dir, "part")
    by_size = p.groupBy("p_size").agg(F.count("*").alias("n"))
    w = Window.orderBy("p_size").rangeBetween(-2, Window.currentRow)
    peers = by_size.select(
        "p_size", F.sum("n").over(w).alias("peers_within_2")
    )
    return p.select("p_partkey", "p_size").join(
        F.broadcast(peers), "p_size"
    ).select("p_partkey", "p_size", "peers_within_2")


@query(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the scalable per-group top-k idiom
    (rank-then-filter; Spark pushes the limit into the window sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "window_nth_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_nth_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / last_value analytics — last_value over the full
    partition frame (the default running frame would just echo the
    current row, the classic last_value trap)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    )

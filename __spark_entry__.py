"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the guidewire_spark package registry
(guidewire_spark/registry.py); this module just adapts them to the
driver's calling convention.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from guidewire_spark.registry import driver_window_order  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-style
    pricing summary over lineitem (filter → hash agg)."""
    from guidewire_spark.operators.aggregates import agg_pricing_summary

    return agg_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    this round's verification window comes first — computed by
    registry.driver_window_order from the committed CORRECTNESS_r*
    history (never-driver-checked queries first, plan-dependent
    families leading)."""
    return {name: spec.fn for name, spec in driver_window_order().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query; rows-only
    operators (approximate / engine-hash-dependent / python-pipeline)
    are intentionally absent."""
    return {
        name: spec.oracle
        for name, spec in driver_window_order().items()
        if spec.oracle is not None
    }

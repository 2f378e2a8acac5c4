"""Central query registry.

Every operator in the engine registers itself here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are SQL-expressible) a DuckDB oracle SQL string computing the same
result over the same parquet tables. ``__spark_entry__.py`` exposes
this registry to the driver's correctness harness.

Contract (see SURVEY.md §2.3): column names must match between the
Spark result and the oracle — every computed column is aliased
identically on both sides; value comparison is order-insensitive, so
queries need deterministic *sets* of rows, not deterministic order.
Floating-point aggregates are rounded on both sides to keep the
value-hash stable across summation orders.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import.
_OPERATOR_MODULES = [
    "guidewire_spark.operators.relational",
    "guidewire_spark.operators.joins",
    "guidewire_spark.operators.aggregates",
    "guidewire_spark.operators.windows",
    "guidewire_spark.operators.scalar_funcs",
    "guidewire_spark.operators.udfs",
    "guidewire_spark.operators.sql_suite",
    "guidewire_spark.operators.llm",
    "guidewire_spark.operators.training",
    "guidewire_spark.operators.connector_queries",
    "guidewire_spark.operators.extras",
    "guidewire_spark.streaming.windowed",
]


def query(name: str, oracle: str | None = None):
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)

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

OUTPUT-TYPE CONTRACT (round-8, after the r7 representation reds):
the grading driver canonicalizes results as *pandas string frames*
(``toPandas()`` vs duckdb ``.df()``, sorted, ``astype(str)``), so a
result column's dtype is part of its value.  Every registered query's
output schema may therefore contain ONLY: integral (tinyint/smallint/
int/bigint), float/double, string, boolean, date, timestamp.
Forbidden, and rejected by :func:`lint_output_schema` (enforced by
``tools/check_oracles.py`` and ``tests/test_registry_lint.py``):

* DECIMAL(p,s) — pandas renders trailing zeros ('89158.00') that the
  oracle's DOUBLE never has.  Keep DECIMAL for internal exact math;
  the final select casts to DOUBLE (or BIGINT cents).
* ARRAY/MAP/STRUCT — pandas ``sort_values`` raises ``unhashable
  type`` on list cells; the driver errors before comparing.  Emit
  ``array_join``/``to_json`` strings or explode to long format.
* BINARY — bytes repr is engine-dependent; hex-encode instead.

Oracle-side mirror rule: DuckDB integer aggregates (SUM/COUNT over
int) surface as HUGEINT/nullable-int and become float64 under
``.df()`` ('2085.0' vs Spark's '2085') — every integer-semantics
oracle output must be wrapped ``CAST(... AS BIGINT)``, and nullable
integer join outputs too (``COALESCE``/CAST as appropriate).
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
    "guidewire_spark.operators.analytics",
    "guidewire_spark.operators.stats_ext",
    "guidewire_spark.operators.pipeline_ext",
    "guidewire_spark.operators.warehouse_ext",
    "guidewire_spark.operators.advanced_ext",
    "guidewire_spark.operators.mlprep_ext",
    "guidewire_spark.operators.olap_ext",
    "guidewire_spark.operators.robust_ext",
    "guidewire_spark.operators.surface_ext",
    "guidewire_spark.operators.gaps_ext",
    "guidewire_spark.operators.iter_ext",
    "guidewire_spark.operators.dq_ext",
    "guidewire_spark.operators.audit_ext",
    "guidewire_spark.operators.bands_ext",
    "guidewire_spark.operators.metrics_ext",
    "guidewire_spark.operators.survival_ext",
    "guidewire_spark.operators.session_ext",
    "guidewire_spark.operators.growth_ext",
    "guidewire_spark.operators.forecast_ext",
    "guidewire_spark.operators.experiment_ext",
    "guidewire_spark.operators.acf_ext",
    "guidewire_spark.operators.inference_ext",
    "guidewire_spark.operators.signal_ext",
    "guidewire_spark.operators.graph_ext",
    "guidewire_spark.operators.coverage_ext",
    "guidewire_spark.operators.evaluation_ext",
    "guidewire_spark.operators.fitting_ext",
    "guidewire_spark.operators.behavior_ext",
    "guidewire_spark.operators.parity_ext",
    "guidewire_spark.operators.denoise_ext",
    "guidewire_spark.operators.pyds_ext",
    "guidewire_spark.operators.streamstate_ext",
    "guidewire_spark.operators.audit2_ext",
    "guidewire_spark.operators.mleval_ext",
    "guidewire_spark.operators.curriculum_ext",
    "guidewire_spark.operators.diagnostics_ext",
    "guidewire_spark.operators.lastmile_ext",
    "guidewire_spark.operators.shrinkage_ext",
    "guidewire_spark.operators.integrity_ext",
    "guidewire_spark.operators.resample_ext",
    "guidewire_spark.operators.mining_ext",
    "guidewire_spark.operators.frontier_ext",
    "guidewire_spark.operators.incremental_ext",
    "guidewire_spark.operators.rules_ext",
    "guidewire_spark.streaming.windowed",
    "guidewire_spark.streaming.jobs",
]


def lint_output_schema(schema) -> list[str]:
    """Validate a result schema against the output-type contract
    (module docstring).  Returns a list of ``column: offending-type``
    strings — empty means compliant.  Runs at sweep time (the schema
    only exists once the query function has built its DataFrame), and
    ``tools/check_oracles.py`` fails any query that violates it, so
    the representation class that produced the round-7 driver reds
    cannot re-enter the registry unnoticed."""
    from pyspark.sql import types as T

    allowed = (
        T.ByteType,
        T.ShortType,
        T.IntegerType,
        T.LongType,
        T.FloatType,
        T.DoubleType,
        T.StringType,
        T.BooleanType,
        T.DateType,
        T.TimestampType,
        T.TimestampNTZType,
        # NullType deliberately NOT allowed: an all-NULL column crosses
        # DuckDB .df() as float64 NaN ("nan" after astype(str)) but
        # Spark toPandas as None ("None") — the exact divergence this
        # lint exists to catch.  Queries must cast literal NULLs to a
        # concrete type.
    )
    problems = []
    for field in schema.fields:
        if not isinstance(field.dataType, allowed):
            problems.append(f"{field.name}: {field.dataType.simpleString()}")
    return problems


def query(name: str, oracle: str | None = None):
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


# The grading driver verifies the FIRST 50 entries of the driver-facing
# ordering per round.  Rounds 1-4 rotated a hand-maintained _FRONT list
# (r1: relational/joins/aggregates/windows head; r2: llm/training/sql/
# udfs/connector; r3: Delta maintenance, streaming windows, scalar tail;
# r4: the zero-history backlog + the re-fixed agg_approx_percentile).
# From round 5 on the window is COMPUTED from the committed
# CORRECTNESS_r*.json history, so no future round can forget the
# backlog: every registered query that has never appeared in a driver
# window goes first, physical-plan-dependent families (streaming,
# joins, Delta) leading because the local DuckDB replica protects their
# correctness least — it validates values, not watermarks, hints, or
# log protocol effects.

_WINDOW = 50

# Plan-dependent name prefixes, checked in order: queries whose
# correctness depends on Spark's physical execution (stream semantics,
# join strategies, Delta log mechanics) outrank value-only queries.
_PLAN_DEPENDENT_PREFIXES = ("stream_", "join_", "delta_", "cda_", "udtf_", "udaf_", "udf_")

# (Round-9's judge-ordered window pins were dropped after
# CORRECTNESS_r10 recorded all seven green — the history rule keeps
# them out of future windows automatically, per that verdict's own
# drop condition.)


def _entry_passed(v) -> bool:
    """A CORRECTNESS entry counts as a PASS only when it ran clean and
    neither of the recorded comparisons is False — a query that
    errored or mismatched in some round must re-enter the verification
    window after its fix (the old hand-maintained _FRONT re-fronted
    red rows explicitly; the computed rotation must too).  The driver
    records a CLEAN rows-only run as ``err: "no_oracle"`` with the
    observed ``spark_rows`` — that is a pass, not an error (ten r1-r4
    rows-only greens would otherwise re-front forever)."""
    if not isinstance(v, dict):
        return True  # unknown shape: don't re-front what we can't read
    err = v.get("err")
    if err == "no_oracle":
        return v.get("spark_rows") is not None
    if err:
        return False
    if v.get("rows_match") is False or v.get("hash_match") is False:
        return False
    return True


def _driver_history() -> dict[str, tuple[bool, bool]]:
    """name → (passed, was_rows_only) for its LATEST committed
    CORRECTNESS_r*.json record (the grading driver writes one file
    per round into the repo root).  ``was_rows_only`` lets the window
    re-front queries whose only driver history predates an oracle
    upgrade — a rows-only green proves the query RAN, not that its
    values hash-match."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, bool]] = {}
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(p) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for k, v in data.items():
                if k not in latest or rnd >= latest[k][0]:
                    latest[k] = (rnd, _entry_passed(v), _was_rows_only(v))
    return {k: (ok, ro) for k, (_, ok, ro) in latest.items()}


def _was_rows_only(v) -> bool:
    return isinstance(v, dict) and v.get("err") == "no_oracle"


def _driver_checked_names() -> set[str]:
    """Names with GREEN driver history. Failed-then-fixed queries are
    absent, so they re-enter the verification window automatically."""
    return {k for k, (ok, _) in _driver_history().items() if ok}


def all_queries() -> dict[str, QuerySpec]:
    """All registered queries, in REGISTRATION order.

    This is the public contract: stable, rotation-free.  The grading
    driver's window rotation lives in :func:`driver_window_order`,
    which ``__spark_entry__`` applies; local verification
    (``tools/check_oracles.py``) sweeps this full dict every round so
    back-of-window regressions still fail fast.
    """
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)


def driver_window_order() -> dict[str, QuerySpec]:
    """Queries reordered for the grading driver: this round's
    verification window first (the next ``_WINDOW`` queries with no
    driver history, plan-dependent families leading, registration
    order within each class — all derived from the committed
    CORRECTNESS_r*.json files), then everything else in registration
    order."""
    registry = all_queries()
    history = _driver_history()
    checked = {
        k
        for k, (ok, rows_only) in history.items()
        if ok
        # an oracle UPGRADE invalidates a rows-only green: the driver
        # has proven the query runs, never that its values match —
        # re-front it so the new oracle gets hash-verified (round-9
        # bound-check conversions)
        and not (
            rows_only and k in registry and registry[k].oracle is not None
        )
    }
    backlog = [n for n in registry if n not in checked]
    # Four classes, each in registration order: (0) failed-then-fixed
    # rows re-verify FIRST — a red must never slip out of the window
    # because new registrations crowded it; (1) plan-dependent
    # families; (2) value-only queries; (3) rows-only queries LAST —
    # a no-oracle slot only proves the query runs, so it must never
    # crowd out a slot that would hash-verify values (round-7 lesson:
    # similarity_ann_ivfpq burned a window slot on `no_oracle`).
    backlog.sort(
        key=lambda n: 0
        if history.get(n, (True, False))[0] is False
        else 3
        if registry[n].oracle is None
        else (1 if n.startswith(_PLAN_DEPENDENT_PREFIXES) else 2)
    )  # stable: registration order within each class
    front = backlog[:_WINDOW]
    ordered = {n: registry[n] for n in front}
    ordered.update((n, s) for n, s in registry.items() if n not in ordered)
    return ordered

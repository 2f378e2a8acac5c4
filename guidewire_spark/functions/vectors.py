"""Vector-math column expressions over ``array<float|double>`` columns.

Built from higher-order functions (``zip_with`` / ``aggregate`` /
``transform``) so the arithmetic executes JVM-side inside codegen —
no Python in the per-row path. Casts to double first: accumulating in
float32 drifts, and the DuckDB oracle accumulates in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length vectors (sequential fold —
    deterministic summation order, matches the oracle's list_reduce)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def normalize(vec: Column) -> Column:
    """L2-normalize; precomputing unit vectors turns top-k cosine into
    top-k dot product (one fused HOF per candidate pair at scale).

    The norm is bound OUTSIDE the per-element lambda: HOF lambda
    bodies are interpreted and re-evaluate every embedded
    subexpression per element, so ``transform(vec, x -> x / norm)``
    pays the full O(d) norm fold d times per row (O(d²)).  Feeding
    the norm through ``array_repeat`` — a regular expression whose
    arguments evaluate once per row — keeps the division element-wise
    while the norm fold runs once (guide §4: per-task work).  The
    arithmetic per element is the identical ``x / n`` on the identical
    double, so results are bit-for-bit unchanged."""
    dv = as_double(vec)
    return F.zip_with(
        dv, F.array_repeat(norm(vec), F.size(vec)), lambda x, n: x / n
    )

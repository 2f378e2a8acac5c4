"""Two-column Hilbert-curve clustering for OPTIMIZE.

Same contract as ``zorder.py`` but on the Hilbert space-filling curve
instead of the Morton curve: consecutive curve positions are ALWAYS
adjacent cells (Morton takes long diagonal jumps at power-of-two
boundaries), so equal-size runs of the sort key cover tighter
hyper-rectangles — files get tighter min/max stats on both clustered
columns, which is why Delta Lake's OPTIMIZE moved from Z-order to
Hilbert for its liquid clustering.

The curve index is computed with the classic xy2d iteration unrolled
over the bucket bits — pure integer CASE/shift expressions, JVM-side,
inside whole-stage codegen (no UDF): per bit level s, the quadrant
contributes s²·((3·rx) XOR ry) and the lower bits are conditionally
reflected/transposed.  4 bits per dimension → 4 unrolled levels → a
256-cell curve, matching zorder's default bucket resolution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from guidewire_spark.sources.zorder import bucket_index


def hilbert_index(x: Column, y: Column, bits: int = 4) -> Column:
    """Hilbert curve position of integer cell (x, y), 0 ≤ x,y < 2^bits.

    Unrolled xy2d: for s = 2^(bits-1) … 1, accumulate the quadrant
    offset, then rotate/reflect the remaining low bits.  Expressions
    only — the optimizer folds the whole chain into one codegen stage.
    """
    n = 1 << bits
    d = F.lit(0).cast("long")
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        d = d + (F.lit(s * s) * ((rx * 3).bitwiseXOR(ry))).cast("long")
        # rotate the sub-square so the curve enters/exits correctly:
        # ry == 0 → (optionally reflect across the FULL grid, then)
        # transpose x and y — the top-down xy2d convention
        flip_x = F.lit(n - 1) - x
        flip_y = F.lit(n - 1) - y
        nx = F.when(ry == 0, F.when(rx == 1, flip_y).otherwise(y)).otherwise(x)
        ny = F.when(ry == 0, F.when(rx == 1, flip_x).otherwise(x)).otherwise(y)
        x, y = nx, ny
    return d


def hilbert_index_py(x: int, y: int, bits: int = 4) -> int:
    """Reference Python twin of :func:`hilbert_index` (tests)."""
    n = 1 << bits
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_value(df: DataFrame, cols: list[str], bits: int = 4) -> Column:
    """Hilbert position over quantile-bucketed ``cols`` (exactly 2).

    Bucketing mirrors ``zorder.zvalue``: ONE multi-column
    approxQuantile sample job for both columns — O(sample), not
    O(data) — so skewed columns still fill all 2^bits buckets.

    The curve position itself is a LITERAL LOOKUP, not the unrolled
    xy2d expression: each xy2d level re-references x and y ~3×, so
    composing :func:`hilbert_index` over the 2^bits-branch bucket
    CASE chains multiplied the Catalyst tree by hundreds (measured
    round-12 on delta_liquid_clustering: ~18 s of DRIVER time —
    analysis + codegen of the blown-up tree, paid twice because
    repartitionByRange evaluates the key in its sampling pass too).
    With bits=4 the whole curve is 256 cells, so the bucket indices
    are computed ONCE each and ``element_at`` over a 4^bits-literal
    array (values from the reference twin ``hilbert_index_py``)
    yields an identical position with a tree of ~2·2^bits nodes.
    """
    if len(cols) != 2:
        raise ValueError("hilbert clustering takes exactly 2 columns")
    if bits > 6:
        raise ValueError("lookup-table hilbert_value supports bits <= 6")
    n_buckets = (1 << bits) - 1
    qs = [i / (n_buckets + 1) for i in range(1, n_buckets + 1)]
    b1, b2 = df.approxQuantile(cols, qs, 0.01)
    bx = bucket_index(F.col(cols[0]), b1).cast("long")
    by = bucket_index(F.col(cols[1]), b2).cast("long")
    n = 1 << bits
    curve = [
        F.lit(hilbert_index_py(x, y, bits)).cast("long")
        for x in range(n)
        for y in range(n)
    ]
    return F.element_at(F.array(*curve), (bx * n + by + 1).cast("int"))


def cluster_by_hilbert(
    df: DataFrame, cols: list[str], target_files: int, bits: int = 4
) -> DataFrame:
    """Return ``df`` re-arranged so each output partition covers a
    compact Hilbert range of ``cols`` — the write side of OPTIMIZE
    with Hilbert clustering."""
    h = hilbert_value(df, cols, bits)
    return (
        df.withColumn("__h", h)
        .repartitionByRange(target_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
    )

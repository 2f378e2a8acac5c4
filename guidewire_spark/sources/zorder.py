"""Multi-column Z-order clustering for OPTIMIZE.

True Z-ordering interleaves the bits of the clustering columns so
that range predicates on ANY of them map to contiguous runs of the
sort key — files then have tight min/max stats on every clustered
column, and data skipping works multi-dimensionally (single-column
range-clustering only helps the leading column).

Pipeline (all JVM-side, no UDFs):
1. per column: 2^bits quantile boundaries via ``approxQuantile``
   (driver-side sample, one tiny job per column — the standard
   Delta/iceberg approach; quantiles beat min/max scaling because
   skewed columns still fill all buckets),
2. bucket index per row from the boundaries (when-chain, codegen'd),
3. z-value = bit-interleave of the bucket indices,
4. range-partition + sort by z-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_index(col: Column, boundaries: list[float]) -> Column:
    """0-based bucket index per quantile ``boundaries`` (ascending)."""
    expr = F.lit(0)
    for i, b in enumerate(boundaries):
        expr = F.when(col > F.lit(b), F.lit(i + 1)).otherwise(expr)
    return expr


def interleave_bits(indices: list[Column], bits: int) -> Column:
    """Morton code: bit j of dimension d lands at position
    j * n_dims + d. All shifts/ors are integer expressions inside
    whole-stage codegen."""
    n = len(indices)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for d, idx in enumerate(indices):
            bit = F.shiftright(idx.cast("long"), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + d))
    return z


def zvalue(df: DataFrame, cols: list[str], bits: int = 4) -> Column:
    """Z-value column expression for ``df`` over ``cols``.

    approxQuantile runs once per column on a sample — at 100 TB this
    is the only non-metadata cost, and it is O(sample), not O(data).
    """
    n_buckets = (1 << bits) - 1  # boundaries count => 2^bits buckets
    qs = [i / (n_buckets + 1) for i in range(1, n_buckets + 1)]
    # ONE multi-column approxQuantile job: the per-column summaries
    # are built in the same single pass the per-column form uses, so
    # the boundaries are identical — this just stops paying one scan
    # of the optimize scope per clustered column (round-12).
    all_bounds = df.approxQuantile(cols, qs, 0.01)
    indices = [
        bucket_index(F.col(c), boundaries)
        for c, boundaries in zip(cols, all_bounds)
    ]
    return interleave_bits(indices, bits)


def cluster_by_zorder(
    df: DataFrame, cols: list[str], target_files: int, bits: int = 4
) -> DataFrame:
    """Return ``df`` re-arranged so each output partition covers a
    compact Z-range of ``cols`` — the write side of OPTIMIZE ZORDER."""
    if len(cols) == 1:
        # degenerate case: plain range clustering is exact
        return df.repartitionByRange(target_files, *cols).sortWithinPartitions(*cols)
    z = zvalue(df, cols, bits)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(target_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )

"""Schema inference from parquet footers (reference parity: P7).

The reference sniffs the Avro schema from the first record of the
smallest non-empty parquet file (``GuidewireUtils.scala:33-62``,
``ParquetStream.scala``) and converts Avro→Delta types
(``ParquetUtils.scala:12-76``). We read the parquet *footer* instead
(metadata-only — no data pages are fetched) via pyarrow and convert
Arrow→Spark types, which natively covers decimals the reference's
Avro path could not (SURVEY.md §1.2 note).

EDGE CASE#2 (``Guidewire.scala:158-162``): files may be non-empty in
bytes but hold zero records — recurse smallest→largest until a file
with rows is found.

``AVRO_TO_SPARK`` documents the reference's exact semantic type
contract (every case of ``ParquetUtils.toSqlTypeHelper``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from guidewire_spark.sources.fs import FileMeta, _to_local

# The reference's Avro→Delta mapping (ParquetUtils.scala:12-76),
# kept as the documented semantic contract of the schema system.
AVRO_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
    "fixed": T.BinaryType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "enum": T.StringType(),
    "null": T.NullType(),
    "long": T.LongType(),  # timestamp-millis/micros logical → TimestampType
    "int": T.IntegerType(),  # date logical → DateType
}
# union handling (null-elimination, int|long, float|double, member0..N
# struct) is implemented in _union_to_spark_type below.


def arrow_to_spark_type(atype: pa.DataType) -> T.DataType:
    """Arrow→Spark type conversion for every type the engine stores."""
    if pa.types.is_string(atype) or pa.types.is_large_string(atype):
        return T.StringType()
    if pa.types.is_boolean(atype):
        return T.BooleanType()
    if pa.types.is_binary(atype) or pa.types.is_large_binary(atype) or pa.types.is_fixed_size_binary(atype):
        return T.BinaryType()
    if pa.types.is_float64(atype):
        return T.DoubleType()
    if pa.types.is_float32(atype):
        return T.FloatType()
    if pa.types.is_int64(atype) or pa.types.is_uint32(atype):
        return T.LongType()
    if pa.types.is_int32(atype) or pa.types.is_int16(atype) or pa.types.is_int8(atype) or pa.types.is_uint16(atype) or pa.types.is_uint8(atype):
        return T.IntegerType()
    if pa.types.is_timestamp(atype):
        # tz-naive timestamps also map to TimestampType (reference
        # parity, ParquetUtils.scala timestamp-millis/micros → Timestamp):
        # TimestampNTZType in the log's schemaString would require the
        # timestampNtz table feature (reader v3 / writer v7), above the
        # protocol this engine emits (minReader 1 / minWriter 2), so
        # external Delta readers would reject the table.
        return T.TimestampType()
    if pa.types.is_date(atype):
        return T.DateType()
    if pa.types.is_decimal(atype):
        return T.DecimalType(atype.precision, atype.scale)
    if pa.types.is_list(atype) or pa.types.is_large_list(atype):
        elem = atype.value_field
        return T.ArrayType(arrow_to_spark_type(elem.type), elem.nullable)
    if pa.types.is_struct(atype):
        return T.StructType(
            [
                T.StructField(f.name, arrow_to_spark_type(f.type), f.nullable)
                for f in atype
            ]
        )
    if pa.types.is_map(atype):
        return T.MapType(
            arrow_to_spark_type(atype.key_type),
            arrow_to_spark_type(atype.item_type),
            True,
        )
    if pa.types.is_null(atype):
        return T.NullType()
    if pa.types.is_union(atype):
        return _union_to_spark_type(atype)
    raise ValueError(f"Unsupported type {atype}")  # ParquetUtils.scala:74 parity


def _union_to_spark_type(atype: pa.DataType) -> T.DataType:
    """Avro/Arrow n-ary union mapping (ParquetUtils.scala:51-72 parity):

    * a union containing null drops the null branch (nullability is
      carried by the field, not the type) and recurses;
    * a single remaining branch collapses to that branch's type;
    * {int, long} → long and {float, double} → double;
    * anything else becomes a struct with fields ``member0..memberN``
      (one per branch, all nullable — only one is set at a time),
      matching Avro↔Parquet's own complex-union convention.
    """
    branches = [atype.field(i).type for i in range(atype.num_fields)]
    non_null = [b for b in branches if not pa.types.is_null(b)]
    if not non_null:
        return T.NullType()
    if len(non_null) == 1:
        return arrow_to_spark_type(non_null[0])
    kinds = {str(b) for b in non_null}
    if kinds == {"int32", "int64"}:
        return T.LongType()
    if kinds == {"float", "double"}:
        return T.DoubleType()
    return T.StructType(
        [
            T.StructField(f"member{i}", arrow_to_spark_type(b), True)
            for i, b in enumerate(non_null)
        ]
    )


def arrow_schema_to_spark(schema: pa.Schema) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f.name, arrow_to_spark_type(f.type), f.nullable)
            for f in schema
        ]
    )


def _footer(path: str) -> pq.ParquetFile | None:
    local = _to_local(path)
    if local is not None:
        return pq.ParquetFile(local)
    import fsspec

    fs, p = fsspec.core.url_to_fs(path)
    return pq.ParquetFile(fs.open(p, "rb"))


def infer_schema_from_files(files: list[FileMeta]) -> T.StructType | None:
    """Schema from the smallest file that actually has records
    (``GuidewireUtils.scala:33-49`` recursion, done iteratively)."""
    for meta in sorted(files, key=lambda f: f.size):
        try:
            pf = _footer(meta.path)
        except Exception:
            continue  # unreadable/corrupt sample: try the next one
        if pf is None or pf.metadata.num_rows == 0:
            continue  # EDGE CASE#2: bytes but no records
        return arrow_schema_to_spark(pf.schema_arrow)
    return None

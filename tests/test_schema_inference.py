"""Schema inference unit tests: Arrow→Spark type table (§1.2) and the
smallest-file / empty-file recursion (EDGE CASE#2)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from guidewire_spark.sources.fs import FileMeta, list_parquet_files
from guidewire_spark.sources.schema import (
    AVRO_TO_SPARK,
    arrow_to_spark_type,
    infer_schema_from_files,
)


def test_arrow_to_spark_type_table():
    cases = [
        (pa.string(), T.StringType()),
        (pa.bool_(), T.BooleanType()),
        (pa.binary(), T.BinaryType()),
        (pa.float64(), T.DoubleType()),
        (pa.float32(), T.FloatType()),
        (pa.int64(), T.LongType()),
        (pa.int32(), T.IntegerType()),
        (pa.date32(), T.DateType()),
        (pa.decimal128(10, 2), T.DecimalType(10, 2)),
        (pa.timestamp("us", tz="UTC"), T.TimestampType()),
        # tz-naive also → TimestampType: NTZ needs the timestampNtz
        # table feature (reader v3/writer v7) which the emitted
        # protocol (1/2) doesn't declare; reference maps it the same.
        (pa.timestamp("us"), T.TimestampType()),
        (pa.list_(pa.int32()), T.ArrayType(T.IntegerType(), True)),
        (
            pa.struct([pa.field("a", pa.string())]),
            T.StructType([T.StructField("a", T.StringType(), True)]),
        ),
        (
            pa.map_(pa.string(), pa.int64()),
            T.MapType(T.StringType(), T.LongType(), True),
        ),
    ]
    for arrow_type, expected in cases:
        assert arrow_to_spark_type(arrow_type) == expected, str(arrow_type)


def test_union_member_struct_mapping():
    """n-ary union parity (ParquetUtils.scala:51-72): null branches
    drop out, {int,long}→long, {float,double}→double, and complex
    unions become member0..N structs with all-nullable fields."""
    u = pa.union(
        [pa.field("s", pa.string()), pa.field("i", pa.int64())], mode="sparse"
    )
    assert arrow_to_spark_type(u) == T.StructType(
        [
            T.StructField("member0", T.StringType(), True),
            T.StructField("member1", T.LongType(), True),
        ]
    )
    # null branch is eliminated, single survivor collapses
    u1 = pa.union(
        [pa.field("n", pa.null()), pa.field("s", pa.string())], mode="sparse"
    )
    assert arrow_to_spark_type(u1) == T.StringType()
    # numeric widening pairs
    u2 = pa.union(
        [pa.field("a", pa.int32()), pa.field("b", pa.int64())], mode="sparse"
    )
    assert arrow_to_spark_type(u2) == T.LongType()
    u3 = pa.union(
        [pa.field("a", pa.float32()), pa.field("b", pa.float64())], mode="sparse"
    )
    assert arrow_to_spark_type(u3) == T.DoubleType()


def test_avro_semantic_contract_documented():
    # The reference's Avro→Delta table (ParquetUtils.scala:12-76) is
    # carried as the documented contract.
    assert AVRO_TO_SPARK["enum"] == T.StringType()
    assert AVRO_TO_SPARK["fixed"] == T.BinaryType()
    assert AVRO_TO_SPARK["null"] == T.NullType()


def test_smallest_file_recursion(tmp_path):
    """EDGE CASE#2: smallest file has zero records → recurse to the
    next-smallest (Guidewire.scala:158-162)."""
    d = str(tmp_path)
    empty = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.int64())})
    full = pa.table({"a": ["x", "y"], "b": [1, 2]})
    pq.write_table(empty, os.path.join(d, "small_but_empty.parquet"))
    pq.write_table(full, os.path.join(d, "bigger_with_rows.parquet"))
    files = list_parquet_files(d)
    assert len(files) == 2
    schema = infer_schema_from_files(files)
    assert schema is not None
    assert [f.name for f in schema.fields] == ["a", "b"]


def test_all_empty_yields_none(tmp_path):
    d = str(tmp_path)
    empty = pa.table({"a": pa.array([], pa.string())})
    pq.write_table(empty, os.path.join(d, "e1.parquet"))
    assert infer_schema_from_files(list_parquet_files(d)) is None


def test_listing_filters(tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({"a": [1]}), os.path.join(d, "ok.parquet"))
    open(os.path.join(d, "zero.parquet"), "wb").close()
    pq.write_table(pa.table({"a": [1]}), os.path.join(d, ".hidden.parquet"))
    open(os.path.join(d, "notes.txt"), "w").write("not parquet")
    files = list_parquet_files(d)
    assert [os.path.basename(f.path) for f in files] == ["ok.parquet"]
    assert isinstance(files[0], FileMeta) and files[0].size > 0

"""The registry output-type contract (round-8, after CORRECTNESS_r07's
representation-class reds): result schemas may contain only types
whose pandas string form is engine-stable.  ``lint_output_schema``
rejects the rest; ``tools/check_oracles.py`` fails any query that
violates it, so this class of driver red cannot silently re-enter."""

from __future__ import annotations

from pyspark.sql import functions as F

from guidewire_spark.registry import lint_output_schema


def test_allowed_types_pass(spark):
    df = spark.range(1).select(
        F.lit(1).cast("tinyint").alias("i8"),
        F.lit(1).cast("smallint").alias("i16"),
        F.lit(1).cast("int").alias("i32"),
        F.lit(1).cast("bigint").alias("i64"),
        F.lit(1.0).cast("float").alias("f32"),
        F.lit(1.0).cast("double").alias("f64"),
        F.lit("s").alias("s"),
        F.lit(True).alias("b"),
        F.lit("2024-01-01").cast("date").alias("d"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    assert lint_output_schema(df.schema) == []


def test_decimal_rejected(spark):
    df = spark.range(1).select(F.lit(1.5).cast("decimal(14,2)").alias("price"))
    assert lint_output_schema(df.schema) == ["price: decimal(14,2)"]


def test_array_map_struct_binary_rejected(spark):
    df = spark.range(1).select(
        F.array(F.lit(1)).alias("arr"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("x")).alias("st"),
        F.lit(b"\x00").alias("bin"),
    )
    bad = lint_output_schema(df.schema)
    assert [p.split(":")[0] for p in bad] == ["arr", "m", "st", "bin"]


def test_null_type_rejected(spark):
    """An all-NULL column crosses DuckDB .df() as float64 NaN ("nan")
    but Spark toPandas as None ("None") — NullType must be rejected so
    queries cast literal NULLs to a concrete type."""
    df = spark.range(1).select(F.lit(None).alias("n"))
    assert lint_output_schema(df.schema) == ["n: void"]


def test_every_registered_query_fn_is_oracle_paired_or_flagged():
    """Registry shape invariant: every spec has a callable fn; oracles,
    when present, are non-empty SQL strings (a whitespace oracle would
    silently downgrade to a rows-only driver check)."""
    from guidewire_spark.registry import all_queries

    for name, spec in all_queries().items():
        assert callable(spec.fn), name
        if spec.oracle is not None:
            assert spec.oracle.strip(), name

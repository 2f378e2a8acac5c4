"""Pin the SEMANTICS of version-gated Spark 4 features.

Round-6 driver lesson: `func_collation_lcase` hash-failed the driver
while passing the local replica — the divergence lived in the build's
collation behavior, invisible locally.  The fix class (round-6 verdict
item 3): for every registry query that leans on a version-gated
feature (collations, VARIANT, try_*, listagg, approx_top_k), assert
the feature's SEMANTIC here with a known input and a hand-computed
expected value, so a build change breaks a NAMED TEST instead of
silently drifting a driver hash.  If one of these fails on some other
build, the matching registry queries are the ones to re-audit first.
"""

from __future__ import annotations

import pyspark.sql.functions as F


MIXED = ["FRANCE", "France", "france", "GERMANY", "Germany"]


def _mixed_df(spark):
    return spark.createDataFrame([(s,) for s in MIXED], "s string")


class TestCollationSemantics:
    """UTF8_LCASE: used by func_collation_lcase / func_collation_groupby."""

    def test_collated_equality_is_case_insensitive(self, spark):
        df = _mixed_df(spark)
        lc = F.collate(F.col("s"), "UTF8_LCASE")
        lit = F.collate(F.lit("france"), "UTF8_LCASE")
        n = df.where(lc == lit).count()
        assert n == 3, f"UTF8_LCASE equality matched {n} of 3 FRANCE spellings"

    def test_collated_distinct_folds_case(self, spark):
        df = _mixed_df(spark)
        n = df.select(
            F.collate(F.col("s"), "UTF8_LCASE").alias("c")
        ).distinct().count()
        assert n == 2, f"UTF8_LCASE distinct returned {n}, expected 2"

    def test_collated_groupby_folds_case(self, spark):
        df = _mixed_df(spark)
        rows = (
            df.groupBy(F.collate(F.col("s"), "UTF8_LCASE").alias("c"))
            .agg(F.count("*").alias("n"))
            .collect()
        )
        counts = sorted(r["n"] for r in rows)
        assert counts == [2, 3], f"UTF8_LCASE group sizes {counts} != [2, 3]"

    def test_collated_count_distinct_agg(self, spark):
        # The exact aggregation shape the round-6 red query used.
        df = _mixed_df(spark)
        row = df.agg(
            F.countDistinct(
                F.collate(F.col("s"), "UTF8_LCASE")
            ).alias("n")
        ).collect()[0]
        assert row["n"] == 2, f"countDistinct over UTF8_LCASE = {row['n']}"


class TestVariantSemantics:
    """VARIANT: used by the json/VARIANT family queries."""

    def test_parse_and_extract(self, spark):
        df = spark.createDataFrame(
            [('{"a": 1, "b": {"c": "x"}}',)], "j string"
        )
        row = df.select(
            F.try_variant_get(
                F.parse_json("j"), "$.b.c", "string"
            ).alias("v")
        ).collect()[0]
        assert row["v"] == "x"

    def test_variant_numeric_extract(self, spark):
        df = spark.createDataFrame([('{"a": 41}',)], "j string")
        row = df.select(
            F.try_variant_get(F.parse_json("j"), "$.a", "long").alias("v")
        ).collect()[0]
        assert row["v"] == 41


class TestTryFamilySemantics:
    """try_*: used by the func_try_family query."""

    def test_try_divide_null_on_zero(self, spark):
        df = spark.range(1)
        row = df.select(
            F.try_divide(F.lit(1), F.lit(0)).alias("d"),
            F.try_divide(F.lit(6), F.lit(3)).alias("ok"),
        ).collect()[0]
        assert row["d"] is None and row["ok"] == 2.0

    def test_try_cast_and_to_number(self, spark):
        df = spark.range(1)
        row = df.select(
            F.lit("abc").try_cast("int").alias("bad"),
            F.lit("42").try_cast("int").alias("good"),
            F.try_to_number(F.lit("12,345"), F.lit("99,999")).alias("num"),
        ).collect()[0]
        assert row["bad"] is None and row["good"] == 42
        assert float(row["num"]) == 12345.0

    def test_try_add_overflow_null(self, spark):
        df = spark.range(1)
        row = df.select(
            F.try_add(
                F.lit(9223372036854775807).cast("long"), F.lit(1).cast("long")
            ).alias("o")
        ).collect()[0]
        assert row["o"] is None


class TestListaggSemantics:
    """listagg: used by the agg_listagg query (pass r6 — keep pinned)."""

    def test_listagg_within_group_order(self, spark):
        df = spark.createDataFrame(
            [("b",), ("a",), ("c",)], "s string"
        )
        row = df.agg(
            F.expr("listagg(s, ',') WITHIN GROUP (ORDER BY s)").alias("l")
        ).collect()[0]
        assert row["l"] == "a,b,c"


class TestApproxTopKSemantics:
    """approx_top_k: exact when maxItemsTracked >= true cardinality —
    the property that makes agg_approx_top_k's exact-count oracle valid."""

    def test_exact_when_capacity_exceeds_cardinality(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "s string"
        )
        rows = (
            df.agg(F.expr("approx_top_k(s, 3, 100)").alias("tk"))
            .select(F.explode("tk").alias("e"))
            .select("e.item", "e.count")
            .collect()
        )
        got = {r["item"]: r["count"] for r in rows}
        assert got == {"a": 5, "b": 3, "c": 1}


class TestRegexpCountSemantics:
    """regexp_count: used by sql_row_pattern_match — non-overlapping
    left-to-right scan (SKIP PAST LAST ROW) must hold in this build."""

    def test_non_overlapping_greedy_scan(self, spark):
        df = spark.createDataFrame([("vccpvcpvp",)], "s string")
        row = df.select(F.regexp_count("s", F.lit("vc+p")).alias("n")).collect()[0]
        # matches: 'vccp', 'vcp'; the trailing 'vp' has no click
        assert row["n"] == 2


class TestRecursiveCteSemantics:
    """WITH RECURSIVE: used by sql_recursive_hierarchy — the feature
    must exist and UNION ALL recursion must run frontier-style."""

    def test_recursion_available_and_correct(self, spark):
        row = spark.sql(
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
            "SELECT n + 1 FROM t WHERE n < 10) "
            "SELECT SUM(n) AS s, COUNT(*) AS c FROM t"
        ).collect()[0]
        assert (row["s"], row["c"]) == (55, 10)


class TestIntegerDivTruncation:
    """div: the exact-integer recursions (Holt, attribution shares,
    RAKE ppm) assume truncation toward zero, matching DuckDB's //."""

    def test_div_truncates_toward_zero(self, spark):
        row = spark.sql(
            "SELECT -7 div 2 AS a, 7 div 2 AS b, -1 div 2 AS c"
        ).collect()[0]
        assert (row["a"], row["b"], row["c"]) == (-3, 3, 0)


class TestMd5IntPrimitive:
    """conv(substr(md5(s),1,15),16,10): the cross-engine-exact 60-bit
    hash under every round-9 hash-verified row (minhash/simhash
    verified siblings + the incremental minhash store replay).  MD5 is
    standardized, but conv()'s hex parsing and the cast are the
    build-sensitive parts — pin known-answer values so an engine
    upgrade that changes either fails HERE, not as a driver hash
    mismatch."""

    def test_known_answers(self, spark):
        from pyspark.sql import functions as F

        rows = spark.createDataFrame(
            [("abc",), ("hello world foo",), ("ünïcode",)], ["s"]
        ).select(
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h")
        ).collect()
        assert [r["h"] for r in rows] == [
            648541476951500027,   # md5('abc')[:15] as int
            529488236574830868,   # md5('hello world foo')[:15]
            923665688704222792,   # md5 over UTF-8 bytes of 'ünïcode'
        ]


class TestStructOrderingArgmax:
    """array_max / greatest over (value, -id) structs: the IVF
    centroid assignment and the verified rows' tie-breaks rely on
    lexicographic struct comparison (first field, then second)."""

    def test_array_max_struct_tiebreak(self, spark):
        from pyspark.sql import functions as F

        row = spark.range(1).select(
            F.array_max(
                F.array(
                    F.struct(F.lit(1.0).alias("s"), F.lit(-3).alias("n")),
                    F.struct(F.lit(1.0).alias("s"), F.lit(-1).alias("n")),
                    F.struct(F.lit(0.5).alias("s"), F.lit(-0).alias("n")),
                )
            ).alias("m")
        ).collect()[0]["m"]
        # max sim first; on an exact tie the LARGER -id wins = lower id
        assert (row["s"], row["n"]) == (1.0, -1)


class TestFloorQuantization:
    """floor(x*1e4) on doubles: the integer-hyperplane rows' vector
    quantization.  Spark floor must truncate toward -inf on negatives
    (matching numpy.floor and DuckDB FLOOR), never round."""

    def test_floor_negative_and_boundary(self, spark):
        from pyspark.sql import functions as F

        row = spark.createDataFrame(
            [(-0.32571,), (0.99995,), (-1.0,)], ["x"]
        ).select(
            F.floor(F.col("x") * 10000).cast("long").alias("q")
        ).collect()
        assert [r["q"] for r in row] == [-3258, 9999, -10000]

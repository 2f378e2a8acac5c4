"""Scans, projection, filtering, predicates, distinct, sort/limit and
set operations (SURVEY.md §2.4 "Scans", "Projection / filter",
"Sort / limit / top-k / set ops").

Everything here is a declarative DataFrame plan: filters and column
selections reach the parquet scan (Catalyst predicate pushdown +
column pruning), so at 100 TB a query like ``scan_filter_project``
reads only the referenced columns of the matching row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from guidewire_spark.plans.catalog import load_table
from guidewire_spark.plans.scratch import scratch_dir
from guidewire_spark.registry import query


@query(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)),
                      2) AS DOUBLE) AS disc_price
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with pushed-down filter and pruned columns.

    ``.explain`` shows PushedFilters: [GreaterThan(l_quantity,45.0),
    EqualTo(l_returnflag,R)] and a 5-column ReadSchema, i.e. the scan
    never materializes the other 6 lineitem columns.

    Rounding note: the per-row 2dp round goes through DECIMAL(18,4) on
    BOTH engines. Spark rounds the exact binary double (…2249999… →
    .22) while DuckDB rounds the shortest decimal rendering (.225 →
    .23); snapping to 4 decimals first makes the half-boundary
    unambiguous — 40 of 19830 rows diverged at sf0.1 without it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.where((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(disc, 2).cast("double").alias("disc_price"),
        )
    )


@query(
    "filter_in_between_like",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 100000 AND 200000
      AND o_orderstatus LIKE 'F%'
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE predicates, all pushed to the scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(100000, 200000)
        & F.col("o_orderstatus").like("F%")
    ).select("o_orderkey", "o_totalprice")


@query(
    "filter_rlike_regex",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE regexp_matches(p_name, '^.*(red|blue).*$') AND p_size >= 40
    """,
)
def filter_rlike_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLIKE regular-expression predicate."""
    p = load_table(spark, sf_dir, "part")
    return p.where(
        F.col("p_name").rlike("^.*(red|blue).*$") & (F.col("p_size") >= 40)
    ).select("p_partkey", "p_name")


@query(
    "null_predicates_case_when",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low'
                ELSE 'healthy' END AS balance_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment,
           (c_acctbal IS NOT NULL) AS has_balance
    FROM customer
    """,
)
def null_predicates_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN + NULL-handling expressions (coalesce / nullif / isNotNull)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("healthy")
        .alias("balance_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment"
        ),
        F.col("c_acctbal").isNotNull().alias("has_balance"),
    )


@query(
    "distinct_values",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over two low-cardinality columns (partial-agg pushed map-side)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@query(
    "dedup_by_key",
    oracle="""
    SELECT DISTINCT o_custkey, o_orderstatus FROM orders
    """,
)
def dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a key subset, projected to the key so the
    result is deterministic (survivor choice otherwise is not)."""
    o = load_table(spark, sf_dir, "orders")
    return o.dropDuplicates(["o_custkey", "o_orderstatus"]).select(
        "o_custkey", "o_orderstatus"
    )


@query(
    "sort_multi_key_nulls",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC NULLS LAST, c_name ASC
    LIMIT 50
    """,
)
def sort_multi_key_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (desc nulls-last, asc) with limit.

    Spark executes this as TakeOrderedAndProject — no full global
    shuffle-sort for a bounded result, which is what you want at scale.
    (c_acctbal, c_name) pairs are unique in the data so the top-50 set
    is deterministic.
    """
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc_nulls_last(), F.col("c_name").asc())
        .limit(50)
    )


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with a unique tiebreak key → deterministic set."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "union_all_distinct",
    oracle="""
    SELECT nationkey, name FROM (
      SELECT c_nationkey AS nationkey, 'customer' AS name FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS name FROM supplier
    ) GROUP BY nationkey, name
    """,
)
def union_all_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName + distinct (UNION ALL → GROUP BY equivalence)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("name")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("name")
    )
    return c.unionByName(s).distinct()


@query(
    "intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


@query(
    "except_all_multiset",
    oracle="""
    SELECT o_orderstatus FROM orders WHERE o_totalprice > 50000
    EXCEPT ALL
    SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL multiset difference (per-row multiplicity preserved)."""
    o = load_table(spark, sf_dir, "orders")
    left = o.where(F.col("o_totalprice") > 50000).select("o_orderstatus")
    right = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderstatus")
    return left.exceptAll(right)


@query(
    "csv_roundtrip_scan",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def csv_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + CSV scan (header, explicit schema): write nation to a
    temp CSV directory, read it back. Covers the csv source/sink row of
    SURVEY §2.4 with a deterministic oracle (content is unchanged)."""

    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    out = scratch_dir("gw_csv_") + "/nation_csv"
    n.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.option("header", True).schema(
        "n_nationkey int, n_name string, n_regionkey int"
    ).csv(out)


@query(
    "json_roundtrip_scan",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
)
def json_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + scan (the manifest format of the connector)."""

    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    out = scratch_dir("gw_json_") + "/region_json"
    r.write.mode("overwrite").json(out)
    return spark.read.schema("r_regionkey int, r_name string").json(out)


@query(
    "parquet_sink_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    """,
)
def parquet_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink (overwrite mode) + re-scan."""

    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    out = scratch_dir("gw_pq_") + "/supplier_pq"
    s.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@query(
    "scan_text_source",
    oracle="""
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_line
    FROM documents WHERE doc_id % 9 = 0
    """,
)
def scan_text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``spark.read.text`` line source: documents export one
    tab-framed line each (newlines stripped — the text source's
    record unit IS the line), the raw ``value`` column reads back and
    parses with JVM string functions. The line-file shape is the
    classic log/corpus-ingest entry point; at 100 TB the source
    splits by file block exactly like any other FileFormat."""
    import os as _os

    root = scratch_dir("gw_text_")
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 9 == 0)
        .select(
            F.concat_ws(
                "\t",
                F.col("doc_id").cast("string"),
                F.length("text").cast("string"),
            ).alias("value")
        )
    )
    d.write.mode("overwrite").text(root + "/lines")
    lines = spark.read.text(root + "/lines")
    parts = F.split(F.col("value"), "\t")
    return lines.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).cast("long").alias("n_chars_line"),
    )


@query(
    "scan_binaryfile_source",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id % 101 = 0
    """,
)
def scan_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the opaque-payload entry point the
    multimodal pipeline starts from: one file per payload on disk,
    read back as (path, length, content) WITHOUT decoding, keyed by
    the doc_id embedded in the file name. The oracle checks byte
    lengths against the source texts the files were written from.
    At 100 TB this is the pattern for media lakes: Spark lists and
    splits by FILE, content bytes stream straight to the Arrow/UDF
    stage, nothing parses on the scan path."""
    import os as _os

    root = scratch_dir("gw_binf_")
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 101 == 0)
        .select("doc_id", "text")
        .collect()  # payload-export bootstrap only: bounded (n/101 rows)
    )
    for r in docs:
        with open(_os.path.join(root, f"doc-{r.doc_id}.bin"), "wb") as f:
            f.write(r.text.encode("utf-8"))
    b = spark.read.format("binaryFile").load(root + "/*.bin")
    return b.select(
        F.regexp_extract(F.col("path"), r"doc-(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").cast("long").alias("n_bytes"),
    )

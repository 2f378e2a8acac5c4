"""Round-5 frontier operators: log-log price elasticity and
structural template detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from guidewire_spark.plans.catalog import load_table
from guidewire_spark.registry import query


def _r(col: F.Column, dp: int, prec: str = "decimal(24,10)") -> F.Column:
    """Engine-stable rounding: DECIMAL bridge then round, as double."""
    return F.round(col.cast(prec), dp).cast("double")


@query(
    "agg_price_elasticity_loglog",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             AVG(CAST(ROUND(l_extendedprice / l_quantity * 100, 0)
                 AS BIGINT)) AS unit_cents,
             SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS qty
      FROM lineitem GROUP BY l_partkey
    ),
    logs AS (
      SELECT CAST(ROUND(CAST(ln(unit_cents) AS DECIMAL(20,12)), 12)
                  AS DECIMAL(20,12)) AS x,
             CAST(ROUND(CAST(ln(CAST(qty AS DOUBLE)) AS DECIMAL(20,12)), 12)
                  AS DECIMAL(20,12)) AS y
      FROM pq WHERE unit_cents > 0 AND qty > 0
    ),
    mom AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM logs
    )
    SELECT CAST(n AS BIGINT) AS n_parts,
           CAST(ROUND(CAST(
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           AS DECIMAL(24,10)), 6) AS DOUBLE) AS elasticity,
           CAST(ROUND(CAST(
             (CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                * sx) / n
           AS DECIMAL(24,10)), 6) AS DOUBLE) AS log_intercept
    FROM mom
    """,
)
def agg_price_elasticity_loglog(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Price elasticity of demand from the cross-part log-log
    regression: slope of ln(quantity) on ln(unit price) across parts
    — the constant-elasticity estimate pricing teams start from (a
    slope of −1.2 reads "a 1% price increase loses 1.2% volume").
    The log terms are DECIMAL-rounded at 12 dp before the sums (the
    mutual-information discipline), so the cross-moment accumulation
    is exact and order-free in both engines; the slope division is
    the only float step.  One part-level aggregate, one moment fold."""
    li = load_table(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_partkey").agg(
        F.avg(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100, 0)
            .cast("long")
        ).alias("unit_cents"),
        F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("qty"),
    )
    logs = pq.where((F.col("unit_cents") > 0) & (F.col("qty") > 0)).select(
        F.round(F.log("unit_cents").cast("decimal(20,12)"), 12)
        .cast("decimal(20,12)")
        .alias("x"),
        F.round(F.log(F.col("qty").cast("double")).cast("decimal(20,12)"), 12)
        .cast("decimal(20,12)")
        .alias("y"),
    )
    mom = logs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")) / (
        n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / n
    return mom.select(
        F.col("n").cast("long").alias("n_parts"),
        _r(slope, 6).alias("elasticity"),
        _r(intercept, 6).alias("log_intercept"),
    )


@query(
    "text_template_detection",
    oracle="""
    WITH sig AS (
      SELECT doc_id,
             md5(regexp_replace(regexp_replace(lower(text),
                 '[0-9]+', '#', 'g'), '[a-z]+', 'w', 'g')) AS template_sig
      FROM documents
    ),
    grp AS (
      SELECT template_sig, COUNT(*) AS n_docs,
             MIN(doc_id) AS exemplar_doc
      FROM sig GROUP BY template_sig
    )
    SELECT template_sig, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(exemplar_doc AS BIGINT) AS exemplar_doc
    FROM grp WHERE n_docs >= 5
    """,
)
def text_template_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template detection: collapse every number to ``#`` and every
    word to ``w``, hash the remaining STRUCTURE (punctuation,
    spacing, layout), and report structural signatures shared by 5+
    documents — the machine-generated-boilerplate catcher (receipt
    spam, scraped listings, lorem farms) that token-level dedup
    misses because the WORDS all differ while the skeleton repeats.
    The standard pre-filter before near-dup in web-corpus cleaning.
    One pass: two JVM regex collapses + md5, then a signature-
    cardinality aggregate with a deterministic exemplar (min
    doc_id)."""
    d = load_table(spark, sf_dir, "documents")
    sig = d.select(
        "doc_id",
        F.md5(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "#"),
                "[a-z]+",
                "w",
            )
        ).alias("template_sig"),
    )
    grp = sig.groupBy("template_sig").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("exemplar_doc"),
    )
    return grp.where(F.col("n_docs") >= 5).select(
        "template_sig",
        "n_docs",
        F.col("exemplar_doc").cast("long").alias("exemplar_doc"),
    )

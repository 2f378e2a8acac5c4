"""Remaining-surface operators: Hive-style LATERAL VIEW explode, the
xpath XML family, to_csv/from_csv scalar codecs, Spark 4 collations,
an incremental corpus ingest (digest anti-join + Delta append — the
grow-the-training-set loop), and a CDA manifest drift audit (the
connector ops-health query: manifest claims vs filesystem truth).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from guidewire_spark.plans.catalog import load_table, register_views
from guidewire_spark.plans.scratch import scratch_dir
from guidewire_spark.registry import query


@query(
    "sql_lateral_view_explode",
    oracle="""
    SELECT doc_id, u.word AS word
    FROM (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS word
      FROM documents WHERE doc_id % 100 = 0
    ) u(doc_id, word)
    """,
)
def sql_lateral_view_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode — the Hive-compat SQL spelling of the
    generator join (the other spellings are covered by
    func_explode_posexplode and sql_lateral_topk). Same physical plan
    as the DataFrame explode: a Generate node inside the scan stage,
    zero shuffle."""
    register_views(spark, sf_dir)
    return spark.sql(
        r"""
        SELECT doc_id, word
        FROM documents
        LATERAL VIEW explode(filter(split(text, '\\s+'), x -> x != '')) t AS word
        WHERE doc_id % 100 = 0
        """
    )


@query(
    "func_xpath_family",
    oracle="""
    SELECT doc_id,
           lang AS lang_x,
           CAST(n_chars AS BIGINT) AS chars_x,
           source AS first_src
    FROM documents WHERE doc_id % 50 = 0
    """,
)
def func_xpath_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xpath scalar family (xpath_string / xpath_long / xpath) over an
    XML payload constructed from table columns — the XML sibling of
    func_json_family for feeds that still arrive as XML. The oracle
    recomputes each extraction from the source parts (DuckDB has no
    xpath). Row-parallel JVM expressions; no shuffle."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 50 == 0)
    xml = F.concat(
        F.lit("<doc><lang>"),
        F.col("lang"),
        F.lit("</lang><chars>"),
        F.col("n_chars").cast("string"),
        F.lit("</chars><src>"),
        F.col("source"),
        F.lit("</src></doc>"),
    )
    return d.select(
        "doc_id",
        F.xpath_string(xml, F.lit("/doc/lang")).alias("lang_x"),
        F.xpath_long(xml, F.lit("/doc/chars")).alias("chars_x"),
        F.xpath(xml, F.lit("/doc/src/text()")).getItem(0).alias("first_src"),
    )


@query(
    "func_to_from_csv",
    oracle="""
    SELECT doc_id,
           CAST(doc_id AS VARCHAR) || ',' || lang || ',' ||
             CAST(n_chars AS VARCHAR) AS as_csv,
           lang AS lang_back,
           CAST(n_chars AS BIGINT) AS chars_back
    FROM documents WHERE doc_id % 50 = 0
    """,
)
def func_to_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_csv / from_csv scalar codecs: serialize a struct to one CSV
    line and parse it back with an explicit schema — the row-level
    escape hatch for CSV-embedded columns (as func_to_json/from_json
    is for JSON). Parse-back happens in the same projection: the
    roundtrip is the correctness statement."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 50 == 0)
    as_csv = F.to_csv(F.struct("doc_id", "lang", "n_chars"))
    parsed = F.from_csv(
        as_csv, "doc_id long, lang string, n_chars long"
    )
    return d.select(
        "doc_id",
        as_csv.alias("as_csv"),
        parsed.getField("lang").alias("lang_back"),
        parsed.getField("n_chars").alias("chars_back"),
    )


@query(
    "func_collation_groupby",
    oracle="""
    SELECT lower(CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END)
             AS lang_ci,
           COUNT(*) AS n,
           CAST(count_if(lower(CASE WHEN doc_id % 2 = 0 THEN upper(lang)
                          ELSE lang END) = 'en') AS BIGINT) AS n_en_collated,
           CAST(count_if(lower(CASE WHEN doc_id % 2 = 0 THEN upper(lang)
                          ELSE lang END) = 'en') AS BIGINT) AS n_en_lower
    FROM documents GROUP BY 1
    """,
)
def func_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: case-insensitive comparison at the
    EXPRESSION level via a UTF8_LCASE-collated equality, next to a
    case-insensitive GROUP BY.

    Round-6 lesson (sibling func_collation_lcase failed the driver
    hash while passing the replica): GROUP BY on a collated column
    depends on collation-key hashing internals that can vary across
    Spark 4.x builds, so the grouping key here is explicit lower()
    (build-stable), and collation is exercised on the comparison path
    only — both sides explicitly collated, with a lower() twin column
    so a binary-collation fallback in any build surfaces as a visible
    n_en_collated ≠ n_en_lower disagreement instead of a silent hash
    drift.  Collated-GROUP-BY semantics themselves are asserted in
    tests/test_version_semantics.py."""
    d = load_table(spark, sf_dir, "documents")
    mixed = F.when(F.col("doc_id") % 2 == 0, F.upper("lang")).otherwise(
        F.col("lang")
    )
    lc = F.collate(mixed, "UTF8_LCASE")
    lit_en = F.collate(F.lit("en"), "UTF8_LCASE")
    return (
        d.groupBy(F.lower(mixed).alias("lang_ci"))
        .agg(
            F.count("*").alias("n"),
            F.count_if(lc == lit_en).alias("n_en_collated"),
            F.count_if(F.lower(mixed) == "en").alias("n_en_lower"),
        )
    )


@query(
    "corpus_incremental_ingest",
    oracle="""
    SELECT doc_id, source FROM documents WHERE doc_id % 3 <> 0
    UNION ALL
    SELECT doc_id, source FROM documents
    WHERE md5(text) NOT IN (SELECT md5(text) FROM documents
                            WHERE doc_id % 3 <> 0)
    """,
)
def corpus_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grow-the-training-set loop, end to end: an existing Delta
    corpus receives a new crawl batch; incoming documents whose
    content digest already exists are dropped (exact dedup against the
    CORPUS, not just within the batch), survivors append to the Delta
    table, and the final corpus reads back from the log.

    The digest anti-join is the scale decision: digests (16 bytes)
    shuffle, text never does; at 100 TB the existing-corpus digest
    side is itself corpus-sized, so this is a shuffled anti-join by
    design — broadcasting it is the OOM the fuzzy-decon audit (r3)
    flagged. Composition of dedup_cross_corpus's semantics with the
    Delta writer."""
    from guidewire_spark.sources.snapshot import read_delta
    from guidewire_spark.sources.writer import write_delta

    table = scratch_dir("gw_ingest_") + "/corpus"
    d = load_table(spark, sf_dir, "documents")
    existing = d.where(F.col("doc_id") % 3 != 0).select(
        "doc_id", "source", F.md5("text").alias("digest")
    )
    write_delta(existing, table, mode="append")
    incoming = d.select("doc_id", "source", F.md5("text").alias("digest"))
    corpus_digests = read_delta(spark, table).select("digest")
    fresh = incoming.join(corpus_digests, "digest", "left_anti")
    write_delta(fresh, table, mode="append")
    return read_delta(spark, table).select("doc_id", "source")


@query(
    "cda_manifest_drift_audit",
    oracle="""
    SELECT * FROM (VALUES
      ('events_ok',     TRUE,  TRUE),
      ('events_drift',  FALSE, FALSE)
    ) AS t(table_name, records_match, timestamps_match)
    """,
)
def cda_manifest_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest drift audit — the connector's ops-health query:
    compare every manifest entry's CLAIMS (processed-record count,
    last-write timestamp) against filesystem TRUTH (actual parquet
    rows, actual timestamp directories). One staged table agrees; the
    second has rows dropped and an extra unclaimed timestamp folder —
    both drifts must be flagged.

    Parity: the reference trusts its manifest blindly
    (`/root/reference/README.md` — manifest.json drives the index);
    this audit is what its operators run when counts stop adding up.
    Listing + footer row-counts are metadata-scale; no data shuffles."""
    from guidewire_spark.operators.connector_queries import (
        _stage_commit,
        _write_manifest,
    )
    from guidewire_spark.sources.fs import list_parquet_files, list_timestamp_dirs
    from guidewire_spark.sources.manifest import read_manifest

    root = scratch_dir("gw_audit_")
    e = load_table(spark, sf_dir, "events").limit(200)
    entries = {}
    # table 1: truthful
    ok_root = os.path.join(root, "source", "events_ok")
    _stage_commit(e, os.path.join(ok_root, "fp001", "1700000000000"))
    entries["events_ok"] = {
        "lastSuccessfulWriteTimestamp": "1700000000000",
        "totalProcessedRecordsCount": 200,
        "dataFilesPath": ok_root,
        "schemaHistory": {"fp001": "1700000000000"},
    }
    # table 2: manifest overclaims rows AND is behind on timestamps
    dr_root = os.path.join(root, "source", "events_drift")
    _stage_commit(e.limit(150), os.path.join(dr_root, "fp001", "1700000000000"))
    _stage_commit(e.limit(10), os.path.join(dr_root, "fp001", "1700000500000"))
    entries["events_drift"] = {
        "lastSuccessfulWriteTimestamp": "1700000000000",  # stale
        "totalProcessedRecordsCount": 200,  # only 150 staged there
        "dataFilesPath": dr_root,
        "schemaHistory": {"fp001": "1700000000000"},
    }
    _write_manifest(root, entries)

    manifest = read_manifest(os.path.join(root, "manifest.json"))
    rows = []
    for name in sorted(manifest):
        entry = manifest[name]
        data_root = entry.normalized_data_files_path
        actual_rows = 0
        actual_last_ts = 0
        for fp in os.listdir(data_root):
            fp_dir = os.path.join(data_root, fp)
            for ts in list_timestamp_dirs(fp_dir):
                actual_last_ts = max(actual_last_ts, ts)
                ts_dir = os.path.join(fp_dir, str(ts))
                claimed_dirs = [
                    os.path.join(ts_dir, f.path)
                    if not os.path.isabs(f.path)
                    else f.path
                    for f in list_parquet_files(ts_dir)
                ]
                if claimed_dirs:
                    actual_rows += (
                        spark.read.parquet(*claimed_dirs).count()
                    )
        rows.append(
            (
                name,
                actual_rows == entry.total_processed_records_count,
                actual_last_ts == entry.last_successful_write_timestamp,
            )
        )
    return spark.createDataFrame(
        rows, "table_name string, records_match boolean, timestamps_match boolean"
    )

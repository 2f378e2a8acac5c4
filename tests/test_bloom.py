"""Bloom-filter index tests: zero false negatives (soundness), real
pruning power on point lookups, incremental reindex after OPTIMIZE,
deletion-vector composition, and sidecar GC."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from guidewire_spark.plans.catalog import load_table
from guidewire_spark.sources.bloom import (
    bloom_columns,
    bloom_kept_files,
    create_bloom_index,
    read_bloom_filtered,
    reindex_bloom,
    vacuum_bloom_sidecars,
    _sidecar_path,
)
from guidewire_spark.sources.snapshot import load_snapshot
from guidewire_spark.sources.writer import optimize_table, write_delta


def _side(table, p):
    """Sidecar path under the table's CURRENT configured column set."""
    return _sidecar_path(table, p, bloom_columns(table))


def _make_table(spark, sf_dir, tmp_path, n_files=8, name="li"):
    table = str(tmp_path / name)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition(n_files)
    )
    write_delta(li, table, mode="append")
    return table


def test_bloom_no_false_negatives(spark, sf_dir, tmp_path):
    """Every present key must keep at least the file that holds it:
    the bloom-filtered scan equals the plain filtered scan exactly."""
    table = _make_table(spark, sf_dir, tmp_path)
    create_bloom_index(spark, table, ["l_orderkey"], fpp=0.01)
    base = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    keys = [r[0] for r in base.select("l_orderkey").distinct().limit(20).collect()]
    got = (
        read_bloom_filtered(spark, table, "l_orderkey", keys)
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("l_suppkey").alias("s"))
        .collect()[0]
    )
    want = (
        base.where(F.col("l_orderkey").isin(keys))
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("l_suppkey").alias("s"))
        .collect()[0]
    )
    assert (got["n"], got["s"]) == (want["n"], want["s"])
    # string column round-trips through the same machinery (docs
    # table: doc_id is high-cardinality, so pruning bites too)
    dtable = str(tmp_path / "docs")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").repartition(6)
    write_delta(docs, dtable, mode="append")
    create_bloom_index(spark, dtable, ["doc_id"])
    ids = [r[0] for r in docs.select("doc_id").limit(5).collect()]
    got_c = read_bloom_filtered(spark, dtable, "doc_id", ids).count()
    want_c = docs.where(F.col("doc_id").isin(ids)).count()
    assert got_c == want_c
    kept = bloom_kept_files(spark, dtable, "doc_id", ids[:1])
    assert len(kept) <= 3


def test_bloom_prunes_files(spark, sf_dir, tmp_path):
    """A single-key probe on a high-cardinality column must skip most
    of the 8 files (each file sees ~1/8 of the keys; at fpp=0.01 the
    expected kept count is ~1 + 7*0.01)."""
    table = _make_table(spark, sf_dir, tmp_path)
    create_bloom_index(spark, table, ["l_orderkey"])
    snap = load_snapshot(table)
    key = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .first()[0]
    )
    kept = bloom_kept_files(spark, table, "l_orderkey", [key])
    assert kept, "present key must keep its file"
    assert len(kept) < len(snap.files) // 2, (
        f"bloom kept {len(kept)}/{len(snap.files)} files — no pruning"
    )
    # absent key: overwhelmingly likely to prune everything, but the
    # contract is only fpp-probabilistic — assert the sound direction
    absent = bloom_kept_files(spark, table, "l_orderkey", [-987654321])
    assert len(absent) <= len(snap.files)
    got = read_bloom_filtered(spark, table, "l_orderkey", [-987654321]).count()
    assert got == 0


def test_unindexed_files_are_kept(spark, sf_dir, tmp_path):
    """Files without a sidecar (fresh appends after indexing) must
    always be kept — skipping stays sound with a stale index."""
    table = _make_table(spark, sf_dir, tmp_path, n_files=4)
    create_bloom_index(spark, table, ["l_orderkey"])
    extra = spark.createDataFrame(
        [(999999991, 7)], "l_orderkey long, l_suppkey long"
    ).withColumn("l_shipdate", F.lit("2026-01-01").cast("timestamp_ntz"))
    write_delta(extra, table, mode="append")
    got = read_bloom_filtered(spark, table, "l_orderkey", [999999991]).count()
    assert got == 1, "row in an unindexed file must survive the scan"
    # reindex covers the new files (incl. any zero-row part file the
    # append committed — those get empty always-prune sidecars) and
    # skips the already-indexed ones; then it converges to a no-op
    manifest = reindex_bloom(spark, table)
    assert sum(manifest.values()) == 1
    assert reindex_bloom(spark, table) == {}  # idempotent


def test_optimize_self_maintains_index(spark, sf_dir, tmp_path):
    """OPTIMIZE on a bloom-configured table re-covers its output files
    and GCs the replaced sidecars in the same call — a later manual
    reindex/vacuum is a no-op, and the point lookup stays exact."""
    table = _make_table(spark, sf_dir, tmp_path, n_files=8)
    create_bloom_index(spark, table, ["l_orderkey"])
    optimize_table(spark, table, target_files=2)
    snap = load_snapshot(table)
    for p in snap.files:
        assert os.path.exists(_side(table, p))
    assert reindex_bloom(spark, table) == {}
    assert vacuum_bloom_sidecars(table) == []
    key = (
        load_table(spark, sf_dir, "lineitem").select("l_orderkey").first()[0]
    )
    want = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") == key)
        .count()
    )
    assert read_bloom_filtered(spark, table, "l_orderkey", [key]).count() == want


def test_bloom_with_deletion_vectors(spark, sf_dir, tmp_path):
    """MOR-deleted rows must not resurrect through the bloom scan: a
    DV only turns the file-level answer into a false positive, and
    the DV-aware read drops the dead rows."""
    from guidewire_spark.sources.writer import delete_from_mor

    table = _make_table(spark, sf_dir, tmp_path, n_files=4)
    create_bloom_index(spark, table, ["l_suppkey"])
    supp = (
        load_table(spark, sf_dir, "lineitem").select("l_suppkey").first()[0]
    )
    delete_from_mor(spark, table, f"l_suppkey = {supp}")
    assert read_bloom_filtered(spark, table, "l_suppkey", [supp]).count() == 0


def test_vacuum_bloom_sidecars(spark, sf_dir, tmp_path):
    """Sidecars of files that left the live set are GC'd; live ones
    survive.  Exercised via a copy-on-write DELETE (which rewrites
    files but does NOT auto-maintain the index — only OPTIMIZE does)."""
    from guidewire_spark.sources.bloom import _sidecar_name
    from guidewire_spark.sources.writer import delete_from

    table = _make_table(spark, sf_dir, tmp_path, n_files=4)
    create_bloom_index(spark, table, ["l_orderkey"])
    before = set(load_snapshot(table).files)
    delete_from(spark, table, "l_orderkey % 2 = 0")
    after = set(load_snapshot(table).files)
    dead = before - after
    assert dead, "copy-on-write delete must rewrite files"
    removed = vacuum_bloom_sidecars(table)
    assert {os.path.basename(p) for p in removed} == {
        _sidecar_name(table, p, bloom_columns(table)) for p in dead
    }
    reindex_bloom(spark, table)
    for p in load_snapshot(table).files:
        assert os.path.exists(_side(table, p))


def test_partitioned_table_bloom(spark, sf_dir, tmp_path):
    """Bloom on a non-partition column of a partitioned table: the
    kept files read back with partition literals reconstructed."""
    table = str(tmp_path / "part")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    write_delta(ev, table, mode="append", partition_by=["event_type"])
    create_bloom_index(spark, table, ["user_id"])
    uid = ev.select("user_id").first()[0]
    got = read_bloom_filtered(spark, table, "user_id", [uid])
    assert "event_type" in got.columns
    assert got.count() == ev.where(F.col("user_id") == uid).count()
    assert bloom_columns(table) == ["user_id"]


def test_second_column_rebuilds_existing_sidecars(spark, sf_dir, tmp_path):
    """Indexing another column later must rebuild sidecars that lack
    it — an existing single-column sidecar does not count as covered,
    or the new column would silently never start pruning."""
    table = _make_table(spark, sf_dir, tmp_path, n_files=4)
    create_bloom_index(spark, table, ["l_orderkey"])
    manifest = create_bloom_index(spark, table, ["l_suppkey"])
    assert len(manifest) == 4, "all sidecars must be rebuilt with both columns"
    assert bloom_columns(table) == ["l_orderkey", "l_suppkey"]
    supp = load_table(spark, sf_dir, "lineitem").select("l_suppkey").first()[0]
    want = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_suppkey") == supp)
        .count()
    )
    assert read_bloom_filtered(spark, table, "l_suppkey", [supp]).count() == want
    key = load_table(spark, sf_dir, "lineitem").select("l_orderkey").first()[0]
    kept = bloom_kept_files(spark, table, "l_orderkey", [key])
    assert kept and len(kept) < 4, "first column must still prune after rebuild"

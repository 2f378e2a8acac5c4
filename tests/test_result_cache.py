"""Result-cache tests: exact version-fingerprint invalidation, hit
transparency, atomic republish, and input-set changes."""

from __future__ import annotations

from pyspark.sql import functions as F

from guidewire_spark.plans.catalog import load_table
from guidewire_spark.plans.result_cache import cached_query, invalidate
from guidewire_spark.sources.snapshot import read_delta
from guidewire_spark.sources.writer import write_delta


def _agg(table):
    def compute(spark):
        return (
            read_delta(spark, table)
            .groupBy("n_regionkey")
            .agg(F.count("*").alias("n"), F.sum("n_nationkey").alias("s"))
        )

    return compute


def test_hit_until_input_commits(spark, sf_dir, tmp_path):
    table = str(tmp_path / "nat")
    cache = str(tmp_path / "cache")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    write_delta(n.where("n_nationkey < 10"), table, mode="append")

    r1, hit1 = cached_query(spark, cache, "by region", [table], _agg(table))
    assert not hit1
    want1 = sorted(map(tuple, r1.collect()))

    r2, hit2 = cached_query(spark, cache, "by region", [table], _agg(table))
    assert hit2
    assert sorted(map(tuple, r2.collect())) == want1

    # any new commit on an input invalidates exactly this fingerprint
    write_delta(n.where("n_nationkey >= 10"), table, mode="append")
    r3, hit3 = cached_query(spark, cache, "by region", [table], _agg(table))
    assert not hit3
    want3 = sorted(
        map(
            tuple,
            n.groupBy("n_regionkey")
            .agg(F.count("*").alias("n"), F.sum("n_nationkey").alias("s"))
            .collect(),
        )
    )
    assert sorted(map(tuple, r3.collect())) == want3
    # and the refreshed entry hits again
    assert cached_query(spark, cache, "by region", [table], _agg(table))[1]


def test_keys_namespace_and_invalidate(spark, sf_dir, tmp_path):
    table = str(tmp_path / "nat")
    cache = str(tmp_path / "cache")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    write_delta(n, table, mode="append")
    cached_query(spark, cache, "q/one", [table], _agg(table))
    cached_query(spark, cache, "q two", [table], _agg(table))
    assert cached_query(spark, cache, "q/one", [table], _agg(table))[1]
    assert invalidate(cache, "q/one")
    assert not invalidate(cache, "q/one")
    assert not cached_query(spark, cache, "q/one", [table], _agg(table))[1]
    assert cached_query(spark, cache, "q two", [table], _agg(table))[1]


def test_input_set_change_misses(spark, sf_dir, tmp_path):
    """Same key, different declared input set: the manifest's table
    set must match exactly, or a narrowed declaration would serve
    stale rows."""
    t1 = str(tmp_path / "a")
    t2 = str(tmp_path / "b")
    cache = str(tmp_path / "cache")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    write_delta(n, t1, mode="append")
    write_delta(n, t2, mode="append")
    _, hit = cached_query(spark, cache, "k", [t1, t2], _agg(t1))
    assert not hit
    _, hit = cached_query(spark, cache, "k", [t1], _agg(t1))
    assert not hit, "declared-input change must not hit the wider entry"


def test_sanitized_key_collision_never_cross_serves(spark, sf_dir, tmp_path):
    """'daily/sales' and 'daily sales' sanitize onto one entry dir;
    the manifest's raw key must keep them apart."""
    table = str(tmp_path / "nat")
    cache = str(tmp_path / "cache")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    write_delta(n, table, mode="append")

    def count_only(spark):
        return read_delta(spark, table).groupBy().agg(F.count("*").alias("n"))

    r1, _ = cached_query(spark, cache, "daily/sales", [table], _agg(table))
    r2, hit = cached_query(spark, cache, "daily sales", [table], count_only)
    assert not hit, "colliding sanitized keys must never cross-serve"
    assert r2.columns == ["n"]


def test_hit_handle_survives_republish(spark, sf_dir, tmp_path):
    """A lazy hit DataFrame collected AFTER a republish must still
    return its own rows (result dirs are immutable; only the manifest
    moves)."""
    table = str(tmp_path / "nat")
    cache = str(tmp_path / "cache")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    write_delta(n.where("n_nationkey < 5"), table, mode="append")
    cached_query(spark, cache, "k", [table], _agg(table))
    held, hit = cached_query(spark, cache, "k", [table], _agg(table))
    assert hit
    write_delta(n.where("n_nationkey >= 5"), table, mode="append")
    cached_query(spark, cache, "k", [table], _agg(table))  # republish
    got = sorted(map(tuple, held.collect()))  # old handle, post-republish
    want = sorted(
        map(
            tuple,
            n.where("n_nationkey < 5")
            .groupBy("n_regionkey")
            .agg(F.count("*").alias("n"), F.sum("n_nationkey").alias("s"))
            .collect(),
        )
    )
    assert got == want


def test_compaction_commits_keep_cache_valid(spark, sf_dir, tmp_path):
    """OPTIMIZE (and auto-compact) rewrite files with dataChange=false
    — the logical content is identical by protocol contract, so the
    cache must still HIT; the next real DML still invalidates."""
    from guidewire_spark.sources.deltalog import data_version, last_version
    from guidewire_spark.sources.writer import optimize_table

    table = str(tmp_path / "natc")
    cache = str(tmp_path / "cachec")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    write_delta(n.where("n_nationkey < 10"), table, mode="append")
    write_delta(n.where("n_nationkey >= 10"), table, mode="append")

    _, hit = cached_query(spark, cache, "k", [table], _agg(table))
    assert not hit
    dv_before = data_version(table)
    optimize_table(spark, table, target_files=1)
    assert last_version(table) > dv_before  # a commit happened...
    assert data_version(table) == dv_before  # ...but no DATA change
    _, hit = cached_query(spark, cache, "k", [table], _agg(table))
    assert hit  # compaction did not burn the cache
    # a real append still invalidates (same-typed row via projection)
    write_delta(
        n.where("n_nationkey = 0").withColumn(
            "n_nationkey", F.col("n_nationkey") + 99
        ),
        table,
        mode="append",
    )
    _, hit = cached_query(spark, cache, "k", [table], _agg(table))
    assert not hit


def test_deleted_input_surfaces_not_serves_stale(spark, sf_dir, tmp_path):
    """A missing/deleted input table must raise (as load_snapshot used
    to), never fingerprint as 0 — a live table at data version 0 would
    collide and a stale entry would keep serving hits."""
    import shutil

    import pytest

    table = str(tmp_path / "nat")
    cache = str(tmp_path / "cache")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    write_delta(n, table, mode="append")
    _, hit = cached_query(spark, cache, "k", [table], _agg(table))
    assert not hit
    shutil.rmtree(table)
    with pytest.raises(FileNotFoundError):
        cached_query(spark, cache, "k", [table], _agg(table))

"""Delta-version-aware result cache: serve a repeated query from a
materialized parquet result while its input tables are unchanged,
recompute the moment any input commits a new version.

The warehouse result-set-caching idea (Snowflake and Databricks both
document it publicly): most dashboards re-run identical aggregates
over tables that change far less often than they are read.  What
makes it SAFE here is Delta's version counter — a table's state is
fully named by (path, version), so "inputs unchanged" is an exact
metadata check, not a heuristic TTL.  At 100 TB the economics are
stark: a cache probe is one log stat per input table; a miss costs
the query you were going to run anyway plus one small parquet write.

Design:
- An entry lives under ``<cache_dir>/<key>/`` as versioned
  ``result-<id>.parquet`` dirs + one ``manifest.json`` naming the
  current result and the exact ``{table_path: version}`` fingerprint
  it was computed at (plus the RAW key — entry dirs are sanitized,
  so two keys can share a dir; the manifest check disambiguates).
- ``cached_query`` probes the manifest against each input's CURRENT
  snapshot version; any drift (or any missing/corrupt entry) → run
  ``compute_fn`` into a FRESH result dir, then atomically replace
  only the manifest.  Result dirs are immutable once written, so hit
  DataFrames returned earlier stay valid across a republish (lazy
  Spark reads re-list files at action time — deleting under them is
  the torn read this layout avoids); superseded dirs are GC'd with a
  one-generation grace window.
- Results must be deterministic for the cache to be semantically
  transparent — the same discipline every registered query already
  follows.  Caller-supplied keys namespace entries; the key is a path
  segment, so it is sanitized.
- Invalidation is per-entry and exact.  There is no TTL and no LRU:
  eviction is ``invalidate`` (one entry) or removing the cache dir —
  policy belongs to the operator, correctness to the versions.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _entry_dir(cache_dir: str, key: str) -> str:
    safe = re.sub(r"[^A-Za-z0-9._-]", "_", key)
    return os.path.join(cache_dir, safe)


def _current_versions(tables: list[str]) -> dict[str, int]:
    """Fingerprint = each input's latest DATA version: pure-compaction
    commits (OPTIMIZE / auto-compact, all-dataChange=false) do not
    invalidate — the rows they rewrite are byte-identical by protocol
    contract, so recomputing would burn the full query to produce the
    cached answer.  Any metadata/protocol/DML commit still bumps it."""
    from guidewire_spark.sources.deltalog import data_version

    versions: dict[str, int] = {}
    for t in tables:
        v = data_version(t)
        if v is None:
            # Missing/deleted input must surface, not fingerprint as 0
            # (a live table at data version 0 would collide and a stale
            # cache entry would keep serving hits).
            raise FileNotFoundError(f"no Delta log at {t}")
        versions[t] = int(v)
    return versions


def cached_query(
    spark: SparkSession,
    cache_dir: str,
    key: str,
    tables: list[str],
    compute_fn,
) -> tuple[DataFrame, bool]:
    """Return (result, was_hit).  ``tables`` are the Delta inputs the
    query reads; ``compute_fn(spark) -> DataFrame`` runs on a miss.
    A hit requires every input's current version to equal the
    manifest's — one snapshot stat per table, no data I/O."""
    entry = _entry_dir(cache_dir, key)
    manifest_path = os.path.join(entry, "manifest.json")
    now = _current_versions(tables)
    try:
        with open(manifest_path, encoding="utf-8") as f:
            manifest = json.load(f)
        # the raw key is verified too: sanitization maps 'daily/sales'
        # and 'daily sales' onto one entry dir, and versions alone
        # would happily serve one query's rows as the other's
        if (
            manifest["key"] == key
            and manifest["versions"] == {t: int(v) for t, v in now.items()}
        ):
            return (
                spark.read.parquet(os.path.join(entry, manifest["result"])),
                True,
            )
    except (OSError, ValueError, KeyError):
        pass  # absent or torn entry: recompute

    df = compute_fn(spark)
    # each publish materializes into a FRESH result dir and then
    # atomically replaces only the manifest (os.replace): hit handles
    # returned earlier stay lazy over their own immutable result dir —
    # republishing never deletes data a live DataFrame may still read.
    result_name = f"result-{uuid.uuid4().hex[:8]}.parquet"
    os.makedirs(entry, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(entry, result_name))
    tmp = manifest_path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"versions": now, "key": key, "result": result_name}, f)
    os.replace(tmp, manifest_path)
    # GC superseded result dirs, keeping the newest TWO (the fresh one
    # plus a grace copy for handles collected around the republish);
    # anything older is policy-free to drop
    results = sorted(
        (
            d
            for d in os.listdir(entry)
            if d.startswith("result-") and d != result_name
        ),
        key=lambda d: os.path.getmtime(os.path.join(entry, d)),
    )
    for stale in results[:-1]:
        shutil.rmtree(os.path.join(entry, stale), ignore_errors=True)
    return spark.read.parquet(os.path.join(entry, result_name)), False


def invalidate(cache_dir: str, key: str) -> bool:
    """Drop one entry; returns whether it existed."""
    entry = _entry_dir(cache_dir, key)
    if os.path.isdir(entry):
        shutil.rmtree(entry)
        return True
    return False

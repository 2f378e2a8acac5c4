"""Delta snapshot reconstruction + time travel (the read side).

The reference delegates reads to delta-core; this engine replays the
transaction log in Python (driver-side metadata, tiny) and hands the
resolved file list to ``spark.read.parquet`` — so the actual scan is
a stock vectorized parquet scan with full Catalyst pushdown. Time
travel (``versionAsOf`` / ``timestampAsOf``) mirrors the contract
documented at ``/root/reference/README.md:79-84``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from guidewire_spark.sources.deltalog import delta_log_dir, list_versions


@dataclass
class DeltaSnapshot:
    table_path: str
    version: int
    schema: T.StructType | None
    files: list[str] = field(default_factory=list)
    commit_timestamps: dict[int, int] = field(default_factory=dict)
    file_stats: dict[str, str | None] = field(default_factory=dict)

    @property
    def num_files(self) -> int:
        return len(self.files)

    def pruned_files(self, column: str, lo=None, hi=None) -> list[str]:
        """Data skipping: files that may contain rows with
        ``lo <= column <= hi`` per their ``add.stats`` (files without
        stats are always kept — skipping is sound, never lossy)."""
        from guidewire_spark.sources.stats import prune_files

        return prune_files(self.file_stats, self.files, column, lo, hi)


def _read_commit(table_path: str, version: int) -> list[dict]:
    path = os.path.join(delta_log_dir(table_path), f"{version:020d}.json")
    actions = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                actions.append(json.loads(line))
    return actions


def load_snapshot(
    table_path: str,
    version: int | None = None,
    timestamp: int | None = None,
) -> DeltaSnapshot:
    """Replay the log up to ``version`` (or the last commit whose
    commitInfo timestamp is <= ``timestamp``; default: latest)."""
    versions = list_versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no Delta log at {table_path}")

    if timestamp is not None and version is None:
        chosen = None
        for v in versions:
            for action in _read_commit(table_path, v):
                if "commitInfo" in action:
                    if action["commitInfo"].get("timestamp", 0) <= timestamp:
                        chosen = v
        if chosen is None:
            raise ValueError(f"no version at or before timestamp {timestamp}")
        version = chosen
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {table_path} (have {versions})")

    active: dict[str, str | None] = {}
    schema: T.StructType | None = None
    commit_ts: dict[int, int] = {}
    for v in versions:
        if v > version:
            break
        for action in _read_commit(table_path, v):
            if "add" in action:
                active[action["add"]["path"]] = action["add"].get("stats")
            elif "remove" in action:
                active.pop(action["remove"]["path"], None)
            elif "metaData" in action:
                schema = T.StructType.fromJson(
                    json.loads(action["metaData"]["schemaString"])
                )
            elif "commitInfo" in action:
                commit_ts[v] = action["commitInfo"].get("timestamp", 0)
    return DeltaSnapshot(
        table_path=table_path,
        version=version,
        schema=schema,
        files=sorted(active.keys()),
        commit_timestamps=commit_ts,
        file_stats=dict(active),
    )


def read_delta(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    timestamp: int | None = None,
) -> DataFrame:
    """Snapshot → DataFrame. The explicit schema makes the scan skip
    footer inference, and empty snapshots yield a typed empty frame."""
    snap = load_snapshot(table_path, version=version, timestamp=timestamp)
    if not snap.files:
        return spark.createDataFrame([], snap.schema or T.StructType([]))
    reader = spark.read
    if snap.schema is not None:
        reader = reader.schema(snap.schema)
    return reader.parquet(*snap.files)

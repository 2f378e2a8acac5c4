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

PHYSICAL_NAME_KEY = "delta.columnMapping.physicalName"

# Row tracking: the public Delta protocol's materialized-row-id
# channel. When a rewrite (REORG PURGE / OPTIMIZE) would move rows to
# new files, their stable ids are first written INTO the files as a
# physical column named by this table property; readers coalesce the
# materialized value with the default id (baseRowId + row index), so
# ids survive compaction — the same mechanism Delta proper uses.
MATERIALIZED_ROW_ID_KEY = "delta.rowTracking.materializedRowIdColumnName"
DEFAULT_MATERIALIZED_ROW_ID_COL = "_row_id_materialized"


def physical_name(f: T.StructField) -> str:
    """Column mapping (Delta mode=name): a renamed column keeps its
    original *physical* parquet name in field metadata; unmapped
    fields are physically named by their logical name."""
    return (f.metadata or {}).get(PHYSICAL_NAME_KEY, f.name)


def read_files_with_schema(
    spark: SparkSession, schema: T.StructType | None, paths: list[str]
) -> DataFrame:
    """Read parquet files under a logical schema, resolving column
    mapping: the scan requests physical names (so files written before
    a RENAME COLUMN still bind), then aliases back to logical names.
    DROPped columns simply aren't requested — neither operation ever
    rewrites data."""
    if schema is None:
        return spark.read.parquet(*paths)
    mapped = any(physical_name(f) != f.name for f in schema.fields)
    if not mapped:
        return spark.read.schema(schema).parquet(*paths)
    from pyspark.sql import functions as F

    phys = T.StructType(
        [
            # field metadata rides along: EXISTS_DEFAULT must reach the
            # parquet reader for files missing a defaulted column
            T.StructField(
                physical_name(f), f.dataType, f.nullable, metadata=f.metadata
            )
            for f in schema.fields
        ]
    )
    return spark.read.schema(phys).parquet(*paths).select(
        *[F.col(physical_name(f)).alias(f.name) for f in schema.fields]
    )


@dataclass
class DeltaSnapshot:
    table_path: str
    version: int
    schema: T.StructType | None
    files: list[str] = field(default_factory=list)
    commit_timestamps: dict[int, int] = field(default_factory=dict)
    file_stats: dict[str, str | None] = field(default_factory=dict)
    file_sizes: dict[str, int] = field(default_factory=dict)
    metadata_id: str | None = None
    partition_columns: list[str] = field(default_factory=list)
    file_partitions: dict[str, dict] = field(default_factory=dict)
    # merge-on-read: live add.deletionVector descriptors by file path
    file_dvs: dict[str, dict] = field(default_factory=dict)
    # row tracking: live add.baseRowId per file path
    file_base_rows: dict[str, int] = field(default_factory=dict)
    # latest metaData.configuration AS OF this snapshot's version —
    # version-pinned, so time travel sees the config of its era
    configuration: dict[str, str] = field(default_factory=dict)
    # live domainMetadata actions: domain name → configuration string
    # (a removed=true action deletes its domain)
    domains: dict[str, str] = field(default_factory=dict)
    # SetTransaction high-water marks: appId → latest txn version —
    # carried through checkpoints so idempotent writers survive log
    # retention (expire_log deletes the JSON trail they once walked)
    txns: dict[str, int] = field(default_factory=dict)
    # last protocol action AS OF this version (table-features form
    # preserved) — writers consult it before advertising new features
    protocol: dict = field(
        default_factory=lambda: {"minReaderVersion": 1, "minWriterVersion": 2}
    )

    @property
    def num_files(self) -> int:
        return len(self.files)

    def metadata_count(self) -> int | None:
        """COUNT(*) answered from add.stats alone — no file is opened.
        Returns None when any live file lacks numRecords (the count
        must then fall back to a scan; never guess). At 100 TB this is
        the difference between instant and a full-table scan — the
        same metadata-only count optimization Delta performs.
        Deletion-vector rows are subtracted via the descriptor's
        cardinality — still metadata-only."""
        total = 0
        import json as _json

        for path in self.files:
            raw = self.file_stats.get(path)
            if not raw:
                return None
            n = _json.loads(raw).get("numRecords")
            if n is None:
                return None
            total += n
        for dv in self.file_dvs.values():
            total -= int(dv.get("cardinality", 0))
        return total

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
    from guidewire_spark.sources.log_checkpoint import (
        checkpoint_files,
        load_checkpoint_state,
        read_last_checkpoint,
    )

    versions = list_versions(table_path)
    ckpt_version = read_last_checkpoint(table_path)
    if ckpt_version is not None and not checkpoint_files(
        table_path, ckpt_version
    ):
        ckpt_version = None  # stale marker / partial parts; full replay
    if not versions and ckpt_version is None:
        raise FileNotFoundError(f"no Delta log at {table_path}")

    if timestamp is not None and version is None:
        chosen = None
        for v in versions:
            for action in _read_commit(table_path, v):
                if "commitInfo" in action:
                    # in-commit timestamps (monotonic, clock-skew-proof)
                    # take precedence over the wall-clock field
                    ts = action["commitInfo"].get(
                        "inCommitTimestamp",
                        action["commitInfo"].get("timestamp", 0),
                    )
                    if ts <= timestamp:
                        chosen = v
        if chosen is None:
            raise ValueError(f"no version at or before timestamp {timestamp}")
        version = chosen
    if version is None:
        version = max(versions[-1] if versions else -1,
                      ckpt_version if ckpt_version is not None else -1)
    if version not in versions and version != ckpt_version:
        raise ValueError(f"version {version} not in {table_path} (have {versions})")

    active: dict[str, str | None] = {}
    sizes: dict[str, int] = {}
    partitions: dict[str, dict] = {}
    dvs: dict[str, dict] = {}
    base_rows: dict[str, int] = {}
    schema: T.StructType | None = None
    meta_id: str | None = None
    part_cols: list[str] = []
    config: dict[str, str] = {}
    domains: dict[str, str] = {}
    txns: dict[str, int] = {}
    protocol: dict = {"minReaderVersion": 1, "minWriterVersion": 2}
    commit_ts: dict[int, int] = {}
    replay_after = -1
    if ckpt_version is not None and ckpt_version <= version:
        # O(1) replay: seed from the checkpoint parquet, then apply
        # only the JSON tail — instead of O(versions) JSON reads.
        (active, sizes, partitions, dvs, base_rows, schema, meta_id,
         part_cols, config, domains, txns, protocol) = load_checkpoint_state(
            table_path, ckpt_version
        )
        replay_after = ckpt_version
    for v in versions:
        if v <= replay_after:
            continue
        if v > version:
            break
        for action in _read_commit(table_path, v):
            if "add" in action:
                path = action["add"]["path"]
                active[path] = action["add"].get("stats")
                sizes[path] = action["add"].get("size", 0)
                partitions[path] = action["add"].get("partitionValues") or {}
                # re-adding a path REPLACES its DV state (a MOR delete
                # carries the merged descriptor; a plain re-add after
                # OPTIMIZE/purge carries none and clears it)
                dv = action["add"].get("deletionVector")
                if dv is not None:
                    dvs[path] = dv
                else:
                    dvs.pop(path, None)
                brid = action["add"].get("baseRowId")
                if brid is not None:
                    base_rows[path] = int(brid)
                else:
                    base_rows.pop(path, None)
            elif "remove" in action:
                active.pop(action["remove"]["path"], None)
                sizes.pop(action["remove"]["path"], None)
                partitions.pop(action["remove"]["path"], None)
                dvs.pop(action["remove"]["path"], None)
                base_rows.pop(action["remove"]["path"], None)
            elif "metaData" in action:
                schema = T.StructType.fromJson(
                    json.loads(action["metaData"]["schemaString"])
                )
                meta_id = action["metaData"].get("id")
                part_cols = action["metaData"].get("partitionColumns") or []
                config = dict(
                    action["metaData"].get("configuration") or {}
                )
            elif "txn" in action:
                t = action["txn"]
                if t.get("appId") is not None and t.get("version") is not None:
                    prev_txn = txns.get(t["appId"])
                    if prev_txn is None or t["version"] > prev_txn:
                        txns[t["appId"]] = int(t["version"])
            elif "protocol" in action:
                from guidewire_spark.sources.deltalog import (
                    check_reader_protocol,
                )

                check_reader_protocol(action["protocol"], table_path)
                protocol = dict(action["protocol"])
            elif "domainMetadata" in action:
                dm = action["domainMetadata"]
                if dm.get("removed"):
                    domains.pop(dm["domain"], None)
                else:
                    domains[dm["domain"]] = dm.get("configuration") or ""
            elif "commitInfo" in action:
                commit_ts[v] = action["commitInfo"].get(
                    "inCommitTimestamp",
                    action["commitInfo"].get("timestamp", 0),
                )
    return DeltaSnapshot(
        table_path=table_path,
        version=version,
        schema=schema,
        files=sorted(active.keys()),
        commit_timestamps=commit_ts,
        file_stats=dict(active),
        file_sizes=sizes,
        metadata_id=meta_id,
        partition_columns=part_cols,
        file_partitions=partitions,
        file_dvs=dvs,
        file_base_rows=base_rows,
        configuration=config,
        domains=domains,
        txns=txns,
        protocol=protocol,
    )


def _commit_timestamp(table_path: str, version: int) -> int:
    """A commit's effective timestamp: in-commit timestamp when
    present (monotonic, clock-skew-proof), else commitInfo wall
    clock — the same precedence time travel uses."""
    for action in _read_commit(table_path, version):
        if "commitInfo" in action:
            return action["commitInfo"].get(
                "inCommitTimestamp", action["commitInfo"].get("timestamp", 0)
            )
    return 0


def read_delta_changes_by_timestamp(
    spark: SparkSession,
    table_path: str,
    from_timestamp: int,
    to_timestamp: int | None = None,
    with_row_ids: bool = False,
) -> DataFrame:
    """Change Data Feed by time window (Delta's startingTimestamp /
    endingTimestamp): changes from the first commit at-or-after
    ``from_timestamp`` through the last commit at-or-before
    ``to_timestamp`` (default: latest), both inclusive — resolved to
    versions with the same ICT-over-wall-clock precedence as
    TIMESTAMP AS OF, then delegated to the version-based reader.
    Raises when ``from_timestamp`` lies beyond the last commit
    (Delta's timestamp-too-late error) rather than returning an
    empty-but-plausible feed."""
    versions = list_versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no Delta log at {table_path}")
    ts_of = {v: _commit_timestamp(table_path, v) for v in versions}
    starts = [v for v in versions if ts_of[v] >= from_timestamp]
    if not starts:
        raise ValueError(
            f"from_timestamp {from_timestamp} is after the last commit "
            f"({max(ts_of.values())}) of {table_path}"
        )
    ends = (
        [v for v in versions if ts_of[v] <= to_timestamp]
        if to_timestamp is not None
        else versions
    )
    if not ends or ends[-1] < starts[0]:
        # a window that closes before it opens holds no commits
        return read_delta_changes(
            spark, table_path, versions[-1], versions[-1], with_row_ids
        )
    return read_delta_changes(
        spark, table_path, starts[0] - 1, ends[-1], with_row_ids
    )


def read_delta_changes(
    spark: SparkSession,
    table_path: str,
    from_version: int,
    to_version: int | None = None,
    with_row_ids: bool = False,
) -> DataFrame:
    """Change Data Feed, file-granularity: every row added or removed
    in versions (from_version, to_version], tagged ``_change_type``
    ('insert' / 'delete') and ``_commit_version`` — what Delta's CDF
    materializes when no fine-grained change files exist. A rewritten
    row (OPTIMIZE/MERGE) appears as delete+insert; ``dataChange=false``
    actions (pure compaction) are excluded, so OPTIMIZE emits no
    changes — matching Delta, which doesn't re-trigger CDF consumers
    on compaction.

    This is the incremental-subscribe story (reference README.md:39-43)
    without an always-on stream: consumers poll the log's version
    counter and read exactly the delta.

    ``with_row_ids=True`` (row-tracked tables only) adds the stable
    ``_row_id`` to every change row — the key that lets an incremental
    consumer correlate a MOR UPDATE's delete/insert pair (same id on
    both sides) and dedup replays.  Ids resolve exactly like the read
    path: the file's materialized column when present, else
    baseRowId + row index.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    versions = [v for v in list_versions(table_path) if v > from_version]
    if to_version is not None:
        versions = [v for v in versions if v <= to_version]
    # Base schema + partition layout from the latest snapshot
    # (checkpoint-seeded, cheap); robust to from_version values that
    # are truncated away or beyond the latest version. Per-version
    # metaData actions below override the schema for evolving ranges.
    latest = load_snapshot(table_path)
    schema = latest.schema
    pcols = list(latest.partition_columns or [])

    # Hive-layout data files don't store partition columns; they must
    # be rematerialized from add.partitionValues. remove actions carry
    # empty partitionValues, so removes of files added BEFORE the
    # window resolve through a snapshot at from_version (checkpoint
    # truncation of that version degrades to the latest snapshot's map,
    # which still covers every currently-live file).
    pv_map: dict[str, dict] = dict(latest.file_partitions)
    # dv_state seeds unconditionally (not only for partitioned
    # tables): the per-version DV diff needs the vectors live AT
    # from_version or already-dead rows re-emit as deletes.  A
    # from_version BEFORE the table's first commit legitimately has no
    # state (empty seed correct); an EXISTING-but-unloadable
    # from_version (checkpoint truncation) is only safe while the
    # window carries no deletionVector actions — checked below, since
    # a MOR delete diffed against an empty seed would re-emit
    # already-dead rows as fresh deletes.
    dv_state: dict[str, dict] = {}
    dv_seed_failed = False
    # base-row-id state replays alongside dv_state so every frame can
    # resolve ids as of ITS version; pre-window removes fall back to
    # the latest snapshot's map the same way pv_map does
    base_map: dict[str, int] = dict(latest.file_base_rows)
    mat_col = (latest.configuration or {}).get(MATERIALIZED_ROW_ID_KEY)
    if from_version >= 0:
        try:
            start_snap = load_snapshot(table_path, version=from_version)
            pv_map.update(start_snap.file_partitions)
            dv_state = dict(start_snap.file_dvs)
            base_map.update(start_snap.file_base_rows)
        except (ValueError, FileNotFoundError):
            dv_seed_failed = True

    # Each frame: (version, change kind, file path, dead-index subtract
    # list or None, only-index list or None).  A merge-on-read DELETE
    # commits remove(path) + add(path, deletionVector): the CDF must
    # emit ONLY the newly dead rows as deletes — never a whole-file
    # delete+insert pair for rows that didn't change.
    frames = []
    for v in versions:
        adds: dict[str, dict] = {}
        removes: dict[str, dict] = {}
        for action in _read_commit(table_path, v):
            if "add" in action and action["add"].get("dataChange", True):
                if dv_seed_failed and action["add"].get("deletionVector"):
                    raise ValueError(
                        f"cannot compute changes from version "
                        f"{from_version} of {table_path}: that version's "
                        "deletion-vector state is unrecoverable (log "
                        "truncated past the checkpoint) and version "
                        f"{v} carries a deletionVector — diffing against "
                        "an empty seed would re-emit already-dead rows "
                        "as deletes; start from a reconstructable version"
                    )
                adds[action["add"]["path"]] = action["add"]
            elif "remove" in action and action["remove"].get("dataChange", True):
                removes[action["remove"]["path"]] = action["remove"]
            elif "metaData" in action:
                schema = T.StructType.fromJson(
                    json.loads(action["metaData"]["schemaString"])
                )
        from guidewire_spark.sources.dv import decode_dv

        for path, add in adds.items():
            pv_map[path] = add.get("partitionValues") or {}
            if add.get("baseRowId") is not None:
                base_map[path] = int(add["baseRowId"])
            dv = add.get("deletionVector")
            if path in removes and dv is not None:
                # in-place DV-state change (MOR delete, or a RESTORE
                # re-attaching a vector): the change set is the
                # row-level diff in BOTH directions — new deaths emit
                # as deletes, resurrected rows (a restore shrinking
                # the vector) as inserts
                old = (
                    set(decode_dv(dv_state[path]))
                    if path in dv_state
                    else set()
                )
                new = set(decode_dv(dv))
                fresh = sorted(new - old)
                revived = sorted(old - new)
                if fresh:
                    frames.append(
                        (v, "delete", path, None, fresh, base_map.get(path))
                    )
                if revived:
                    frames.append(
                        (v, "insert", path, None, revived, base_map.get(path))
                    )
                removes.pop(path)
            elif path in removes and path in dv_state:
                # in-place vector REMOVAL (RESTORE to a pre-delete
                # version): only the previously-dead rows change —
                # they come back as inserts
                revived = sorted(decode_dv(dv_state[path]))
                if revived:
                    frames.append(
                        (v, "insert", path, None, revived, base_map.get(path))
                    )
                removes.pop(path)
            else:
                # plain insert; rows dead under a carried DV never
                # existed logically and are excluded
                frames.append(
                    (v, "insert", path, sorted(decode_dv(dv)) if dv else None,
                     None, base_map.get(path))
                )
            if dv is not None:
                dv_state[path] = dv
            else:
                dv_state.pop(path, None)
        for path, rm in removes.items():
            old = dv_state.pop(path, None)
            frames.append(
                (v, "delete", path, sorted(decode_dv(old)) if old else None,
                 None, base_map.get(path))
            )

    if not frames:
        base = schema or T.StructType([])
        extra = [
            T.StructField("_change_type", T.StringType(), True),
            T.StructField("_commit_version", T.LongType(), True),
        ]
        if with_row_ids:
            extra.append(T.StructField("_row_id", T.LongType(), True))
        out_schema = T.StructType(list(base.fields) + extra)
        return spark.createDataFrame([], out_schema)

    dfs = []
    for v, kind, path, subtract, only, base_id in frames:
        base_schema = schema
        if pcols and schema is not None:
            base_schema = T.StructType(
                [f for f in schema.fields if f.name not in pcols]
            )
        if with_row_ids and base_id is None:
            raise ValueError(
                f"with_row_ids: file {path} (version {v}) has no "
                "baseRowId — row tracking is not enabled on this table"
            )
        if subtract is None and only is None and not with_row_ids:
            df = read_files_with_schema(spark, base_schema, [path])
        else:
            from guidewire_spark.sources.dv import (
                META_FILE,
                META_ROW,
                scan_with_row_index,
            )

            scan_schema = base_schema
            if with_row_ids and mat_col and base_schema is not None:
                scan_schema = T.StructType(
                    list(base_schema.fields)
                    + [T.StructField(mat_col, T.LongType(), True)]
                )
            scan = scan_with_row_index(spark, scan_schema, [path])
            if with_row_ids:
                default_id = F.lit(int(base_id)) + F.col(META_ROW)
                scan = scan.withColumn(
                    "_row_id",
                    F.coalesce(F.col(mat_col), default_id)
                    if mat_col
                    else default_id,
                )
                if mat_col:
                    scan = scan.drop(mat_col)
            if subtract is None and only is None:
                df = scan.drop(META_FILE, META_ROW)
            else:
                idx = spark.createDataFrame(
                    [(int(i),) for i in (subtract if only is None else only)],
                    f"{META_ROW} long",
                )
                how = "left_anti" if only is None else "left_semi"
                df = scan.join(F.broadcast(idx), [META_ROW], how).drop(
                    META_FILE, META_ROW
                )
        if pcols and schema is not None:
            pv = pv_map.get(path, {})
            for col in pcols:
                dtype = (
                    schema[col].dataType
                    if col in schema.fieldNames()
                    else T.StringType()
                )
                df = df.withColumn(col, F.lit(pv.get(col)).cast(dtype))
            keep = list(schema.fieldNames())
            if with_row_ids:
                keep.append("_row_id")
            df = df.select(*keep)
        dfs.append(
            df.withColumn("_change_type", F.lit(kind))
            .withColumn("_commit_version", F.lit(v).cast("long"))
        )
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)



def _scan_with_row_ids(spark, snap, files, schema):
    """Scan ``files`` carrying the stable ``_row_id`` column (the
    public Delta row-tracking identity), with deletion vectors applied
    — dead rows' ids simply never appear.

    The id is ``coalesce(materialized, baseRowId + row index)``: when
    the table configuration names a materialized-row-id column
    (written by REORG PURGE / OPTIMIZE on tracked tables), files that
    physically carry it yield the preserved ids and files that don't
    read NULL for the extra schema field and fall back to the default
    identity.  Requires every file to carry a base (tracking must be
    fully enabled)."""
    from pyspark.sql import functions as F

    from guidewire_spark.sources.dv import (
        META_FILE,
        META_ROW,
        apply_dv,
        normalize_path,
        scan_with_row_index,
    )

    missing = [p for p in files if p not in snap.file_base_rows]
    if missing:
        raise ValueError(
            f"{len(missing)} file(s) have no baseRowId — enable row "
            "tracking (enable_row_tracking) before reading row ids"
        )
    mat_col = (snap.configuration or {}).get(MATERIALIZED_ROW_ID_KEY)
    scan_schema = schema
    if mat_col:
        scan_schema = T.StructType(
            list(schema.fields) + [T.StructField(mat_col, T.LongType(), True)]
        )
    df = scan_with_row_index(spark, scan_schema, files)
    bases = spark.createDataFrame(
        [(normalize_path(p), int(snap.file_base_rows[p])) for p in files],
        f"{META_FILE} string, __base long",
    )
    default_id = F.col("__base") + F.col(META_ROW)
    df = (
        df.join(F.broadcast(bases), META_FILE)
        .withColumn(
            "_row_id",
            F.coalesce(F.col(mat_col), default_id) if mat_col else default_id,
        )
        .drop("__base")
    )
    if mat_col:
        df = df.drop(mat_col)
    return apply_dv(df, spark, {p: snap.file_dvs[p] for p in files if p in snap.file_dvs})


def read_delta(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    timestamp: int | None = None,
    partition_filter: dict | None = None,
    with_row_ids: bool = False,
) -> DataFrame:
    """Snapshot → DataFrame. The explicit schema makes the scan skip
    footer inference, and empty snapshots yield a typed empty frame.

    Partitioned tables: partition columns are not stored in the data
    files (hive layout); they are reconstructed as literals per
    partition group from ``add.partitionValues``. ``partition_filter``
    (e.g. ``{"lang": "en"}``) prunes whole file groups from the log
    BEFORE Spark ever sees a path — metadata-only partition pruning,
    the same mechanism Delta uses.
    """
    snap = load_snapshot(table_path, version=version, timestamp=timestamp)
    if not snap.partition_columns:
        if not snap.files:
            base = snap.schema or T.StructType([])
            if with_row_ids:
                base = T.StructType(
                    list(base.fields)
                    + [T.StructField("_row_id", T.LongType(), True)]
                )
            return spark.createDataFrame([], base)
        if with_row_ids:
            return _scan_with_row_ids(spark, snap, snap.files, snap.schema)
        if not snap.file_dvs:
            return read_files_with_schema(spark, snap.schema, snap.files)
        # merge-on-read: plain files scan as usual; DV'd files scan
        # with (file, row_index) metadata and broadcast-anti-join the
        # dead set (bounded by deleted-row count) out
        from guidewire_spark.sources.dv import apply_dv, scan_with_row_index

        plain = [p for p in snap.files if p not in snap.file_dvs]
        dvd = [p for p in snap.files if p in snap.file_dvs]
        live = apply_dv(
            scan_with_row_index(spark, snap.schema, dvd), spark, snap.file_dvs
        )
        if plain:
            live = read_files_with_schema(spark, snap.schema, plain).unionByName(
                live
            )
        return live

    from functools import reduce

    from pyspark.sql import functions as F

    pcols = snap.partition_columns
    groups: dict[tuple, list[str]] = {}
    for path in snap.files:
        pv = snap.file_partitions.get(path, {})
        if partition_filter and any(
            pv.get(k) != (None if v is None else str(v))
            for k, v in partition_filter.items()
        ):
            continue
        groups.setdefault(tuple(pv.get(c) for c in pcols), []).append(path)

    schema = snap.schema or T.StructType([])
    data_schema = T.StructType([f for f in schema.fields if f.name not in pcols])
    if not groups:
        return spark.createDataFrame([], schema)
    parts = []
    # Deterministic group order; None partition values (Hive default
    # partition) sort last rather than crashing the tuple compare.
    for pv, files in sorted(
        groups.items(), key=lambda kv: tuple((v is None, v or "") for v in kv[0])
    ):
        if with_row_ids:
            group_parts = [
                _scan_with_row_ids(spark, snap, files, data_schema)
            ]
        else:
            plain = [p for p in files if p not in snap.file_dvs]
            dvd = [p for p in files if p in snap.file_dvs]
            group_parts = []
            if plain:
                group_parts.append(
                    read_files_with_schema(spark, data_schema, plain)
                )
            if dvd:
                from guidewire_spark.sources.dv import (
                    apply_dv,
                    scan_with_row_index,
                )

                group_parts.append(
                    apply_dv(
                        scan_with_row_index(spark, data_schema, dvd),
                        spark,
                        {p: snap.file_dvs[p] for p in dvd},
                    )
                )
        df = reduce(lambda a, b: a.unionByName(b), group_parts)
        for col, val in zip(pcols, pv):
            dtype = schema[col].dataType if col in schema.fieldNames() else T.StringType()
            df = df.withColumn(col, F.lit(val).cast(dtype))
        parts.append(df)
    out = reduce(lambda a, b: a.unionByName(b), parts)
    if not schema.fields:
        return out
    keep = list(schema.fieldNames()) + (["_row_id"] if with_row_ids else [])
    return out.select(*keep)

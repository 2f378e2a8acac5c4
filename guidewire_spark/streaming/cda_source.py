"""CDA commit folders as a native Spark STREAMING source (Spark 4
Python DataSourceStreamReader).

Reference parity: the reference's incremental story is "re-run the
job; new timestamp folders become new Delta commits"
(`/root/reference/README.md:39-43`, the Guidewire.scala batch loop).
This module re-expresses that subscribe loop as a first-class
``spark.readStream.format("gw_cda_stream")`` source: the stream's
OFFSETS are the CDA commit timestamps themselves, each micro-batch's
partitions are the parquet files of the commit folders inside
``(start, end]``, and Spark's own offset checkpointing provides
exactly-once over the folder feed — no side-channel watermark file,
no re-listing of already-consumed commits.

Scale shape: ``latestOffset`` is one directory listing (metadata,
driver-side, proportional to commit count, never data size);
``partitions`` returns ONE InputPartition PER PARQUET FILE, so a
micro-batch's read parallelism equals its file count and each
executor streams its file as Arrow record batches (zero rows through
the driver).  A 1000-executor cluster drains a day of CDA commits at
file-level parallelism, exactly like the batch indexer's fan-out.

Scope: one schema fingerprint directory per stream (the common tail
case — new commits land under the manifest's LATEST fingerprint).
Historical schema evolution across fingerprints is the batch
indexer's job (`sources/indexer.py`); a stream subscribes to the
post-evolution feed.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)


def _list_commit_ts(root: str) -> list[int]:
    """Timestamp folders under the fingerprint dir (same digit-name
    rule as the batch connector's fs.list_timestamp_dirs)."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.isdigit() and os.path.isdir(os.path.join(root, name)):
            out.append(int(name))
    return sorted(out)


def _list_parquet(folder: str) -> list[str]:
    """Non-hidden, non-empty .parquet files (S3Access.scala:39-41
    rules, same as the batch connector)."""
    out = []
    for name in sorted(os.listdir(folder)):
        if name.startswith(".") or name.startswith("_"):
            continue
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(folder, name)
        if os.path.getsize(full) > 0:
            out.append(full)
    return out


class _CdaFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _CdaStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, columns: list[str]):
        self.root = root
        self.columns = columns

    def initialOffset(self) -> dict:
        return {"ts": -1}

    def latestOffset(self) -> dict:
        ts = _list_commit_ts(self.root)
        return {"ts": ts[-1] if ts else -1}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["ts"]), int(end["ts"])
        parts: list[InputPartition] = []
        for t in _list_commit_ts(self.root):
            if lo < t <= hi:
                for f in _list_parquet(os.path.join(self.root, str(t))):
                    parts.append(_CdaFilePartition(f))
        return parts

    def read(self, partition: _CdaFilePartition):
        import pyarrow.parquet as pq

        if partition is None:
            return  # Spark substitutes [None] for an empty partition list
        # Arrow record batches straight off the file — column-pruned
        # to the stream schema, never materialized as Python rows
        pf = pq.ParquetFile(partition.path)
        yield from pf.iter_batches(columns=self.columns)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing to ack


class CdaStreamSource(DataSource):
    """``spark.readStream.format("gw_cda_stream")
    .option("path", <fingerprint dir>)``."""

    @classmethod
    def name(cls) -> str:
        return "gw_cda_stream"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        root = self.options["path"]
        ts = _list_commit_ts(root)
        if not ts:
            raise ValueError(f"no CDA commit folders under {root}")
        for t in ts:  # first commit WITH data (an empty folder — e.g. a
            # crashed sink publish — must not poison the whole feed)
            files = _list_parquet(os.path.join(root, str(t)))
            if files:
                return from_arrow_schema(pq.read_schema(files[0]))
        raise ValueError(f"no CDA commit under {root} holds any parquet")

    def streamReader(self, schema):
        return _CdaStreamReader(
            self.options["path"], [f.name for f in schema.fields]
        )


def register_cda_stream_source(spark) -> None:
    """Idempotent per session."""
    try:
        spark.dataSource.register(CdaStreamSource)
    except Exception:
        pass  # already registered


# ---------------------------------------------------------------------------
# Batch reader with FILTER PUSHDOWN (Spark 4.1 pushFilters): the
# commit-timestamp column prunes FOLDERS before any file is opened —
# the Python-DataSource rendition of Delta's metadata-only partition
# pruning, and the scale move for "read yesterday's commits" over a
# years-deep CDA feed.
# ---------------------------------------------------------------------------


class _CdaBatchReader(DataSourceReader):
    def __init__(self, root: str, columns: list[str]):
        self.root = root
        self.columns = columns  # data columns (commit_ts excluded)
        self.lo = None  # inclusive pushed bounds on commit_ts
        self.hi = None

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            val = getattr(f, "value", None)
            if attr == ("commit_ts",) and isinstance(val, int):
                if isinstance(f, EqualTo):
                    self.lo = val if self.lo is None else max(self.lo, val)
                    self.hi = val if self.hi is None else min(self.hi, val)
                    continue  # fully handled
                if isinstance(f, GreaterThan):
                    b = val + 1
                    self.lo = b if self.lo is None else max(self.lo, b)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = val if self.lo is None else max(self.lo, val)
                    continue
                if isinstance(f, LessThan):
                    b = val - 1
                    self.hi = b if self.hi is None else min(self.hi, b)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = val if self.hi is None else min(self.hi, val)
                    continue
            yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self):
        parts = []
        for t in _list_commit_ts(self.root):
            if self.lo is not None and t < self.lo:
                continue
            if self.hi is not None and t > self.hi:
                continue
            for f in _list_parquet(os.path.join(self.root, str(t))):
                p = _CdaFilePartition(f)
                p.commit_ts = t
                parts.append(p)
        return parts

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if partition is None:
            return  # empty micro-batch: Spark passes a [None] placeholder
        pf = pq.ParquetFile(partition.path)
        for b in pf.iter_batches(columns=self.columns):
            yield b.append_column(
                "commit_ts", pa.array([partition.commit_ts] * b.num_rows, pa.int64())
            )


class CdaBatchSource(DataSource):
    """``spark.read.format("gw_cda")
    .option("path", <fingerprint dir>)`` — every commit folder's rows
    with a ``commit_ts`` column; range/equality predicates on
    commit_ts push down to folder pruning."""

    @classmethod
    def name(cls) -> str:
        return "gw_cda"

    def schema(self):
        from pyspark.sql import types as T

        base = CdaStreamSource.schema(self)  # same inference
        return T.StructType(
            list(base.fields) + [T.StructField("commit_ts", T.LongType(), True)]
        )

    def reader(self, schema):
        cols = [f.name for f in schema.fields if f.name != "commit_ts"]
        return _CdaBatchReader(self.options["path"], cols)


def register_cda_batch_source(spark) -> None:
    """Idempotent per session.

    Also enables Python-datasource filter pushdown HERE, not only in
    the repo's own session factory (plans/session.py): _CdaBatchReader
    implements ``pushFilters`` and Spark refuses to plan such a source
    while ``spark.sql.python.filterPushdown.enabled`` is false — a
    vanilla driver session would error before reading a single row
    (CORRECTNESS_r07 stream_cda_sink_roundtrip).  The conf is
    runtime-settable, so registration is the right chokepoint: every
    consumer (queries, tests, external callers) inherits it."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(CdaBatchSource)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# Streaming SINK producing the CDA layout (Spark 4 Python
# DataSourceStreamArrowWriter): each micro-batch lands as one commit
# folder <base_ts + batchId>/ of parquet files — the engine both
# consumes AND emits the reference's on-disk contract, so a stream
# can feed the indexer (or another team's reference deployment)
# directly.  Exactly-once: executors stage files and return
# WriterCommitMessages; the driver's commit() publishes the folder
# atomically-enough (replace-on-retry), so a retried batch republishes
# the SAME folder instead of duplicating rows.
# ---------------------------------------------------------------------------


class _CdaSinkMessage(WriterCommitMessage):
    def __init__(self, staged: str | None, rows: int):
        self.staged = staged
        self.rows = rows


class _CdaStreamArrowWriter(DataSourceStreamArrowWriter):
    def __init__(self, root: str, base_ts: int):
        self.root = root
        self.base_ts = base_ts
        self.staging = os.path.join(root, "_staging")

    def write(self, iterator):
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = list(iterator)
        if not batches:
            return _CdaSinkMessage(None, 0)
        os.makedirs(self.staging, exist_ok=True)
        path = os.path.join(self.staging, f"stage-{_uuid.uuid4().hex}.parquet")
        tbl = pa.Table.from_batches(batches)
        pq.write_table(tbl, path)
        return _CdaSinkMessage(path, tbl.num_rows)

    def commit(self, messages, batchId: int) -> None:
        import shutil
        import uuid as _uuid

        # assemble the COMPLETE folder under a non-digit temp name (the
        # commit listing only accepts digit-named dirs, so readers can
        # never observe a partial publish), then ONE atomic rename
        folder = os.path.join(self.root, str(self.base_ts + batchId))
        tmp = os.path.join(self.root, f"publish-{_uuid.uuid4().hex}.tmp")
        try:
            os.makedirs(tmp)
            i = 0
            for m in messages:
                if m is not None and m.staged:
                    os.replace(
                        m.staged, os.path.join(tmp, f"part-{i:05d}.parquet")
                    )
                    i += 1
            if os.path.isdir(folder):
                shutil.rmtree(folder)  # retried batch: republish, not duplicate
            os.rename(tmp, folder)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)  # no orphaned .tmp dirs
            raise

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.staged and os.path.exists(m.staged):
                os.remove(m.staged)


class CdaStreamSink(DataSource):
    """``df.writeStream.format("gw_cda_sink")
    .option("path", <fingerprint dir>).option("base_ts", <epoch ms>)``.

    LOCAL-FILESYSTEM ONLY, by design: the exactly-once publish relies
    on POSIX atomic directory rename (``os.rename(tmp, folder)``),
    which object stores do not provide — an s3:// "rename" is a
    non-atomic copy+delete per object, so a reader could list a
    half-published commit folder.  The object-store publish primitive
    is different (stage under a non-digit prefix, then flip a single
    digit-named marker object or a manifest pointer), deliberately
    not emulated here; a non-local path fails fast at stream start
    instead of corrupting the commit contract at runtime."""

    @classmethod
    def name(cls) -> str:
        return "gw_cda_sink"

    def streamWriter(self, schema, overwrite):
        from urllib.parse import urlparse

        path = self.options["path"]
        parsed = urlparse(path)
        if parsed.scheme == "file":
            path = parsed.path  # os-level rename needs the bare path
        elif parsed.scheme:
            raise ValueError(
                "gw_cda_sink requires a local filesystem path: its "
                "exactly-once publish uses POSIX atomic directory rename, "
                "which object stores do not provide (got "
                f"{path!r}). Stage locally and sync, or use the batch "
                "indexer against the object store instead."
            )
        return _CdaStreamArrowWriter(
            path, int(self.options.get("base_ts", 1800000000000))
        )


def register_cda_stream_sink(spark) -> None:
    """Idempotent per session."""
    try:
        spark.dataSource.register(CdaStreamSink)
    except Exception:
        pass

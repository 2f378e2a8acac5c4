"""Remote-scheme (object-store) arm of the connector filesystem layer.

The reference is S3-native (``S3Access.scala:12-59``); the repo
delegates non-local schemes to fsspec (sources/fs.py).  fsspec is not
installed here, so these tests install ``tests/fake_fsspec.py`` — a
faithful subset of the fsspec interface — into ``sys.modules`` and
build the policy_holders fixture tree (FIXTURES.md §A.2) inside a
``memory://`` filesystem, then run ``index()`` END TO END: manifest
read (P15), timestamp-dir listing (P4), parquet-file listing with
dot-file/zero-byte rules (P5), schema sniffing over remote footers
(P7), and Delta commits whose ``add.modificationTime`` must be epoch
MILLISECONDS even when the backend reports float seconds (the
fs.py:115 hazard fixed this round).
"""

from __future__ import annotations

import datetime
import io
import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.fake_fsspec import MemoryFS, make_fsspec_module

FP1, FP2 = "301248659", "301248660"
T1, T2, T3, T4 = 1680350543000, 1680535502000, 1680757005000, 1680945093000


def _parquet_bytes(first_names, ages, last_names=None) -> bytes:
    cols = {
        "firstName": pa.array(first_names, pa.string()),
        "age": pa.array(ages, pa.int64()),
    }
    if last_names is not None:
        cols["lastName"] = pa.array(last_names, pa.string())
    buf = io.BytesIO()
    pq.write_table(pa.table(cols), buf, compression="snappy")
    return buf.getvalue()


@pytest.fixture
def memfs(monkeypatch):
    """Install the fake fsspec and build the remote CDA tree.

    Modification times deliberately cover all three backend
    representations: float seconds (fsspec convention), datetime
    (s3fs LastModified-style), and already-millis ints.
    """
    fs = MemoryFS()
    mod = make_fsspec_module(fs)
    monkeypatch.setitem(sys.modules, "fsspec", mod)
    monkeypatch.setitem(sys.modules, "fsspec.core", mod.core)

    root = "memory://bucket/cda/policy_holders"
    fs.put_bytes(
        f"{root}/{FP1}/{T1}/part-00000-c000.snappy.parquet",
        _parquet_bytes(["anna", "bob", "cara", "dan"], [34, 45, 28, 52]),
        mtime=1680350600.25,  # float SECONDS — the hazard case
    )
    fs.put_bytes(
        f"{root}/{FP1}/{T2}/part-00000-c000.snappy.parquet",
        _parquet_bytes(["elsa"], [41]),
        mtime=datetime.datetime(
            2023, 4, 3, 12, 0, 0, tzinfo=datetime.timezone.utc
        ),  # datetime — s3fs style
    )
    fs.put_bytes(
        f"{root}/{FP1}/{T2}/part-00001-c000.snappy.parquet",
        _parquet_bytes(["finn", "gia", "hugo"], [29, 63, 47]),
        mtime=1680535600123,  # already epoch-millis int
    )
    # zero-byte file: dropped (Guidewire.scala:145)
    fs.put_bytes(f"{root}/{FP1}/{T2}/part-00002-c000.snappy.parquet", b"")
    # dot-file: ignored (S3Access.scala:39-41)
    fs.put_bytes(
        f"{root}/{FP1}/{T2}/.part-hidden.snappy.parquet",
        _parquet_bytes(["x"], [1]),
    )
    # fingerprint 2 adds lastName; first file rows-less (EDGE CASE#2)
    empty = pa.table(
        {
            "firstName": pa.array([], pa.string()),
            "lastName": pa.array([], pa.string()),
            "age": pa.array([], pa.int64()),
        }
    )
    buf = io.BytesIO()
    pq.write_table(empty, buf)
    fs.put_bytes(f"{root}/{FP2}/{T3}/part-00000-c000.snappy.parquet", buf.getvalue())
    fs.put_bytes(
        f"{root}/{FP2}/{T3}/part-00001-c000.snappy.parquet",
        _parquet_bytes(
            ["ivy", "jon", "kim", "lou"],
            [25, 38, 44, 59],
            ["smith", "doe", "lee", "ray"],
        ),
    )
    fs.put_bytes(
        f"{root}/{FP2}/{T4}/part-00000-c000.snappy.parquet",
        _parquet_bytes(["mia", "ned"], [31, 56], ["fox", "poe"]),
    )

    manifest = {
        "policy_holders": {
            "lastSuccessfulWriteTimestamp": str(T4),
            "totalProcessedRecordsCount": 14,
            "dataFilesPath": root,
            "schemaHistory": {FP1: str(T2), FP2: str(T4)},
        }
    }
    fs.put_bytes(
        "memory://bucket/manifest.json", json.dumps(manifest).encode()
    )
    return fs


def test_read_text_remote(memfs):
    from guidewire_spark.sources.fs import read_text

    text = read_text("memory://bucket/manifest.json")
    assert json.loads(text)["policy_holders"]["dataFilesPath"].startswith(
        "memory://"
    )


def test_list_timestamp_dirs_remote(memfs):
    from guidewire_spark.sources.fs import list_timestamp_dirs

    root = "memory://bucket/cda/policy_holders"
    assert list_timestamp_dirs(f"{root}/{FP1}") == [T1, T2]
    assert list_timestamp_dirs(f"{root}/{FP2}") == [T3, T4]
    assert list_timestamp_dirs(f"{root}/nope") == []


def test_list_parquet_files_remote_rules_and_mtime_units(memfs):
    """Dot-file ignored, zero-byte dropped, paths come back as URIs,
    and every modificationTime is epoch MILLIS regardless of how the
    backend reported it (float seconds / datetime / millis int)."""
    from guidewire_spark.sources.fs import list_parquet_files

    root = "memory://bucket/cda/policy_holders"
    t1_files = list_parquet_files(f"{root}/{FP1}/{T1}")
    assert [f.path.rsplit("/", 1)[-1] for f in t1_files] == [
        "part-00000-c000.snappy.parquet"
    ]
    assert t1_files[0].path.startswith("memory://")
    # float-seconds backend: 1680350600.25 s -> 1680350600250 ms
    assert t1_files[0].modification_time == 1680350600250

    t2_files = list_parquet_files(f"{root}/{FP1}/{T2}")
    names = [f.path.rsplit("/", 1)[-1] for f in t2_files]
    assert names == [
        "part-00000-c000.snappy.parquet",
        "part-00001-c000.snappy.parquet",
    ]  # dot-file and zero-byte file both excluded
    by_name = {f.path.rsplit("/", 1)[-1]: f for f in t2_files}
    # datetime backend -> millis
    assert by_name["part-00000-c000.snappy.parquet"].modification_time == (
        1680523200000
    )
    # already-millis backend passes through unscaled
    assert by_name["part-00001-c000.snappy.parquet"].modification_time == (
        1680535600123
    )
    # sanity: all in the plausible epoch-millis band
    for f in t1_files + t2_files:
        assert 1e12 < f.modification_time < 4e12


def test_index_end_to_end_over_remote_tree(memfs, tmp_path):
    """Full P1->P16 pipeline against the memory:// tree: schema per
    fingerprint sniffed from remote footers, one Delta version per
    commit folder, add paths absolute URIs (shallow clone), and every
    add.modificationTime epoch-millis."""
    from guidewire_spark.sources.deltalog import list_versions
    from guidewire_spark.sources.indexer import index
    from guidewire_spark.sources.snapshot import _read_commit, load_snapshot

    db = str(tmp_path / "db")
    results = index("memory://bucket/manifest.json", db, save_mode="overwrite")
    assert [r.commit_timestamp for r in results["policy_holders"]] == [
        T1,
        T2,
        T3,
        T4,
    ]
    table = os.path.join(db, "policy_holders")
    versions = list_versions(table)
    assert len(versions) == 4

    snap = load_snapshot(table)
    assert set(snap.schema.fieldNames()) == {"firstName", "lastName", "age"}
    # live files = T3 + T4 (fingerprint-2 CREATE replaced fp1's files)
    assert all(p.startswith("memory://") for p in snap.files)

    adds = [
        a["add"]
        for v in versions
        for a in _read_commit(table, v)
        if "add" in a
    ]
    assert adds, "no add actions recorded"
    for add in adds:
        mt = add["modificationTime"]
        assert 1e12 < mt < 4e12, f"not epoch-millis: {mt} ({add['path']})"
    # the float-seconds file specifically
    t1_add = next(a for a in adds if f"/{T1}/" in a["path"])
    assert t1_add["modificationTime"] == 1680350600250


def test_cda_sink_writer_dispatch():
    """Path-scheme dispatch: local and file:// keep the POSIX
    atomic-rename fast path (file:// stripped to the bare path the
    os-level rename needs); object-store schemes get the marker-last
    writer, which fails fast at stream start when fsspec is absent
    (this test runs WITHOUT the memfs fixture, so no fsspec)."""
    from guidewire_spark.streaming.cda_source import (
        CdaStreamSink,
        _CdaStreamArrowWriter,
    )

    w = CdaStreamSink({"path": "file:///tmp/sinkroot"}).streamWriter(None, False)
    assert isinstance(w, _CdaStreamArrowWriter)
    assert w.root == "/tmp/sinkroot"
    w = CdaStreamSink({"path": "/tmp/sinkroot"}).streamWriter(None, False)
    assert isinstance(w, _CdaStreamArrowWriter)
    if "fsspec" not in sys.modules:
        with pytest.raises(ImportError, match="fsspec"):
            CdaStreamSink({"path": "s3://bucket/tbl/fp"}).streamWriter(
                None, False
            )


def test_cda_readers_fail_fast_without_fsspec():
    """A remote feed path must error at PLAN time when fsspec is
    absent, not mid-job in an executor (this test runs WITHOUT the
    memfs fixture, so no fsspec is installed)."""
    from guidewire_spark.streaming.cda_source import (
        CdaBatchSource,
        CdaStreamSource,
    )

    if "fsspec" in sys.modules:
        pytest.skip("real fsspec present")
    with pytest.raises(ImportError, match="requires fsspec"):
        CdaBatchSource({"path": "s3://b/tbl/fp"}).reader(None)
    with pytest.raises(ImportError, match="requires fsspec"):
        CdaStreamSource({"path": "s3://b/tbl/fp"}).streamReader(None)


def _sink_writer(fs_path: str, base_ts: int):
    from guidewire_spark.streaming.cda_source import CdaStreamSink

    return CdaStreamSink(
        {"path": fs_path, "base_ts": str(base_ts)}
    ).streamWriter(None, False)


def _arrow_batch(ids):
    return pa.RecordBatch.from_pydict(
        {
            "id": pa.array(ids, pa.int64()),
            "v": pa.array([f"r{i}" for i in ids], pa.string()),
        }
    )


SINK_ROOT = "memory://bucket/cda/events_out/fpX"
SINK_T0 = 1700000000000


def test_cda_sink_marker_last_publish_and_index_roundtrip(memfs, tmp_path):
    """The object-store arm end to end: executors stage under
    ``_staging/``, commit() fills the digit folder then PUTs the
    table-level marker manifest LAST, and ``index()`` pointed at that
    marker ingests the feed — one Delta version per committed folder,
    nothing from in-flight publishes."""
    from guidewire_spark.sources.deltalog import list_versions
    from guidewire_spark.sources.indexer import index
    from guidewire_spark.sources.snapshot import load_snapshot

    w = _sink_writer(SINK_ROOT, SINK_T0)

    # batch 0: two executor messages
    m1 = w.write(iter([_arrow_batch([1, 2])]))
    m2 = w.write(iter([_arrow_batch([3])]))
    w.commit([m1, m2], 0)

    marker = json.loads(
        memfs.open("memory://bucket/cda/events_out/manifest.json").read()
    )
    entry = marker["events_out"]
    # reference manifest types: timestamps are JSON Strings
    assert entry["lastSuccessfulWriteTimestamp"] == str(SINK_T0)
    assert entry["totalProcessedRecordsCount"] == 3
    assert entry["schemaHistory"] == {"fpX": str(SINK_T0)}
    assert entry["dataFilesPath"] == "memory://bucket/cda/events_out"
    # staging drained, folder holds exactly the two parts
    names = [
        p.rsplit("/", 1)[-1]
        for p in memfs.ls(f"{SINK_ROOT}/{SINK_T0}", detail=False)
    ]
    assert names == ["part-00000.parquet", "part-00001.parquet"]
    assert not memfs.exists(f"{SINK_ROOT}/_staging")

    # crashed publish of batch 1: folder objects exist, marker NOT
    # advanced — invisible to index()'s committed filter
    memfs.put_bytes(
        f"{SINK_ROOT}/{SINK_T0 + 1}/part-junk.parquet",
        _parquet_bytes(["zz"], [0]),
    )
    db = str(tmp_path / "db")
    results = index(
        "memory://bucket/cda/events_out/manifest.json",
        db,
        save_mode="overwrite",
    )
    assert [r.commit_timestamp for r in results["events_out"]] == [SINK_T0]

    # retry of batch 1 replaces the junk, then advances the marker
    m3 = w.write(iter([_arrow_batch([4, 5])]))
    w.commit([m3], 1)
    names = [
        p.rsplit("/", 1)[-1]
        for p in memfs.ls(f"{SINK_ROOT}/{SINK_T0 + 1}", detail=False)
    ]
    assert names == ["part-00000.parquet"], "junk part must be replaced"
    marker = json.loads(
        memfs.open("memory://bucket/cda/events_out/manifest.json").read()
    )
    assert marker["events_out"]["lastSuccessfulWriteTimestamp"] == str(
        SINK_T0 + 1
    )
    assert marker["events_out"]["totalProcessedRecordsCount"] == 5

    results = index(
        "memory://bucket/cda/events_out/manifest.json",
        db,
        save_mode="overwrite",
    )
    assert [r.commit_timestamp for r in results["events_out"]] == [
        SINK_T0,
        SINK_T0 + 1,
    ]
    table = os.path.join(db, "events_out")
    assert len(list_versions(table)) == 2
    snap = load_snapshot(table)
    assert set(snap.schema.fieldNames()) == {"id", "v"}
    assert all(p.startswith("memory://") for p in snap.files)
    assert len(snap.files) == 3  # 2 parts (batch 0) + 1 part (batch 1)


def test_cda_readers_over_object_store_with_marker_gating(memfs):
    """The gw_cda/gw_cda_stream reader machinery on a memory:// feed
    the sink published: listing via fsspec, marker gating of in-flight
    folders, file-granular partitions, and Arrow reads through the
    fsspec handle (executor-side path, exercised in-process)."""
    from guidewire_spark.streaming.cda_source import (
        CdaStreamSource,
        _CdaBatchReader,
        _CdaStreamReader,
        _list_commit_ts,
    )

    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1, 2])]))], 0)
    w.commit(
        [
            w.write(iter([_arrow_batch([3])])),
            w.write(iter([_arrow_batch([4, 5])])),
        ],
        1,
    )
    # in-flight publish beyond the marker: listed nowhere
    memfs.put_bytes(
        f"{SINK_ROOT}/{SINK_T0 + 2}/part-00000.parquet",
        _parquet_bytes(["zz"], [0]),
    )
    assert _list_commit_ts(SINK_ROOT) == [SINK_T0, SINK_T0 + 1]

    # schema inference over the remote footer
    schema = CdaStreamSource({"path": SINK_ROOT}).schema()
    assert [f.name for f in schema.fields] == ["id", "v"]

    r = _CdaStreamReader(SINK_ROOT, ["id", "v"])
    assert r.latestOffset() == {"ts": SINK_T0 + 1}
    parts = r.partitions({"ts": -1}, {"ts": SINK_T0 + 1})
    assert len(parts) == 3  # 1 file (batch 0) + 2 files (batch 1)
    assert all(p.path.startswith("memory://") for p in parts)
    rows = sum(
        b.num_rows for p in parts for b in r.read(p)
    )
    assert rows == 5

    # batch reader: pushed commit_ts bounds prune remote folders
    br = _CdaBatchReader(SINK_ROOT, ["id", "v"])
    br.lo = SINK_T0 + 1
    parts = br.partitions()
    assert {p.commit_ts for p in parts} == {SINK_T0 + 1}
    ids = [
        i
        for p in parts
        for b in br.read(p)
        for i in b.column("id").to_pylist()
    ]
    assert sorted(ids) == [3, 4, 5]


def test_cda_sink_schema_evolution_across_fingerprint_streams(memfs, tmp_path):
    """Sequential schema evolution through the sink protocol: a second
    stream writes a NEW fingerprint dir under the same table; its
    marker update must PRESERVE the first fingerprint's schemaHistory
    entry (setdefault, not overwrite), and ``index()`` over the
    accumulated marker manifest must replay fp1 then fp2 with an
    UPGRADE_SCHEMA commit — the reference's evolution contract
    (Guidewire.scala:221-237) driven end to end by sink output."""
    from guidewire_spark.sources.deltalog import list_versions
    from guidewire_spark.sources.indexer import index
    from guidewire_spark.sources.snapshot import load_snapshot

    t_fp2 = SINK_T0 + 1000
    w1 = _sink_writer(SINK_ROOT, SINK_T0)  # .../events_out/fpX
    w1.commit([w1.write(iter([_arrow_batch([1, 2])]))], 0)

    # fingerprint 2 adds a column
    w2 = _sink_writer("memory://bucket/cda/events_out/fpY", t_fp2)
    wide = pa.RecordBatch.from_pydict(
        {
            "id": pa.array([3, 4], pa.int64()),
            "v": pa.array(["r3", "r4"], pa.string()),
            "extra": pa.array([30, 40], pa.int64()),
        }
    )
    w2.commit([w2.write(iter([wide]))], 0)

    marker = json.loads(
        memfs.open("memory://bucket/cda/events_out/manifest.json").read()
    )["events_out"]
    assert marker["schemaHistory"] == {
        "fpX": str(SINK_T0),
        "fpY": str(t_fp2),
    }
    assert marker["lastSuccessfulWriteTimestamp"] == str(t_fp2)
    assert marker["totalProcessedRecordsCount"] == 4

    db = str(tmp_path / "db")
    results = index(
        "memory://bucket/cda/events_out/manifest.json",
        db,
        save_mode="overwrite",
    )
    assert [r.commit_timestamp for r in results["events_out"]] == [
        SINK_T0,
        t_fp2,
    ]
    table = os.path.join(db, "events_out")
    assert len(list_versions(table)) == 2
    snap = load_snapshot(table)
    # UPGRADE_SCHEMA: latest snapshot carries fp2's schema and files
    assert set(snap.schema.fieldNames()) == {"id", "v", "extra"}
    assert len(snap.files) == 1 and "/fpY/" in snap.files[0]


def test_cda_sink_retry_after_committed_batch_is_noop(memfs):
    """Exactly-once short-circuit: once the marker covers a batch's
    ts, a Spark retry of that batch must not touch the published
    folder (marker-last invariant says it is complete) — it only
    drops its own freshly staged objects."""
    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1, 2])]))], 0)
    before = {
        p: memfs.files[memfs._norm(p)][0]
        for p in memfs.ls(f"{SINK_ROOT}/{SINK_T0}", detail=False)
    }

    # retried batch 0 stages DIFFERENT content, then short-circuits
    w.commit([w.write(iter([_arrow_batch([7, 8, 9])]))], 0)
    after = {
        p: memfs.files[memfs._norm(p)][0]
        for p in memfs.ls(f"{SINK_ROOT}/{SINK_T0}", detail=False)
    }
    assert after == before, "published folder must be untouched"
    assert not memfs.exists(f"{SINK_ROOT}/_staging")
    marker = json.loads(
        memfs.open("memory://bucket/cda/events_out/manifest.json").read()
    )
    assert marker["events_out"]["totalProcessedRecordsCount"] == 2


def test_cda_sink_mv_fallback_copy_delete(memfs, monkeypatch):
    """Backends without server-side mv (hasattr(fs, 'mv') False) take
    the read+write+rm copy path; the publish is byte-identical."""
    from tests.fake_fsspec import MemoryFS

    monkeypatch.delattr(MemoryFS, "mv")
    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1, 2, 3])]))], 0)
    names = [
        p.rsplit("/", 1)[-1]
        for p in memfs.ls(f"{SINK_ROOT}/{SINK_T0}", detail=False)
    ]
    assert names == ["part-00000.parquet"]
    tbl = pq.read_table(
        io.BytesIO(
            memfs.files[memfs._norm(f"{SINK_ROOT}/{SINK_T0}/{names[0]}")][0]
        )
    )
    assert tbl.column("id").to_pylist() == [1, 2, 3]
    assert not memfs.exists(f"{SINK_ROOT}/_staging")


def test_cda_sink_crash_mid_publish_recovers_exactly_once(memfs):
    """Driver dies after moving SOME of the staged parts into the
    commit folder (the non-atomic window object stores force): the
    marker never advanced, so the partial folder is invisible to
    every gated reader, and the Spark batch retry replaces it with a
    complete publish — no duplicate, no loss, no stray staging."""
    from guidewire_spark.streaming.cda_source import _list_commit_ts

    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1, 2])]))], 0)

    m1 = w.write(iter([_arrow_batch([10, 11])]))
    m2 = w.write(iter([_arrow_batch([12])]))
    orig_mv, calls = memfs.mv, {"n": 0}

    def flaky_mv(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise ConnectionError("injected mid-publish crash")
        orig_mv(src, dst)

    memfs.mv = flaky_mv
    with pytest.raises(ConnectionError):
        w.commit([m1, m2], 1)
    memfs.mv = orig_mv

    # marker still at batch 0 → the half-filled folder is invisible
    assert _list_commit_ts(SINK_ROOT) == [SINK_T0]
    assert memfs.exists(f"{SINK_ROOT}/{SINK_T0 + 1}")  # partial junk IS there

    # Spark retries the whole batch: fresh task writes + fresh commit
    m1b = w.write(iter([_arrow_batch([10, 11])]))
    m2b = w.write(iter([_arrow_batch([12])]))
    w.commit([m1b, m2b], 1)

    assert _list_commit_ts(SINK_ROOT) == [SINK_T0, SINK_T0 + 1]
    names = [
        p.rsplit("/", 1)[-1]
        for p in memfs.ls(f"{SINK_ROOT}/{SINK_T0 + 1}", detail=False)
    ]
    assert names == ["part-00000.parquet", "part-00001.parquet"]
    rows = []
    for name in names:
        rows += (
            pq.read_table(
                io.BytesIO(
                    memfs.files[memfs._norm(f"{SINK_ROOT}/{SINK_T0 + 1}/{name}")][0]
                )
            )
            .column("id")
            .to_pylist()
        )
    assert sorted(rows) == [10, 11, 12]
    # the orphaned m2 staging object from the crashed attempt was GC'd
    assert not memfs.exists(f"{SINK_ROOT}/_staging")
    marker = json.loads(
        memfs.open("memory://bucket/cda/events_out/manifest.json").read()
    )
    assert marker["events_out"]["lastSuccessfulWriteTimestamp"] == str(
        SINK_T0 + 1
    )
    assert marker["events_out"]["totalProcessedRecordsCount"] == 5


def test_cda_sink_abort_drops_staging(memfs):
    """abort() must leave no staged objects behind (and the staging
    prefix is non-digit, so even leftovers would be invisible to the
    commit listing)."""
    w = _sink_writer(SINK_ROOT, SINK_T0)
    msg = w.write(iter([_arrow_batch([1])]))
    assert memfs.exists(f"{SINK_ROOT}/_staging")
    w.abort([msg, None], 0)
    assert not memfs.exists(f"{SINK_ROOT}/_staging")


# ---------------------------------------------------------------------------
# Property test: the marker-last protocol under ARBITRARY crash points.
# A crash is injected before the Nth mutating filesystem operation of a
# commit() (every mv / object PUT / delete is a candidate), the batch is
# then retried until it succeeds, and after EVERY step the reader-facing
# invariants must hold:
#   I1  visible commits are exactly the fully-committed batch prefix
#   I2  every visible folder's parquet content is exactly its batch
#   I3  totalProcessedRecordsCount == rows of the committed prefix
# ---------------------------------------------------------------------------


class _CrashFS:
    """MemoryFS proxy that raises ConnectionError before the Nth
    mutating operation (mv / write-open / rm), simulating a driver
    crash mid-commit at an arbitrary protocol step."""

    def __init__(self, inner):
        self._inner = inner
        self.countdown = None  # None = never crash

    def _tick(self):
        if self.countdown is not None:
            if self.countdown <= 0:
                raise ConnectionError("injected crash")
            self.countdown -= 1

    def mv(self, src, dst):
        self._tick()
        return self._inner.mv(src, dst)

    def rm(self, path, recursive=False):
        self._tick()
        return self._inner.rm(path, recursive=recursive)

    def open(self, path, mode="rb"):
        if "w" in mode or "a" in mode:
            self._tick()
        return self._inner.open(path, mode)

    def __getattr__(self, name):  # exists / ls / files / _norm ...
        return getattr(self._inner, name)


def test_marker_protocol_invariants_under_arbitrary_crashes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from guidewire_spark.streaming.cda_source import (
        CdaStreamSink,
        _list_commit_ts,
    )
    from tests.fake_fsspec import MemoryFS, make_fsspec_module

    batch_rows = st.lists(  # one batch = 1-3 parts of 0-3 row ids;
        # a part with NO rows stages nothing (_CdaSinkMessage(None, 0))
        # and an ALL-empty batch publishes no folder at all — the
        # marker still advances, and its replay must no-op, not wedge
        st.lists(st.integers(0, 99), min_size=0, max_size=3),
        min_size=1,
        max_size=3,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        batches=st.lists(batch_rows, min_size=1, max_size=3),
        crashes=st.lists(  # per retry attempt: crash before Nth mutation
            st.integers(0, 12), min_size=0, max_size=4
        ),
        data=st.data(),
    )
    def run(batches, crashes, data):
        fs = _CrashFS(MemoryFS())
        mod = make_fsspec_module(fs)
        saved = {k: sys.modules.get(k) for k in ("fsspec", "fsspec.core")}
        sys.modules["fsspec"], sys.modules["fsspec.core"] = mod, mod.core
        try:
            root = "memory://bkt/cda/tbl/fp"
            w = CdaStreamSink(
                {"path": root, "base_ts": str(SINK_T0)}
            ).streamWriter(None, False)
            crash_iter = iter(crashes)
            committed_rows = 0
            for bi, parts in enumerate(batches):
                ts = SINK_T0 + bi

                def check_invariants(max_committable):
                    # I1: visible commits are exactly the NON-EMPTY
                    # batches of some committed prefix no longer than
                    # the batches attempted so far (empty batches
                    # advance the marker but publish no folder).  A
                    # crash AFTER the marker PUT (e.g. during staging
                    # GC) is a COMPLETED publish, so the current batch
                    # may legitimately already be visible mid-"crash".
                    vis = _list_commit_ts(root)
                    assert any(
                        vis
                        == [
                            SINK_T0 + k
                            for k in range(m)
                            if any(batches[k])
                        ]
                        for m in range(max_committable + 2)
                    ), (vis, batches, max_committable)
                    # I2: anything visible is complete and exact
                    for t in vis:
                        k = t - SINK_T0
                        names = sorted(
                            p
                            for p in fs.ls(f"{root}/{t}", detail=False)
                            if p.endswith(".parquet")
                        )
                        got = sorted(
                            i
                            for p in names
                            for i in pq.read_table(
                                io.BytesIO(fs.files[fs._norm(p)][0])
                            )
                            .column("id")
                            .to_pylist()
                        )
                        assert got == sorted(
                            i for part in batches[k] for i in part
                        )
                    return vis

                # inject 0+ crashed attempts, then one clean retry
                n_crashes = data.draw(st.integers(0, 2))
                for _ in range(n_crashes):
                    msgs = [
                        w.write(iter([_arrow_batch(part)] if part else []))
                        for part in parts
                    ]
                    fs.countdown = next(crash_iter, 3)
                    try:
                        w.commit(msgs, bi)
                    except ConnectionError:
                        pass
                    finally:
                        fs.countdown = None
                    check_invariants(bi)  # I1/I2 mid-failure
                # the clean (final) attempt — or a retry after a crash
                # that actually completed (marker written): both must
                # land exactly-once
                msgs = [
                    w.write(iter([_arrow_batch(part)] if part else []))
                    for part in parts
                ]
                w.commit(msgs, bi)
                committed_rows += sum(len(p) for p in parts)
                vis = check_invariants(bi)
                if any(parts):  # empty batches publish no folder
                    assert vis[-1] == ts  # the clean attempt IS committed
                marker = json.loads(
                    fs.open("memory://bkt/cda/tbl/manifest.json").read()
                )["tbl"]
                assert (
                    int(marker["lastSuccessfulWriteTimestamp"]) == ts
                )  # I3
                assert (
                    marker["totalProcessedRecordsCount"] == committed_rows
                )
        finally:
            for k, v in saved.items():
                if v is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = v

    run()


def test_posix_publish_invariants_under_arbitrary_crashes(tmp_path):
    """The POSIX twin of the marker-protocol property test: crash
    before the Nth filesystem mutation of the rename-based commit()
    (staging replace / rmtree / rename), then retry. Invariants: a
    digit-named folder, once listed, is COMPLETE and exact (the
    atomic-rename guarantee); retries replace rather than duplicate;
    no publish-*.tmp dirs survive a crash."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from guidewire_spark.streaming.cda_source import (
        _CdaStreamArrowWriter,
        _list_commit_ts,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        batches=st.lists(
            st.lists(
                # min_size=0: empty parts stage nothing; an all-empty
                # batch still publishes an (empty) digit folder via
                # the rename — replays replace it, never wedge
                st.lists(st.integers(0, 99), min_size=0, max_size=3),
                min_size=1,
                max_size=2,
            ),
            min_size=1,
            max_size=2,
        ),
        crashes=st.lists(st.integers(0, 6), min_size=0, max_size=3),
        data=st.data(),
    )
    def run(batches, crashes, data):
        import os as _os
        import shutil as _shutil
        import uuid as _uuid

        root = tmp_path / f"fp-{_uuid.uuid4().hex}"
        root.mkdir()
        w = _CdaStreamArrowWriter(str(root), SINK_T0)
        crash_iter = iter(crashes)

        def check(max_committable):
            vis = _list_commit_ts(str(root))
            assert vis == [SINK_T0 + k for k in range(len(vis))]
            assert len(vis) <= max_committable + 1
            for k in range(len(vis)):
                folder = root / str(SINK_T0 + k)
                got = sorted(
                    i
                    for f in folder.iterdir()
                    if f.suffix == ".parquet"
                    for i in pq.read_table(str(f)).column("id").to_pylist()
                )
                assert got == sorted(
                    i for part in batches[k] for i in part
                )
            assert not [
                d for d in root.iterdir() if d.name.endswith(".tmp")
            ]
            return vis

        for bi, parts in enumerate(batches):
            n_crashes = data.draw(st.integers(0, 2))
            for _ in range(n_crashes):
                msgs = [
                    w.write(iter([_arrow_batch(part)] if part else []))
                    for part in parts
                ]
                countdown = [next(crash_iter, 2)]
                orig_replace, orig_rename = _os.replace, _os.rename
                orig_rmtree = _shutil.rmtree

                def tick():
                    if countdown[0] <= 0:
                        raise ConnectionError("injected crash")
                    countdown[0] -= 1

                def c_replace(a, b):
                    tick()
                    orig_replace(a, b)

                def c_rename(a, b):
                    tick()
                    orig_rename(a, b)

                def c_rmtree(p, **kw):
                    if not kw.get("ignore_errors"):
                        tick()
                    orig_rmtree(p, **kw)

                _os.replace, _os.rename = c_replace, c_rename
                _shutil.rmtree = c_rmtree
                try:
                    w.commit(msgs, bi)
                except ConnectionError:
                    pass
                finally:
                    _os.replace, _os.rename = orig_replace, orig_rename
                    _shutil.rmtree = orig_rmtree
                check(bi)
            msgs = [
                w.write(iter([_arrow_batch(part)] if part else []))
                for part in parts
            ]
            w.commit(msgs, bi)
            vis = check(bi)
            assert vis[-1] == SINK_T0 + bi

    run()


def test_cda_sink_concurrent_writer_staleness_abort(memfs, monkeypatch):
    """Two writers racing ONE shared marker manifest (two fingerprint
    streams of the same table): the first to PUT wins, the second's
    read-modify-write must detect the interleaved PUT and abort
    LOUDLY (``_put_manifest`` staleness check) instead of silently
    overwriting — last-PUT-wins would drop the winner's row count and
    marker advance.  The loser's Spark retry then merges cleanly."""
    from guidewire_spark.streaming.cda_source import (
        _CdaRemoteArrowWriter,
        _list_commit_ts,
    )

    t_b = SINK_T0 + 1000
    wa = _sink_writer(SINK_ROOT, SINK_T0)  # .../events_out/fpX
    wb = _sink_writer("memory://bucket/cda/events_out/fpY", t_b)
    wa.commit([wa.write(iter([_arrow_batch([1, 2])]))], 0)

    # stage A's batch 1 now; inject its commit between B's manifest
    # read (start of B's commit) and B's marker PUT (end of it) by
    # hooking the first data-file move of B's publish
    msgs_a1 = [wa.write(iter([_arrow_batch([3])]))]
    orig_mv = _CdaRemoteArrowWriter._mv
    fired = []

    def interleave(fs, src, dst):
        orig_mv(fs, src, dst)
        if not fired:
            fired.append(1)
            wa.commit(msgs_a1, 1)  # A publishes mid-B-commit

    monkeypatch.setattr(
        _CdaRemoteArrowWriter, "_mv", staticmethod(interleave)
    )
    msgs_b = [wb.write(iter([_arrow_batch([10, 11])]))]
    with pytest.raises(RuntimeError, match="concurrent writer"):
        wb.commit(msgs_b, 0)

    # A's interleaved update survived intact — nothing was dropped
    marker = json.loads(
        memfs.open("memory://bucket/cda/events_out/manifest.json").read()
    )["events_out"]
    assert marker["lastSuccessfulWriteTimestamp"] == str(SINK_T0 + 1)
    assert marker["totalProcessedRecordsCount"] == 3
    assert marker["schemaHistory"] == {"fpX": str(SINK_T0)}
    assert marker["generation"] == "2"  # init 0, A batch0 -> 1, A batch1 -> 2
    # B's aborted folder is reader-invisible (marker never covered it)
    assert _list_commit_ts("memory://bucket/cda/events_out/fpY") == []

    # Spark retries B's batch against FRESH manifest state: merges
    monkeypatch.setattr(_CdaRemoteArrowWriter, "_mv", staticmethod(orig_mv))
    wb.commit([wb.write(iter([_arrow_batch([10, 11])]))], 0)
    marker = json.loads(
        memfs.open("memory://bucket/cda/events_out/manifest.json").read()
    )["events_out"]
    assert marker["lastSuccessfulWriteTimestamp"] == str(t_b)
    assert marker["totalProcessedRecordsCount"] == 5
    assert marker["schemaHistory"] == {
        "fpX": str(SINK_T0),
        "fpY": str(t_b),
    }
    assert marker["generation"] == "3"
    assert _list_commit_ts("memory://bucket/cda/events_out/fpY") == [t_b]


def test_cda_sink_init_fails_loud_on_preexisting_newer_folders(memfs):
    """A marker-less tree whose digit folders reach AT/ABOVE the
    stream's next ts means base_ts is misconfigured (or a foreign
    feed is still advancing): presuming those committed would make
    every batch short-circuit as 'already published' and silently
    drop rows.  Init must raise instead.  Folders strictly BELOW the
    stream's ts are the legitimate append-to-reference-feed case and
    stay visible under the init marker."""
    from guidewire_spark.streaming.cda_source import _list_commit_ts

    # newer pre-existing folder >= first ts -> loud failure, no publish
    root_bad = "memory://bucket/cda/pre_bad/fp1"
    memfs.put_bytes(
        f"{root_bad}/{SINK_T0 + 5}/part-00000.parquet",
        _parquet_bytes(["x"], [1]),
    )
    w = _sink_writer(root_bad, SINK_T0)
    msgs = [w.write(iter([_arrow_batch([1])]))]
    with pytest.raises(RuntimeError, match="base_ts"):
        w.commit(msgs, 0)
    assert not memfs.exists("memory://bucket/cda/pre_bad/manifest.json")

    # older pre-existing folder < first ts -> presumed committed,
    # visible under the ts-1 init marker alongside the new publish
    root_ok = "memory://bucket/cda/pre_ok/fp1"
    memfs.put_bytes(
        f"{root_ok}/{SINK_T0 - 5}/part-00000.parquet",
        _parquet_bytes(["y"], [2]),
    )
    w2 = _sink_writer(root_ok, SINK_T0)
    w2.commit([w2.write(iter([_arrow_batch([7, 8])]))], 0)
    assert _list_commit_ts(root_ok) == [SINK_T0 - 5, SINK_T0]


def test_sink_marker_foreign_manifest_does_not_gate(memfs):
    """A single-entry manifest whose key AND dataFilesPath name a
    DIFFERENT table must not gate a neighboring fingerprint dir's
    listing (it would hide legitimately committed folders behind an
    unrelated timestamp); one whose dataFilesPath DOES claim the
    table gates even under a nonstandard key."""
    from guidewire_spark.streaming.cda_source import _list_commit_ts

    ts = SINK_T0 + 42
    root = "memory://bucket/cda/tbl_f/fpQ"
    memfs.put_bytes(
        f"{root}/{ts}/part-00000.parquet", _parquet_bytes(["z"], [3])
    )
    foreign = {
        "other_table": {
            "lastSuccessfulWriteTimestamp": "0",
            "totalProcessedRecordsCount": 1,
            "dataFilesPath": "memory://bucket/cda/other_table",
            "schemaHistory": {},
        }
    }
    memfs.put_bytes(
        "memory://bucket/cda/tbl_f/manifest.json",
        json.dumps(foreign).encode(),
    )
    assert _list_commit_ts(root) == [ts], "foreign manifest must not gate"

    claiming = {
        "weird_key": {
            "lastSuccessfulWriteTimestamp": "0",
            "totalProcessedRecordsCount": 1,
            "dataFilesPath": "memory://bucket/cda/tbl_f/",
            "schemaHistory": {},
        }
    }
    memfs.put_bytes(
        "memory://bucket/cda/tbl_f/manifest.json",
        json.dumps(claiming).encode(),
    )
    assert _list_commit_ts(root) == [], "claiming manifest must gate"


def _two_writer_property(fs_inner_factory):
    """Property twin of the deterministic interleave test: TWO
    fingerprint streams of one table (shared marker manifest, A's ts
    domain below B's), each attempting a random batch sequence, with
    the OTHER writer's commit injected at an ARBITRARY mutation point
    of each attempt.  A single-watermark manifest cannot let two
    interleaved ts domains both advance (the reference's fingerprint
    epochs are sequential), so the protocol's guarantee is: every
    attempt either commits EXACTLY-ONCE or raises LOUDLY — never a
    silent drop — and after any schedule (a) the marker's row count
    equals the rows of successful commits exactly, (b) each
    fingerprint's visible folders are exactly its successful commits,
    complete and byte-exact, (c) failed attempts leave nothing
    reader-visible.  The staleness conflict ('concurrent writer') is
    the one retryable failure; domain/in-flight violations are fatal
    for that stream (operator must re-base it)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from guidewire_spark.streaming.cda_source import (
        CdaStreamSink,
        _list_commit_ts,
    )
    from tests.fake_fsspec import make_fsspec_module

    T0A, T0B = SINK_T0, SINK_T0 + 10_000

    class _HookFS:
        """MemoryFS proxy firing a one-shot hook before the Nth
        mutating operation — runs the OTHER writer's commit inside
        this one's stage→read→PUT window."""

        def __init__(self, inner):
            self._inner = inner
            self.hook = None
            self.countdown = None

        def _tick(self):
            if self.countdown is not None:
                if self.countdown <= 0 and self.hook is not None:
                    h, self.hook, self.countdown = self.hook, None, None
                    h()
                elif self.countdown > 0:
                    self.countdown -= 1

        def mv(self, src, dst):
            self._tick()
            return self._inner.mv(src, dst)

        def rm(self, path, recursive=False):
            self._tick()
            return self._inner.rm(path, recursive=recursive)

        def open(self, path, mode="rb"):
            # manifest PUTs do NOT tick: the protocol's guarantee is
            # conditional on the marker PUT being the atomic unit
            # (the residual check-then-PUT window is the documented
            # CAS caveat, not a schedule this model generates) —
            # conflicts interleave anywhere in the data plane instead
            if ("w" in mode or "a" in mode) and not path.endswith(
                "manifest.json"
            ):
                self._tick()
            return self._inner.open(path, mode)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    class _HookCasFS(_HookFS):
        """CAS-capable proxy: the hook may fire immediately BEFORE
        the conditional PUT — the exact schedule the check-then-PUT
        fallback cannot close — and the atomic precondition must
        still catch it."""

        def cas_put(self, path, data, expected):
            self._tick()
            return self._inner.cas_put(path, data, expected)

    @settings(max_examples=30, deadline=None)
    @given(
        rounds=st.lists(  # per round: (rows_a, rows_b, interleave tick)
            st.tuples(
                # min_size=0: an EMPTY batch advances the watermark
                # without publishing a folder — its interleavings and
                # replays must obey the same no-silent-drop contract
                st.lists(st.integers(0, 99), min_size=0, max_size=3),
                st.lists(st.integers(100, 199), min_size=0, max_size=3),
                st.integers(0, 10),
            ),
            min_size=1,
            max_size=3,
        ),
        a_first=st.booleans(),
    )
    def run(rounds, a_first):
        inner = fs_inner_factory()
        fs = (_HookCasFS if hasattr(inner, "cas_put") else _HookFS)(inner)
        mod = make_fsspec_module(fs)
        saved = {k: sys.modules.get(k) for k in ("fsspec", "fsspec.core")}
        sys.modules["fsspec"], sys.modules["fsspec.core"] = mod, mod.core
        try:
            wa = CdaStreamSink(
                {"path": "memory://bkt/cda/t2/fpA", "base_ts": str(T0A)}
            ).streamWriter(None, False)
            wb = CdaStreamSink(
                {"path": "memory://bkt/cda/t2/fpB", "base_ts": str(T0B)}
            ).streamWriter(None, False)
            alive = {"A": True, "B": True}
            ok_rows = 0  # rows of successful commits, both writers
            ok_ts = {"A": [], "B": []}  # FOLDER-publishing commits only
            ok_wm = []  # every successful commit's ts (incl. empty)
            rows_at = {}  # (side, ts) -> committed row ids

            def attempt(side, w, t0, rows, bi):
                """One commit attempt (+ one retry on the retryable
                staleness conflict).  Returns True iff committed."""
                nonlocal ok_rows
                for is_retry in (False, True):
                    msgs = [
                        w.write(iter([_arrow_batch(rows)] if rows else []))
                    ]
                    try:
                        w.commit(msgs, bi)
                    except RuntimeError as e:
                        if "concurrent writer" in str(e) and not is_retry:
                            w.abort(msgs, bi)
                            continue  # Spark retries the batch
                        # fatal for this stream: domain below the
                        # shared watermark, or foreign in-flight
                        # folders — LOUD, nothing published
                        w.abort(msgs, bi)
                        alive[side] = False
                        return False
                    ok_rows += len(rows)
                    ok_wm.append(t0 + bi)
                    if rows:  # empty commits publish no folder
                        ok_ts[side].append(t0 + bi)
                        rows_at[(side, t0 + bi)] = sorted(rows)
                    return True
                return False  # unreachable

            for bi, (rows_a, rows_b, tick) in enumerate(rounds):
                order = ("A", "B") if a_first else ("B", "A")
                par = {
                    "A": (wa, T0A, rows_a),
                    "B": (wb, T0B, rows_b),
                }
                first, second = order
                if alive[first] and alive[second]:
                    # FIRST's commit injected at mutation #tick of
                    # SECOND's attempt (beyond its mutation count =
                    # no interleave; FIRST then runs afterwards)
                    fired = []

                    def run_first():
                        fired.append(1)
                        attempt(first, *par[first], bi)

                    fs.hook, fs.countdown = run_first, tick
                    try:
                        attempt(second, *par[second], bi)
                    finally:
                        fs.hook, fs.countdown = None, None
                    if not fired:
                        attempt(first, *par[first], bi)
                else:
                    for side in order:
                        if alive[side]:
                            attempt(side, *par[side], bi)

                # invariants after EVERY round
                marker = json.loads(
                    fs.open("/bkt/cda/t2/manifest.json").read()
                )["t2"]
                assert marker["totalProcessedRecordsCount"] == ok_rows
                if ok_wm:
                    assert (
                        int(marker["lastSuccessfulWriteTimestamp"])
                        == max(ok_wm)
                    )
                for side, root in (
                    ("A", "memory://bkt/cda/t2/fpA"),
                    ("B", "memory://bkt/cda/t2/fpB"),
                ):
                    assert _list_commit_ts(root) == ok_ts[side]
                    for t in ok_ts[side]:
                        got = sorted(
                            i
                            for pth in fs.ls(f"{root}/{t}", detail=False)
                            if pth.endswith(".parquet")
                            for i in pq.read_table(
                                io.BytesIO(fs.files[fs._norm(pth)][0])
                            )
                            .column("id")
                            .to_pylist()
                        )
                        assert got == rows_at[(side, t)], (side, t)
        finally:
            for k, v in saved.items():
                if v is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = v

    run()


def test_two_writer_staleness_property_no_lost_updates():
    """Check-then-PUT fallback backend (no conditional PUT): every
    interleaving either commits exactly-once or fails loudly; manifest
    PUTs are modeled atomic per the documented CAS caveat."""
    from tests.fake_fsspec import MemoryFS

    _two_writer_property(MemoryFS)


def test_two_writer_staleness_property_true_cas_backend():
    """True-CAS backend (CasMemoryFS implements the repo's cas_put
    extension hook): same invariants, but conflicts are additionally
    injected immediately BEFORE the conditional PUT — the residual
    window of the fallback path — and the atomic precondition must
    convert every such clobber into a loud retryable failure."""
    from tests.fake_fsspec import CasMemoryFS

    _two_writer_property(CasMemoryFS)


def test_stream_discovery_roundtrips_flat_in_commit_count(monkeypatch):
    """CI twin of tools/discovery_probe.py: gw_cda_stream's
    per-microbatch discovery must issue an IDENTICAL fs-API call
    profile at 50 and 500 commits (one listing + one marker GET per
    poll; plus one exists + one listing for the single new folder
    when planning) — the O(1)-roundtrips-per-poll contract that keeps
    a long-running stream's discovery flat as table history grows."""
    from tests.fake_fsspec import CountingFS, MemoryFS, make_fsspec_module

    fs = CountingFS(MemoryFS())
    mod = make_fsspec_module(fs)
    monkeypatch.setitem(sys.modules, "fsspec", mod)
    monkeypatch.setitem(sys.modules, "fsspec.core", mod.core)

    from guidewire_spark.streaming.cda_source import _CdaStreamReader

    def build(n):
        t0 = 1700000000000
        root = f"memory://bkt/cda/tb{n}/fp"
        for i in range(n):
            fs.put_bytes(
                f"{root}/{t0 + i}/part-00000.parquet",
                _parquet_bytes(["x"], [1]),
            )
        fs.put_bytes(
            f"memory://bkt/cda/tb{n}/manifest.json",
            json.dumps(
                {
                    f"tb{n}": {
                        "lastSuccessfulWriteTimestamp": str(t0 + n - 1),
                        "totalProcessedRecordsCount": n,
                        "dataFilesPath": f"memory://bkt/cda/tb{n}",
                        "schemaHistory": {"fp": str(t0)},
                    }
                }
            ).encode(),
        )
        return root, t0

    profiles = {}
    for n in (50, 500):
        root, t0 = build(n)
        rdr = _CdaStreamReader(root, ["id"])
        fs.reset()
        last = rdr.latestOffset()
        poll = fs.reset()
        assert last["ts"] == t0 + n - 1
        parts = rdr.partitions({"ts": last["ts"] - 1}, last)
        plan = fs.reset()
        assert len(parts) == 1
        profiles[n] = (poll, plan)
    assert profiles[50] == profiles[500], profiles
    assert sum(profiles[50][0].values()) <= 3  # poll: ls + marker GET (+exists)
    assert sum(profiles[50][1].values()) <= 5  # plan: + new folder listing


def test_new_epoch_refuses_crashed_predecessor_inflight_folder(memfs):
    """Sequential-epoch handoff safety: epoch 1 (fpX) crashes HARD
    between filling a commit folder and the marker PUT (folder exists
    above the watermark, process gone — nothing cleans it).  Epoch 2
    (fpY) joining the table must REFUSE its first commit: advancing
    the shared watermark past the predecessor's unpublished folder
    would make that partial publish reader-visible.  After the
    operator removes the crashed folder, the new epoch starts
    cleanly."""
    w1 = _sink_writer(SINK_ROOT, SINK_T0)  # .../events_out/fpX
    w1.commit([w1.write(iter([_arrow_batch([1, 2])]))], 0)

    # hard crash of fpX's batch 1: folder filled, marker never PUT
    memfs.put_bytes(
        f"{SINK_ROOT}/{SINK_T0 + 1}/part-00000.parquet",
        _parquet_bytes(["zz"], [9]),
    )

    t_b = SINK_T0 + 1000
    w2 = _sink_writer("memory://bucket/cda/events_out/fpY", t_b)
    msgs = [w2.write(iter([_arrow_batch([10])]))]
    with pytest.raises(RuntimeError, match="in-flight"):
        w2.commit(msgs, 0)
    # nothing published, marker untouched (fpX's watermark stands)
    marker = json.loads(
        memfs.open("memory://bucket/cda/events_out/manifest.json").read()
    )["events_out"]
    assert marker["lastSuccessfulWriteTimestamp"] == str(SINK_T0)
    from guidewire_spark.streaming.cda_source import _list_commit_ts

    assert _list_commit_ts("memory://bucket/cda/events_out/fpY") == []

    # operator cleans the crashed folder -> the handoff proceeds
    memfs.rm(f"{SINK_ROOT}/{SINK_T0 + 1}", recursive=True)
    w2.commit([w2.write(iter([_arrow_batch([10])]))], 0)
    marker = json.loads(
        memfs.open("memory://bucket/cda/events_out/manifest.json").read()
    )["events_out"]
    assert marker["lastSuccessfulWriteTimestamp"] == str(t_b)
    assert marker["schemaHistory"] == {
        "fpX": str(SINK_T0),
        "fpY": str(t_b),
    }
    assert _list_commit_ts("memory://bucket/cda/events_out/fpY") == [t_b]


def test_cda_sink_empty_batch_replay_is_noop(memfs):
    """A zero-row micro-batch publishes NO folder (object stores have
    no empty directories) but still advances the marker; a restart
    replaying it hits the already-committed short-circuit with no
    folder to find.  The folder-existence assertion used to wedge the
    stream permanently ('co-tenant advanced the shared marker') on
    every retry of any empty batch — with zero rows there is nothing
    to drop, so the replay must no-op and the stream must continue."""
    from guidewire_spark.streaming.cda_source import _list_commit_ts

    mpath = "memory://bucket/cda/events_out/manifest.json"
    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1])]))], 0)
    # batch 1 is EMPTY: every task saw no rows
    w.commit([w.write(iter([])), None], 1)
    marker = json.loads(memfs.open(mpath).read())["events_out"]
    assert marker["lastSuccessfulWriteTimestamp"] == str(SINK_T0 + 1)
    assert marker["totalProcessedRecordsCount"] == 1
    assert not memfs.exists(f"{SINK_ROOT}/{SINK_T0 + 1}")

    # restart: a fresh writer replays the (still empty) batch 1
    w2 = _sink_writer(SINK_ROOT, SINK_T0)
    w2.commit([w2.write(iter([]))], 1)
    assert json.loads(memfs.open(mpath).read())["events_out"] == marker

    # ... and the stream continues past it
    w2.commit([w2.write(iter([_arrow_batch([2, 3])]))], 2)
    assert _list_commit_ts(SINK_ROOT) == [SINK_T0, SINK_T0 + 2]
    marker = json.loads(memfs.open(mpath).read())["events_out"]
    assert marker["totalProcessedRecordsCount"] == 3


def test_cda_sink_transient_manifest_read_error_fails_batch(memfs):
    """A throttled/denied manifest READ during commit must fail the
    batch loudly (Spark retries it), not masquerade as 'manifest
    absent': the init path would then CAS-publish a fresh entry over
    the real one — row-count audit reset to 0, schemaHistory epochs
    wiped.  Reader side, the same transient error must not silently
    un-gate the listing (exposing in-flight folders)."""
    from guidewire_spark.streaming.cda_source import _list_commit_ts

    mpath = "memory://bucket/cda/events_out/manifest.json"
    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1, 2])]))], 0)

    orig_open = memfs.open

    def throttled_open(path, mode="rb"):
        if path.endswith("manifest.json") and "r" in mode:
            raise PermissionError("injected throttle")
        return orig_open(path, mode)

    memfs.open = throttled_open
    msg = w.write(iter([_arrow_batch([3])]))
    with pytest.raises(OSError, match="throttle"):
        w.commit([msg], 1)
    with pytest.raises(OSError, match="throttle"):
        _list_commit_ts(SINK_ROOT)
    memfs.open = orig_open

    # manifest intact; the Spark retry of the batch commits cleanly
    marker = json.loads(memfs.open(mpath).read())["events_out"]
    assert marker["lastSuccessfulWriteTimestamp"] == str(SINK_T0)
    assert marker["totalProcessedRecordsCount"] == 2
    assert marker["schemaHistory"] == {"fpX": str(SINK_T0)}
    w.commit([msg], 1)
    marker = json.loads(memfs.open(mpath).read())["events_out"]
    assert marker["totalProcessedRecordsCount"] == 3
    assert _list_commit_ts(SINK_ROOT) == [SINK_T0, SINK_T0 + 1]


def test_cda_sink_replay_over_cotenant_advance_raises_and_cleans(memfs):
    """Crash mid-fill at ts, then a co-tenant stream advances the
    SHARED table watermark past ts (a misconfigured concurrent epoch).
    The crashed stream's replay of ts used to satisfy the
    already-committed short-circuit on mere folder EXISTENCE — the
    batch's rows silently dropped and the partial folder left
    reader-visible.  With per-fingerprint epoch watermarks the replay
    detects the foreign advance, removes its own junk folder, and
    raises."""
    mpath = "memory://bucket/cda/events_out/manifest.json"
    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1])]))], 0)

    # crash mid-fill of batch 1: folder part-filled, marker never PUT
    memfs.put_bytes(
        f"{SINK_ROOT}/{SINK_T0 + 1}/part-00000.parquet",
        _parquet_bytes(["junk"], [0]),
    )
    # co-tenant (misconfigured second writer of the same table) bumps
    # the shared watermark past this stream's ts domain
    marker = json.loads(memfs.open(mpath).read())
    marker["events_out"]["lastSuccessfulWriteTimestamp"] = str(SINK_T0 + 5)
    memfs.put_bytes(mpath, json.dumps(marker).encode())

    msg = w.write(iter([_arrow_batch([2])]))
    with pytest.raises(RuntimeError, match="epoch watermark"):
        w.commit([msg], 1)
    # the part-filled folder (reader-visible under the foreign marker)
    # was removed, and the replay's staged objects dropped
    assert not memfs.exists(f"{SINK_ROOT}/{SINK_T0 + 1}")
    assert not memfs.exists(f"{SINK_ROOT}/_staging")
    # batch 0's legitimate publish is untouched
    assert memfs.exists(f"{SINK_ROOT}/{SINK_T0}")


def test_sink_marker_same_basename_foreign_manifest_does_not_gate(memfs):
    """A manifest copied from ANOTHER deployment of a same-named table
    (dataFilesPath ``.../archive/events_out`` sitting next to
    ``.../prod/events_out``) must not gate the listing — a bare
    ``endswith('/<table_name>')`` is not a claim.  Scheme SPELLING
    alone (s3:// vs s3a:// vs memory://) does not make a manifest
    foreign: the rest of the path decides."""
    from guidewire_spark.streaming.cda_source import _list_commit_ts

    ts = SINK_T0 + 7
    root = "memory://bucket/prod/events_out/fpZ"
    mpath = "memory://bucket/prod/events_out/manifest.json"
    memfs.put_bytes(
        f"{root}/{ts}/part-00000.parquet", _parquet_bytes(["a"], [1])
    )
    entry = {
        "lastSuccessfulWriteTimestamp": "0",
        "totalProcessedRecordsCount": 1,
        "dataFilesPath": "memory://bucket/archive/events_out",
        "schemaHistory": {},
    }
    memfs.put_bytes(
        mpath, json.dumps({"weird_key": entry}).encode()
    )
    assert _list_commit_ts(root) == [ts], (
        "same-basename manifest from another deployment must not gate"
    )

    # same path under a different scheme spelling IS this table
    claiming = dict(entry, dataFilesPath="s3a://bucket/prod/events_out")
    memfs.put_bytes(
        mpath, json.dumps({"weird_key": claiming}).encode()
    )
    assert _list_commit_ts(root) == [], (
        "scheme-spelling variant of this table's path must gate"
    )


def test_reader_gates_fingerprint_dir_on_own_epoch_watermark(memfs):
    """The shared table watermark can run AHEAD of a fingerprint's own
    epoch (a co-tenant stream advancing past a crashed stream's
    part-filled folder): gating this dir on the shared value alone
    would make the junk folder reader-visible before the crashed
    stream replays and cleans it.  The reader takes the LOWER of the
    table watermark and this fingerprint's epoch watermark; manifests
    without the field (reference-produced) gate as before."""
    from guidewire_spark.streaming.cda_source import _list_commit_ts

    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1])]))], 0)
    # crash mid-fill of batch 1: part-filled folder, marker never PUT
    memfs.put_bytes(
        f"{SINK_ROOT}/{SINK_T0 + 1}/part-00000.parquet",
        _parquet_bytes(["junk"], [0]),
    )
    # co-tenant bumps the SHARED watermark past the crashed ts
    mpath = "memory://bucket/cda/events_out/manifest.json"
    marker = json.loads(memfs.open(mpath).read())
    marker["events_out"]["lastSuccessfulWriteTimestamp"] = str(SINK_T0 + 5)
    memfs.put_bytes(mpath, json.dumps(marker).encode())

    # under shared-only gating the junk at T0+1 would be visible;
    # fpX's own epoch watermark (T0) hides it
    assert _list_commit_ts(SINK_ROOT) == [SINK_T0]

    # a malformed epoch value on the REMOTE arm is a corrupt gate —
    # silently widening to the shared watermark would expose exactly
    # the junk folder the field exists to hide, so the listing fails
    # loudly instead
    marker["events_out"]["epochWatermarks"]["fpX"] = "not-a-ts"
    memfs.put_bytes(mpath, json.dumps(marker).encode())
    with pytest.raises(ValueError, match="unparseable"):
        _list_commit_ts(SINK_ROOT)

    # an epoch entry for a DIFFERENT fingerprint is irrelevant here
    marker["events_out"]["epochWatermarks"] = {"fpOther": "not-a-ts"}
    memfs.put_bytes(mpath, json.dumps(marker).encode())
    assert _list_commit_ts(SINK_ROOT) == [SINK_T0, SINK_T0 + 1]

    # reference-style manifest (no epochWatermarks): shared gate
    del marker["events_out"]["epochWatermarks"]
    memfs.put_bytes(mpath, json.dumps(marker).encode())
    assert _list_commit_ts(SINK_ROOT) == [SINK_T0, SINK_T0 + 1]


def test_cda_sink_corrupt_manifest_fails_loud(memfs):
    """A marker manifest that EXISTS but cannot be parsed must fail
    both halves of the protocol loudly: the writer cannot merge state
    it cannot read (proceeding would take the init path, whose
    staleness-clean PUT replaces the manifest — audit count, schema
    epochs, and co-tenant entries wiped), and the remote reader's
    visibility gate IS the marker, so listing ungated past a corrupt
    one could expose in-flight publishes."""
    from guidewire_spark.streaming.cda_source import _list_commit_ts

    mpath = "memory://bucket/cda/events_out/manifest.json"
    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1])]))], 0)

    memfs.put_bytes(mpath, b"{not json")
    msg = w.write(iter([_arrow_batch([2])]))
    with pytest.raises(ValueError, match="not valid JSON"):
        w.commit([msg], 1)
    with pytest.raises(ValueError, match="cannot be parsed"):
        _list_commit_ts(SINK_ROOT)
    assert memfs.open(mpath).read() == b"{not json"  # untouched

    # valid JSON but not a table->entry object: same refusal, both halves
    memfs.put_bytes(mpath, b"[1, 2]")
    with pytest.raises(ValueError, match="not an object"):
        w.commit([w.write(iter([_arrow_batch([2])]))], 1)
    with pytest.raises(ValueError, match="gate cannot be read"):
        _list_commit_ts(SINK_ROOT)


def test_sink_marker_entry_corruption_fails_loud_on_remote(memfs):
    """Entry-LEVEL corruption is the same class as an unparseable
    document: a non-object entry, a missing/unparseable watermark, or
    a non-map epochWatermarks under this table's key leaves the gate
    unreadable, and the remote arm must fail the listing loudly — the
    old broad except returned None, silently listing the tree UNGATED
    (in-flight publishes exposed)."""
    from guidewire_spark.streaming.cda_source import _list_commit_ts

    mpath = "memory://bucket/cda/events_out/manifest.json"
    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1])]))], 0)
    # in-flight folder beyond the marker: must never become visible
    memfs.put_bytes(
        f"{SINK_ROOT}/{SINK_T0 + 9}/part-00000.parquet",
        _parquet_bytes(["junk"], [0]),
    )
    good = json.loads(memfs.open(mpath).read())

    for breakage in (
        lambda m: m.__setitem__("events_out", 5),
        lambda m: m["events_out"].pop("lastSuccessfulWriteTimestamp"),
        lambda m: m["events_out"].__setitem__(
            "lastSuccessfulWriteTimestamp", "not-a-ts"
        ),
        # JSON true int()s to 1 — it must read as corrupt, not as a
        # gate at ts 1 silently hiding every committed folder
        lambda m: m["events_out"].__setitem__(
            "lastSuccessfulWriteTimestamp", True
        ),
        lambda m: m["events_out"].__setitem__("epochWatermarks", "garbage"),
        lambda m: m["events_out"]["epochWatermarks"].__setitem__("fpX", True),
    ):
        broken = json.loads(json.dumps(good))
        breakage(broken)
        memfs.put_bytes(mpath, json.dumps(broken).encode())
        with pytest.raises(ValueError, match="gate cannot be read"):
            _list_commit_ts(SINK_ROOT)

    # writer half: unparseable watermark / non-map fields refuse too
    broken = json.loads(json.dumps(good))
    broken["events_out"]["lastSuccessfulWriteTimestamp"] = "not-a-ts"
    memfs.put_bytes(mpath, json.dumps(broken).encode())
    with pytest.raises(ValueError, match="unparseable lastSuccessful"):
        w.commit([w.write(iter([_arrow_batch([2])]))], 1)
    broken = json.loads(json.dumps(good))
    broken["events_out"]["schemaHistory"] = "garbage"
    memfs.put_bytes(mpath, json.dumps(broken).encode())
    with pytest.raises(ValueError, match="non-map schemaHistory"):
        w.commit([w.write(iter([_arrow_batch([2])]))], 1)

    # restore the good marker: everything lists/commits again
    memfs.put_bytes(mpath, json.dumps(good).encode())
    assert _list_commit_ts(SINK_ROOT) == [SINK_T0]


def test_sink_replay_refuses_corrupt_own_epoch_watermark(memfs):
    """On a ts<=last replay, an unparseable OWN epoch value must not
    fall back to the folder-existence heuristic (which can silently
    accept a co-tenant-exposed part-filled folder as committed) — the
    replay decision's gate is unreadable, so the commit fails loudly."""
    mpath = "memory://bucket/cda/events_out/manifest.json"
    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1])]))], 0)
    marker = json.loads(memfs.open(mpath).read())
    marker["events_out"]["epochWatermarks"]["fpX"] = "not-a-ts"
    memfs.put_bytes(mpath, json.dumps(marker).encode())
    msg = w.write(iter([_arrow_batch([1])]))
    with pytest.raises(ValueError, match="unparseable"):
        w.commit([msg], 0)  # replay of batch 0 (ts <= last)
    # staging was NOT silently dropped as an already-committed no-op;
    # the committed folder is untouched
    assert memfs.exists(f"{SINK_ROOT}/{SINK_T0}")


def test_sink_key_matched_foreign_manifest_refused_on_remote(memfs):
    """A manifest whose entry sits under THIS table's key but claims a
    different deployment's path (a copied manifest standing where the
    marker should be) must not be adopted by key alone: the reader
    fails the listing loudly (its watermark would hide this table's
    committed folders) and the writer refuses to merge into foreign
    state.  Same-port rules: an explicit-port mismatch on one host is
    foreign; a default-port spelling difference is not."""
    from guidewire_spark.streaming.cda_source import (
        _entry_claims_table,
        _list_commit_ts,
    )

    mpath = "memory://bucket/cda/events_out/manifest.json"
    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1])]))], 0)
    foreign = {
        "events_out": {
            "lastSuccessfulWriteTimestamp": "0",
            "totalProcessedRecordsCount": 1,
            "dataFilesPath": "memory://bucket/archive/events_out",
            "schemaHistory": {},
        }
    }
    memfs.put_bytes(mpath, json.dumps(foreign).encode())
    with pytest.raises(ValueError, match="different deployment"):
        _list_commit_ts(SINK_ROOT)
    with pytest.raises(ValueError, match="does not claim"):
        w.commit([w.write(iter([_arrow_batch([2])]))], 1)

    # port semantics of the claim check itself
    entry = {"dataFilesPath": "hdfs://nn:9000/cda/events_out"}
    assert not _entry_claims_table(
        entry, "hdfs://nn:9002/cda/events_out", "events_out"
    ), "explicit-port mismatch is a different service, hence foreign"
    assert _entry_claims_table(
        entry, "hdfs://nn/cda/events_out", "events_out"
    ), "default-port spelling tolerance"
    assert _entry_claims_table(
        entry, "hdfs://nn:9000/cda/events_out", "events_out"
    )


def test_sink_publish_migrates_adopted_nonstandard_key(memfs):
    """When the single-entry fallback adopts a claiming entry under a
    nonstandard key, the next publish re-keys it under the table's
    canonical name IN THE SAME atomic PUT — leaving the old key behind
    would freeze a duplicate entry whose stale watermark could gate an
    old-key consumer forever."""
    from guidewire_spark.streaming.cda_source import _list_commit_ts

    mpath = "memory://bucket/cda/events_out/manifest.json"
    adopted = {
        "weird_key": {
            "lastSuccessfulWriteTimestamp": str(SINK_T0 - 1),
            "totalProcessedRecordsCount": 7,
            "dataFilesPath": "memory://bucket/cda/events_out",
            "schemaHistory": {"fpX": str(SINK_T0 - 1)},
            "epochWatermarks": {"fpX": str(SINK_T0 - 1)},
        }
    }
    memfs.put_bytes(mpath, json.dumps(adopted).encode())
    w = _sink_writer(SINK_ROOT, SINK_T0)
    w.commit([w.write(iter([_arrow_batch([1, 2])]))], 0)
    out = json.loads(memfs.open(mpath).read())
    assert set(out) == {"events_out"}, "old key migrated, not duplicated"
    e = out["events_out"]
    assert e["lastSuccessfulWriteTimestamp"] == str(SINK_T0)
    assert e["totalProcessedRecordsCount"] == 9  # 7 carried + 2 new
    assert e["schemaHistory"]["fpX"] == str(SINK_T0 - 1)  # epoch carried
    assert _list_commit_ts(SINK_ROOT) == [SINK_T0]

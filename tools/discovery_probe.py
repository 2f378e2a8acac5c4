"""Marker-protocol discovery-cost probe (r10 verdict item 5).

``gw_cda_stream``'s per-microbatch discovery is ``latestOffset`` (one
directory listing of the fingerprint dir + one marker-manifest GET via
``_sink_marker_ts``) and ``partitions(start, end)`` (the same gated
listing + a parquet listing of only the NEW folders in (start, end]).
The reference's equivalent is one delimiter LIST + one manifest read
per poll (``S3Access.scala:26-33``, ``Guidewire.scala:133-137``).

On a real object store the poll cost that scales is API ROUNDTRIPS
(a delimiter LIST is one paginated call — flat to 1000 keys/page —
each dominated by network latency), so that is what this probe
asserts: it builds synthetic marker-gated commit trees of 50 / 200 /
500 commits on the in-memory fsspec backend (tests/fake_fsspec, the
same module the driver-gated object-store queries run on) behind a
CALL-COUNTING proxy, and requires the per-poll call profile to be
IDENTICAL across commit counts — O(1) roundtrips per poll, commits
notwithstanding.  A regression that sneaks a per-commit GET /
per-commit parquet listing into the poll path (the way discovery
costs actually blow up at 100 TB: 10k commits x 1 GET each per poll)
fails this tool by number.

Wall time per poll is reported as informational only: the fake
backend's ``ls`` scans its whole object dict (O(store size)), so
in-process wall time grows with tree size BY CONSTRUCTION of the
fake, not of the protocol — on S3 those same polls are the same
single LIST call.

Usage: python tools/discovery_probe.py   (prints one JSON line per
tree size plus a markdown table; SCALING.md rows are written by the
session, not this tool).
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

COMMITS = [50, 200, 500]
POLLS = 200


def _build_tree(fs, n_commits: int) -> str:
    """A marker-gated sink-layout tree with n_commits committed digit
    folders, one 1-row parquet object each, marker covering all."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = 1700000000000
    root = f"memory://bkt/cda/tbl{n_commits}/fp"
    buf = io.BytesIO()
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), buf)
    data = buf.getvalue()
    for i in range(n_commits):
        fs.put_bytes(f"{root}/{t0 + i}/part-00000.parquet", data)
    manifest = {
        f"tbl{n_commits}": {
            "lastSuccessfulWriteTimestamp": str(t0 + n_commits - 1),
            "totalProcessedRecordsCount": n_commits,
            "dataFilesPath": f"memory://bkt/cda/tbl{n_commits}",
            "schemaHistory": {"fp": str(t0)},
        }
    }
    fs.put_bytes(
        f"memory://bkt/cda/tbl{n_commits}/manifest.json",
        json.dumps(manifest).encode(),
    )
    return root


def main() -> None:
    from tests.fake_fsspec import (
        CountingFS as _CountingFS,
        MemoryFS,
        make_fsspec_module,
    )

    fs = _CountingFS(MemoryFS())
    mod = make_fsspec_module(fs)
    sys.modules["fsspec"], sys.modules["fsspec.core"] = mod, mod.core

    from guidewire_spark.streaming.cda_source import _CdaStreamReader

    rows = []
    for n in COMMITS:
        root = _build_tree(fs, n)
        rdr = _CdaStreamReader(root, ["id"])
        last = rdr.latestOffset()
        assert last["ts"] == 1700000000000 + n - 1, last

        # roundtrip profile of ONE poll + ONE one-new-batch planning
        fs.reset()
        rdr.latestOffset()
        poll_calls = fs.reset()
        start = {"ts": last["ts"] - 1}
        parts = rdr.partitions(start, last)
        plan_calls = fs.reset()
        assert len(parts) == 1, parts  # exactly the one new folder's file

        # wall time (informational: fake-backend ls is O(store size))
        best_poll = math.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(POLLS):
                rdr.latestOffset()
            best_poll = min(best_poll, (time.perf_counter() - t0) / POLLS)
        fs.reset()

        rec = {
            "commits": n,
            "poll_calls": dict(sorted(poll_calls.items())),
            "plan_calls": dict(sorted(plan_calls.items())),
            "latest_offset_ms_fakefs": round(best_poll * 1e3, 4),
        }
        rows.append(rec)
        print(json.dumps(rec))

    print("\n| commits | poll roundtrips | plan-1-batch roundtrips |")
    print("|---|---|---|")
    for r in rows:
        print(
            f"| {r['commits']} | {sum(r['poll_calls'].values())} "
            f"({r['poll_calls']}) | {sum(r['plan_calls'].values())} "
            f"({r['plan_calls']}) |"
        )
    base = rows[0]
    flat = all(
        r["poll_calls"] == base["poll_calls"]
        and r["plan_calls"] == base["plan_calls"]
        for r in rows
    )
    if not flat:
        print("\nFAIL: discovery roundtrips grow with commit count")
        raise SystemExit(1)
    print(
        f"\nPASS: per-microbatch discovery is O(1) roundtrips "
        f"({sum(base['poll_calls'].values())} per poll, "
        f"{sum(base['plan_calls'].values())} per one-batch plan) at "
        f"{COMMITS[0]}..{COMMITS[-1]} commits — alpha = 0 in commit "
        "count; the reference's one-LIST-plus-one-manifest-read shape"
    )


if __name__ == "__main__":
    main()

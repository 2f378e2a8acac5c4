"""Generate a LOCAL sf1-class scaling fixture from the driver's sf0.1
tables (VERDICT r11 item 2: the 8-vs-32-core scaling block reads ~1
everywhere at sf0.1 because every query is fixed-overhead-bound; a
~10x table set makes compute dominate so core-ratio scaling becomes
measurable).

NOT driver data and NOT for correctness: the output lives under an
ephemeral directory, is derived deterministically from the read-only
sf0.1 tables (seeded by the copy index only, no RNG), and is used
ONLY by tools/core_scaling_probe.py to measure low/high-core wall
ratios.  No query result from this dir is ever compared to an oracle
or cached anywhere.

Scaling rules (copy 0 is the original rows, untouched):
- fact tables (orders/lineitem/events/customer): key columns offset
  by copy * stride so join fan-ins grow realistically (10x customers,
  10x orders, same dims)
- documents: word-stride permutation per copy (stride coprime to the
  word count) — keeps each doc's word MULTISET (vocab/BPE stats scale
  naturally) but destroys word ORDER, so cross-copy shingle Jaccard
  is low and near-dup pair counts scale like a real corpus instead of
  exploding quadratically on 10 identical copies
- embeddings: elements rolled by copy (norm preserved, neighborhood
  structure decorrelated across copies)
- dims (region/nation/supplier/part): copied as-is

Each table is written as a name.parquet DIRECTORY of one part file
per (copy, chunk) so scans open with real split parallelism.

Usage: python tools/gen_scale_probe.py [out_dir] [copies]
"""
from __future__ import annotations

import math
import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe1")
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
CHUNKS = 4  # part files per copy -> copies*CHUNKS splits per table

STRIDE = 100_000_000  # key offset per copy, far above any sf0.1 key


def write_parts(name: str, tables: list[pa.Table]) -> None:
    d = OUT / f"{name}.parquet"
    d.mkdir(parents=True, exist_ok=True)
    part = 0
    for t in tables:
        n = t.num_rows
        step = math.ceil(n / CHUNKS)
        for lo in range(0, n, step):
            pq.write_table(
                t.slice(lo, step), d / f"part-{part:05d}.parquet"
            )
            part += 1


def offset(t: pa.Table, cols: list[str], copy: int) -> pa.Table:
    for c in cols:
        if c in t.schema.names:
            idx = t.schema.get_field_index(c)
            t = t.set_column(
                idx,
                t.schema.field(idx),
                pc.add(t.column(c), copy * STRIDE),
            )
    return t


def permute_words(text: str, copy: int) -> str:
    words = text.split()
    n = len(words)
    if n < 2:
        return text + f" c{copy}"
    s = 2 * copy + 3
    while math.gcd(s, n) != 1:
        s += 2
    return " ".join(words[(i * s) % n] for i in range(n))


def main() -> None:
    if OUT.exists():
        shutil.rmtree(OUT)
    OUT.mkdir(parents=True)

    for name in ("region", "nation", "supplier", "part"):
        shutil.copy(SRC / f"{name}.parquet", OUT / f"{name}.parquet")
        print(f"{name}: copied dim")

    for name, keys in (
        ("customer", ["c_custkey"]),
        ("orders", ["o_orderkey", "o_custkey"]),
        ("lineitem", ["l_orderkey"]),
        ("events", ["event_id", "user_id"]),
    ):
        base = pq.read_table(SRC / f"{name}.parquet")
        parts = []
        for copy in range(COPIES):
            t = offset(base, keys, copy)
            if name == "events" and copy:
                idx = t.schema.get_field_index("ts")
                t = t.set_column(
                    idx,
                    t.schema.field(idx),
                    pc.add(t.column("ts"), pa.scalar(copy, pa.duration("us"))),
                )
            parts.append(t)
        write_parts(name, parts)
        print(f"{name}: {base.num_rows} -> {base.num_rows * COPIES}")

    base = pq.read_table(SRC / "documents.parquet")
    texts = base.column("text").to_pylist()
    parts = []
    for copy in range(COPIES):
        t = offset(base, ["doc_id"], copy)
        if copy:
            new_texts = [permute_words(x, copy) for x in texts]
            ti = t.schema.get_field_index("text")
            t = t.set_column(
                ti, t.schema.field(ti), pa.array(new_texts, pa.string())
            )
            ni = t.schema.get_field_index("n_chars")
            t = t.set_column(
                ni,
                t.schema.field(ni),
                pa.array([len(x) for x in new_texts], pa.int64()),
            )
        parts.append(t)
    write_parts("documents", parts)
    print(f"documents: {base.num_rows} -> {base.num_rows * COPIES}")

    base = pq.read_table(SRC / "embeddings.parquet")
    emb = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    parts = []
    for copy in range(COPIES):
        t = offset(base, ["vec_id"], copy)
        if copy:
            rolled = np.roll(emb, copy, axis=1)
            ei = t.schema.get_field_index("embedding")
            t = t.set_column(
                ei,
                t.schema.field(ei),
                pa.array(rolled.tolist(), pa.list_(pa.float32())),
            )
        parts.append(t)
    write_parts("embeddings", parts)
    print(f"embeddings: {base.num_rows} -> {base.num_rows * COPIES}")
    total = sum(f.stat().st_size for f in OUT.rglob("*.parquet"))
    print(f"wrote {OUT} ({total / 1e6:.0f} MB)")


if __name__ == "__main__":
    main()

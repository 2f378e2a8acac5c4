"""Deletion vectors — merge-on-read DELETE over the public Delta
protocol's ``add.deletionVector`` descriptor.

Copy-on-write DELETE (``writer.delete_from``) rewrites every file that
contains a match; at 100 TB a GDPR-style erasure touching one row per
file rewrites the whole table.  Merge-on-read instead records WHICH
ROW INDEXES are dead in a per-file deletion vector carried on the
``add`` action, and the read path subtracts them — a metadata-sized
commit regardless of table size, the same trade Delta Lake ships as
deletion vectors (public PROTOCOL.md, "Deletion Vectors"; reader
applies the DV, OPTIMIZE / REORG APPLY (PURGE) folds it back into a
physical rewrite).

Descriptor shape follows the protocol's inline channel::

    {"storageType": "i", "pathOrInlineDv": "<base85 payload>",
     "sizeInBytes": <len(payload bytes)>, "cardinality": <n rows>}

Documented deviation (same stance as the rest of this log emitter,
which this engine both writes and reads): the payload is a
delta-varint encoding of the sorted row-index set rather than the
RoaringBitmapArray byte format — equivalent information, simpler and
deterministic.  Sequential index runs (the common shape: a predicate
deletes a contiguous id range clustered by the writer) encode in ~1
byte per row; random indexes in ~2-5 bytes per row.

Scale design of the READ side: deleted (file, row_index) pairs join
against the scan on Spark's parquet ``_metadata.row_index`` /
``_metadata.file_path`` columns (JVM-generated, no Python), as a
BROADCAST anti-join — a deletion vector is by construction small
relative to the data (else copy-on-write wins and ``delete_from`` is
the right tool), so the broadcast is bounded by deleted-row count,
never table size.
"""

from __future__ import annotations

import base64
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Columns the DV machinery appends to a scan; stripped before results
# leave the read path.
META_FILE = "__dv_file"
META_ROW = "__dv_row"

_STORAGE_INLINE = "i"


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varints(data: bytes):
    n = 0
    shift = 0
    for b in data:
        n |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
        else:
            yield n
            n = 0
            shift = 0
    if shift:
        raise ValueError("truncated deletion-vector payload")


def encode_dv(indexes) -> dict:
    """Sorted-unique row indexes → inline descriptor (delta-varint +
    base85).  Rejects negatives — parquet row indexes are 0-based."""
    idx = sorted(set(int(i) for i in indexes))
    if idx and idx[0] < 0:
        raise ValueError(f"negative row index {idx[0]} in deletion vector")
    payload = bytearray()
    prev = -1
    for i in idx:
        payload += _varint(i - prev - 1)  # gap-1: dense runs → 0x00 bytes
        prev = i
    raw = bytes(payload)
    return {
        "storageType": _STORAGE_INLINE,
        "pathOrInlineDv": base64.b85encode(raw).decode("ascii"),
        "sizeInBytes": len(raw),
        "cardinality": len(idx),
    }


def decode_dv(descriptor: dict) -> list[int]:
    """Inline descriptor → sorted row-index list (inverse of
    :func:`encode_dv`)."""
    if descriptor.get("storageType") != _STORAGE_INLINE:
        raise ValueError(
            f"unsupported deletion-vector storageType "
            f"{descriptor.get('storageType')!r} (this engine writes inline)"
        )
    raw = base64.b85decode(descriptor["pathOrInlineDv"])
    out = []
    prev = -1
    for gap in _read_varints(raw):
        prev = prev + gap + 1
        out.append(prev)
    if len(out) != descriptor.get("cardinality", len(out)):
        raise ValueError(
            f"deletion vector cardinality mismatch: payload has {len(out)}, "
            f"descriptor says {descriptor.get('cardinality')}"
        )
    return out


def merge_dv(existing: dict | None, new_indexes) -> dict:
    """Union an existing descriptor (or None) with newly deleted row
    indexes — successive MOR deletes on one file accumulate into ONE
    descriptor (the protocol allows at most one DV per live add)."""
    idx = set(new_indexes)
    if existing is not None:
        idx.update(decode_dv(existing))
    return encode_dv(idx)


def scan_with_row_index(
    spark: SparkSession, schema: T.StructType | None, paths: list[str]
) -> DataFrame:
    """Parquet scan carrying (file path, row index) — Spark's
    ``_metadata`` struct, generated JVM-side during the scan (no
    Python, no window).  The file key is the scheme-stripped absolute
    path (``file:///a/b`` → ``/a/b``): base names are NOT unique
    across hive partition directories (one write job reuses its UUID
    in every partition's part file), so only the full path
    disambiguates."""
    from guidewire_spark.sources.snapshot import physical_name

    reader = spark.read
    if schema is not None:
        phys = T.StructType(
            [
                T.StructField(physical_name(f), f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
        reader = reader.schema(phys)
    df = reader.parquet(*paths).select(
        "*",
        F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ).alias(META_FILE),
        F.col("_metadata.row_index").alias(META_ROW),
    )
    if schema is not None:
        keep = [
            F.col(physical_name(f)).alias(f.name) for f in schema.fields
        ]
        df = df.select(*keep, META_FILE, META_ROW)
    return df


def normalize_path(path: str) -> str:
    """The DV join key for a log file path: absolute, scheme-stripped,
    and URI-percent-encoded EXACTLY the way Spark's
    ``_metadata.file_path`` renders it (java.net.URI path encoding:
    space and other non-URI-path bytes become %XX, while the
    sub-delims ``!$&'()*+,;=`` and ``:@~`` stay literal — verified
    empirically against the scan side, which
    :func:`scan_with_row_index` leaves in encoded form).  Without the
    matching encoding, a table path containing a space would KeyError
    on write and silently skip the anti-join on read."""
    import re
    from urllib.parse import quote

    bare = re.sub("^file:/+", "/", os.path.abspath(path))
    return quote(bare, safe="/!$&'()*+,;=:@~")


def deleted_rows_frame(
    spark: SparkSession, dvs: dict[str, dict]
) -> DataFrame:
    """``{file path: descriptor}`` → DataFrame of (normalized path,
    dead row index) pairs, the broadcast side of the anti-join.  Size
    is the total DV cardinality — bounded by deleted rows, not
    data."""
    rows = [
        (normalize_path(path), int(i))
        for path, d in dvs.items()
        for i in decode_dv(d)
    ]
    return spark.createDataFrame(
        rows, f"{META_FILE} string, {META_ROW} long"
    )


def apply_dv(
    df: DataFrame, spark: SparkSession, dvs: dict[str, dict]
) -> DataFrame:
    """Subtract dead rows from a :func:`scan_with_row_index` frame and
    strip the metadata columns.  Broadcast LEFT ANTI on
    (file base name, row index)."""
    if not dvs:
        return df.drop(META_FILE, META_ROW)
    dead = deleted_rows_frame(spark, dvs)
    return df.join(
        F.broadcast(dead), [META_FILE, META_ROW], "left_anti"
    ).drop(META_FILE, META_ROW)

"""Manifest parsing (reference parity: P1/P15).

The CDA ``manifest.json`` is the catalog: a JSON object mapping table
name → entry. Mirrors the reference data model
(``/root/reference/.../package.scala:10-19`` and manifest decoding at
``GuidewireUtils.scala:23-31``), re-expressed as a plain dataclass —
the manifest is tiny driver-side metadata, never a DataFrame.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from guidewire_spark.sources.fs import read_text


@dataclass(frozen=True)
class ManifestEntry:
    """One table's manifest record.

    Fields mirror ``package.scala:10-15``:
    lastSuccessfulWriteTimestamp, totalProcessedRecordsCount,
    dataFilesPath, schemaHistory (fingerprint → epoch-millis of that
    fingerprint's last commit).

    ``epoch_watermarks`` is this repo's sink extension (absent from
    the reference's model and from reference-produced manifests, where
    it stays empty): fingerprint → that stream's OWN last published
    ts, written by ``gw_cda_sink`` in the same atomic PUT as the table
    watermark.  Consumers gate each fingerprint dir at
    min(table watermark, its epoch watermark) when present — the
    shared table watermark can run ahead of a crashed stream's epoch,
    and gating on it alone would treat that stream's part-filled
    folder as committed.

    ``malformed_epoch_fingerprints`` records fingerprints whose epoch
    value was PRESENT but unparseable (``"*"`` = the whole field was
    present but not a map).  Reference fields stay readable either
    way, but consumers that would GATE on the corrupt value
    (``discover_batches``) refuse that fingerprint loudly instead of
    silently widening its gate to the shared watermark — the exact
    part-filled-folder exposure the field exists to prevent.
    Reference-produced manifests carry no field at all and are never
    marked.
    """

    last_successful_write_timestamp: int
    total_processed_records_count: int
    data_files_path: str
    schema_history: dict[str, int] = field(default_factory=dict)
    epoch_watermarks: dict[str, int] = field(default_factory=dict)
    malformed_epoch_fingerprints: frozenset[str] = frozenset()

    def epoch_gate_is_corrupt(self, fingerprint: str) -> bool:
        """True when this fingerprint's epoch watermark exists but
        cannot be read — its gate is undefined, not merely absent."""
        return (
            fingerprint in self.malformed_epoch_fingerprints
            or "*" in self.malformed_epoch_fingerprints
        )

    @property
    def normalized_data_files_path(self) -> str:
        """Trailing-slash normalization (``package.scala:16-18``)."""
        return self.data_files_path.rstrip("/")

    def fingerprints_in_order(self) -> list[str]:
        """Schema fingerprints ordered by their history timestamp
        (``Guidewire.scala:125``)."""
        return [
            fp
            for fp, _ in sorted(self.schema_history.items(), key=lambda kv: kv[1])
        ]


def parse_manifest(text: str) -> dict[str, ManifestEntry]:
    raw = json.loads(text)
    out: dict[str, ManifestEntry] = {}
    for table_name, entry in raw.items():
        wms, bad = _epoch_watermarks(entry)
        out[table_name] = ManifestEntry(
            last_successful_write_timestamp=_ts_int(
                entry["lastSuccessfulWriteTimestamp"]
            ),
            total_processed_records_count=int(
                entry.get("totalProcessedRecordsCount", 0)
            ),
            data_files_path=entry["dataFilesPath"],
            schema_history={
                fp: int(ts) for fp, ts in entry.get("schemaHistory", {}).items()
            },
            epoch_watermarks=wms,
            malformed_epoch_fingerprints=bad,
        )
    return out


def _epoch_watermarks(entry: dict) -> tuple[dict[str, int], frozenset[str]]:
    """Tolerant parse of the sink-extension field: a bad extension
    value must never make the manifest's REFERENCE fields unreadable,
    so nothing raises here.  Returns (parsed watermarks, fingerprints
    whose value was present but unparseable — ``"*"`` when the whole
    field is present but not a map); consumers that would GATE on a
    corrupt value refuse loudly at use time instead."""
    raw = entry.get("epochWatermarks")
    if raw is None:
        return {}, frozenset()
    if not isinstance(raw, dict):
        return {}, frozenset({"*"})
    out: dict[str, int] = {}
    bad: set[str] = set()
    for fp, ts in raw.items():
        try:
            out[fp] = _ts_int(ts)
        except (TypeError, ValueError):
            bad.add(fp)
    return out, frozenset(bad)


def _ts_int(v) -> int:
    """int() for timestamp fields that refuses JSON booleans: ``true``
    int()s to 1, silently gating every folder above ts 1 out of
    existence — a corrupt shape must read as corrupt, not as epoch 1."""
    if isinstance(v, bool):
        raise TypeError(f"boolean is not a timestamp: {v!r}")
    return int(v)


def read_manifest(uri: str) -> dict[str, ManifestEntry]:
    """GET + decode the manifest (``Guidewire.scala:54-61``)."""
    return parse_manifest(read_text(uri))

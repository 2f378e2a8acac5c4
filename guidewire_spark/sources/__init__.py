from guidewire_spark.sources.manifest import ManifestEntry, parse_manifest, read_manifest
from guidewire_spark.sources.deltalog import last_version, write_commit
from guidewire_spark.sources.snapshot import DeltaSnapshot, load_snapshot, read_delta
from guidewire_spark.sources.indexer import index

__all__ = [
    "ManifestEntry",
    "parse_manifest",
    "read_manifest",
    "last_version",
    "write_commit",
    "DeltaSnapshot",
    "load_snapshot",
    "read_delta",
    "index",
]

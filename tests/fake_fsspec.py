"""Minimal fsspec-compatible in-memory filesystem for testing the
REMOTE arm of ``guidewire_spark.sources.fs`` / ``schema`` / ``stats``
(reference parity: the S3-native listing at ``S3Access.scala:12-59``).

fsspec is not installed in this container, so tests install this
module into ``sys.modules['fsspec']`` (see the ``memfs`` fixture in
test_remote_fs.py).  The surface implemented is exactly what the repo
codes against — ``fsspec.core.url_to_fs(uri) -> (fs, path)`` plus
``fs.exists`` / ``fs.ls(detail=...)`` / ``fs.open('rb')`` — with the
same shapes the real library documents:

* ``url_to_fs('memory://a/b')`` returns paths WITH a leading slash;
* ``ls(detail=False)`` returns full child paths (delimiter listing,
  one level), directories without trailing slash;
* ``ls(detail=True)`` info dicts carry ``name``/``size``/``type`` and
  a backend-dependent modification-time key — this fake exposes
  ``mtime`` as FLOAT SECONDS by default (fsspec's documented
  convention, and the exact representation that previously corrupted
  ``add.modificationTime`` by a factor of 1000), with per-file
  overrides so tests can exercise the datetime (s3fs
  ``LastModified``) and already-millis variants too.

Known divergence from real backends, and the contract that makes it
safe: ``ls`` on a missing prefix returns ``[]`` here, while real
fsspec implementations RAISE FileNotFoundError.  Production code must
therefore either guard a listing with ``fs.exists`` (both
``sources.fs`` helpers do) or catch FileNotFoundError at the call
site (``_inflight_foreign_folders``, staging GC) — a new bare
``fs.ls`` caller would pass against this fake yet crash on s3fs.
"""

from __future__ import annotations

import io
import types
from urllib.parse import urlparse


class MemoryFS:
    """Dict-backed filesystem: path -> (bytes, mtime_value)."""

    def __init__(self) -> None:
        self.files: dict[str, tuple[bytes, object]] = {}

    @staticmethod
    def _norm(path: str) -> str:
        parsed = urlparse(path)
        p = (parsed.netloc + "/" + parsed.path.lstrip("/")) if parsed.scheme else path
        return "/" + p.strip("/")

    def put_bytes(self, path: str, data: bytes, mtime: object = 1680350543.25) -> None:
        self.files[self._norm(path)] = (data, mtime)

    def exists(self, path: str) -> bool:
        p = self._norm(path)
        return p in self.files or any(f.startswith(p + "/") for f in self.files)

    def ls(self, path: str, detail: bool = False):
        p = self._norm(path)
        children: dict[str, dict] = {}
        for f, (data, mtime) in sorted(self.files.items()):
            if not f.startswith(p + "/"):
                continue
            rest = f[len(p) + 1 :]
            head = rest.split("/", 1)[0]
            child = f"{p}/{head}"
            if "/" in rest:
                children.setdefault(
                    child, {"name": child, "size": 0, "type": "directory"}
                )
            else:
                children[child] = {
                    "name": child,
                    "size": len(data),
                    "type": "file",
                    "mtime": mtime,
                }
        out = list(children.values())
        return out if detail else [c["name"] for c in out]

    def rm(self, path: str, recursive: bool = False) -> None:
        """Object delete (AbstractFileSystem.rm).  Non-recursive on a
        'directory' (pure prefix — object stores have no real dirs)
        raises like the real thing unless ``recursive``."""
        p = self._norm(path)
        if p in self.files:
            del self.files[p]
            return
        under = [f for f in self.files if f.startswith(p + "/")]
        if not under:
            raise FileNotFoundError(path)
        if not recursive:
            raise IsADirectoryError(path)
        for f in under:
            del self.files[f]

    def mv(self, src: str, dst: str) -> None:
        """Server-side rename (AbstractFileSystem.mv): copy + delete —
        NOT atomic on real object stores, which is exactly why the
        sink's publish protocol is marker-last rather than rename."""
        s, d = self._norm(src), self._norm(dst)
        if s not in self.files:
            raise FileNotFoundError(src)
        self.files[d] = self.files[s]
        del self.files[s]

    def open(self, path: str, mode: str = "rb"):
        p = self._norm(path)
        if "r" in mode:
            if p not in self.files:
                raise FileNotFoundError(path)
            return io.BytesIO(self.files[p][0])
        fs = self

        class _Writer(io.BytesIO):
            def close(self) -> None:  # capture bytes on close
                fs.files[p] = (self.getvalue(), 1680350543.25)
                super().close()

        return _Writer()


class CasMemoryFS(MemoryFS):
    """MemoryFS plus the repo's documented conditional-PUT extension
    hook (``guidewire_spark.streaming.cda_source._put_manifest``):
    ``cas_put(path, data, expected)`` atomically writes ``data`` iff
    the object's current bytes equal ``expected`` (``None`` = object
    must not exist), returning False on precondition failure — the
    semantics of S3 PutObject If-Match / If-None-Match or a GCS
    generation precondition.  In-process the dict update IS atomic,
    making this the reference implementation the sink's true-CAS
    publish path is tested against."""

    def cas_put(self, path: str, data: bytes, expected) -> bool:
        p = self._norm(path)
        cur = self.files[p][0] if p in self.files else None
        if (expected is None) != (cur is None):
            return False
        if expected is not None and cur != expected:
            return False
        self.files[p] = (data, 1680350543.25)
        return True


class CountingFS:
    """MemoryFS proxy counting the fs API calls an operation issues —
    the roundtrip profile a real object store would bill per call.
    Shared by ``tools/discovery_probe.py`` and its CI twin
    (``tests/test_remote_fs.py``) so the two probes count the SAME
    call set: a new fs method counted in one but not the other would
    silently diverge their roundtrip profiles."""

    def __init__(self, inner: MemoryFS):
        self._inner = inner
        self.calls: dict[str, int] = {}

    def _count(self, op: str) -> None:
        self.calls[op] = self.calls.get(op, 0) + 1

    def reset(self) -> dict[str, int]:
        out, self.calls = self.calls, {}
        return out

    def exists(self, path):
        self._count("exists")
        return self._inner.exists(path)

    def ls(self, path, detail=False):
        self._count("ls")
        return self._inner.ls(path, detail=detail)

    def open(self, path, mode="rb"):
        self._count("open")
        return self._inner.open(path, mode)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def make_fsspec_module(fs: MemoryFS):
    """Build a module object usable as ``sys.modules['fsspec']`` whose
    ``core.url_to_fs`` resolves every URI to ``fs``."""
    mod = types.ModuleType("fsspec")
    core = types.ModuleType("fsspec.core")

    def url_to_fs(uri: str):
        parsed = urlparse(uri)
        joined = (parsed.netloc + "/" + parsed.path.lstrip("/")).strip("/")
        return fs, "/" + joined

    core.url_to_fs = url_to_fs
    mod.core = core
    mod.filesystem = lambda proto: fs
    return mod

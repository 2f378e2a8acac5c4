"""Ephemeral scratch-directory placement for checkpoints, temp Delta
stores and stream staging.

Every streaming/connector query in this engine materializes its
fixtures, checkpoints and sinks under a throwaway ``mkdtemp`` tree —
by contract ephemeral (never read across invocations; the
no-cross-run-caching rule).  Where that tree LIVES is pure I/O
placement, and it is load-bearing for measurement: Structured
Streaming's state store fsyncs every delta file it commits (per state
partition, per stateful operator, per micro-batch), and on this
sandbox's virtualized disk those fsyncs dominate micro-batch latency
— measured round-11 on stream_stream_interval_join: 51.9 s with
checkpoints on /tmp (disk) vs 18.6 s on /dev/shm, identical plan and
results (OPTIMIZATION_r11.md).  RAM-backed scratch measures the
computation instead of the scratch medium.

Production mapping: a real deployment points checkpoints at durable
storage (object store / NVMe) — set ``SPARK_GRAFT_SCRATCH_DIR`` to
opt into any location; the default prefers ``/dev/shm`` when present
and writable, else falls back to the system temp dir.  Durability
class is unchanged locally: /tmp and /dev/shm are both lost on
reboot, and every query creates a fresh tree per invocation.
"""

from __future__ import annotations

import os
import tempfile

__all__ = ["scratch_dir"]

_ENV = "SPARK_GRAFT_SCRATCH_DIR"
_SHM = "/dev/shm"


def _scratch_root() -> str | None:
    """Resolve the scratch root once per call (cheap), honoring the
    env override first, then RAM-backed shm, then the system default
    (returns None to mean 'tempfile's own default')."""
    env = os.environ.get(_ENV)
    if env:
        os.makedirs(env, exist_ok=True)
        return env
    if os.path.isdir(_SHM) and os.access(_SHM, os.W_OK):
        return _SHM
    return None


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` on the fastest ephemeral medium available
    (see module docstring). Drop-in for the query-fixture mkdtemp
    calls."""
    return tempfile.mkdtemp(prefix=prefix, dir=_scratch_root())

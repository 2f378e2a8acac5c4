"""Pinned-worktree A/B bench — the cross-round performance method.

The driver's BENCH_r*.json series has been ambient-load-flagged in
most rounds (it shares the machine with verification sweeps), so
round-over-round claims use THIS protocol instead: check out a BASE
commit into a throwaway worktree, then run `python bench.py`
ALTERNATING base/current (>= 2 runs each, cool-downs between runs,
every run's start gated on 1-minute load), and compare the SHARED
query set (suites grow across rounds; totals of different suites are
not comparable).

Usage: python tools/ab_bench.py <base-commit> [runs-per-side]
Prints per-run totals, the shared-subset totals, and per-query deltas
exceeding the noise band.  Exit code is always 0 — this is a
measurement, not a gate; the session reads the numbers into PERF.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
LOAD_GATE = 1.5  # do not start a run above this 1-min load
COOLDOWN_S = 90


def _wait_idle() -> float:
    while True:
        load = os.getloadavg()[0]
        if load <= LOAD_GATE:
            return load
        time.sleep(30)


def _run_bench(cwd: Path) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    base_commit = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    base_dir = Path(f"/tmp/ab_base_{base_commit[:10]}")
    if not base_dir.exists():
        subprocess.run(
            ["git", "worktree", "add", str(base_dir), base_commit],
            cwd=ROOT,
            check=True,
        )
    try:
        results: dict[str, list[dict]] = {"base": [], "current": []}
        for i in range(runs):
            # alternate base-first then current-first to cancel any
            # warm-machine drift
            order = (
                [("base", base_dir), ("current", ROOT)]
                if i % 2 == 0
                else [("current", ROOT), ("base", base_dir)]
            )
            for label, cwd in order:
                load = _wait_idle()
                r = _run_bench(cwd)
                results[label].append(r)
                print(
                    f"{label} run {i}: total {r['value']} s "
                    f"(start load {load:.2f})"
                )
                time.sleep(COOLDOWN_S)
        shared = set(results["base"][0]["queries"]) & set(
            results["current"][0]["queries"]
        )
        for label in ("base", "current"):
            subs = [
                round(sum(r["queries"][q] for q in shared), 3)
                for r in results[label]
            ]
            print(f"{label} shared-{len(shared)} totals: {subs}")
        b = {
            q: min(r["queries"][q] for r in results["base"]) for q in shared
        }
        c = {
            q: min(r["queries"][q] for r in results["current"])
            for q in shared
        }
        print("per-query deltas beyond ±15%:")
        for q in sorted(shared, key=lambda q: c[q] - b[q]):
            if b[q] > 0.15 and abs(c[q] - b[q]) / b[q] > 0.15:
                print(f"  {q}: {b[q]} -> {c[q]}")
    finally:
        subprocess.run(
            ["git", "worktree", "remove", str(base_dir), "--force"],
            cwd=ROOT,
            check=False,
        )


if __name__ == "__main__":
    main()

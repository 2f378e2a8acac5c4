"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from guidewire_spark.plans.session import get_spark
from guidewire_spark.registry import all_queries

HEADLINE = [
    "agg_pricing_summary",
    "join_inner_fact_dim",
    "join_left_semi",
    "agg_count_distinct",
    "agg_rollup",
    "window_topk_per_group",
    "window_running_sum",
    "stream_tumbling_window",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
    "text_fingerprint",
    "cda_index_roundtrip",
    "sql_q3_shipping_priority",
    "text_tfidf_topk",
    "delta_partitioned_scan",
    # Heavy r7/r8 families promoted (round-9): the three most expensive
    # non-headline queries per SCALING.md, so the driver's BENCH series
    # guards their plans — a regression in the shingle index, the
    # persisted overlap diamond, or the IVF probe join was previously
    # invisible to BENCH_r*.json.
    "dedup_substring_trim",
    "mix_source_overlap_matrix",
    "similarity_ann_ivf_fullprobe",
    # Round-10: the chained-JVM-fold family's heaviest query (8 BPE
    # merge folds over every word of the corpus).  Its single-core
    # fold shape was the round-9 hidden cost (14.2 s at sf0.1 until
    # the guarded fan-out); with it in the headline list a regression
    # of that class is visible in the BENCH series, not only in
    # SCALING.md probes.
    "vocab_bpe_encode_corpus",
]


def _ambient_load() -> dict:
    """1-min load average + running-process count: the round-4 bench
    ran concurrently with full-registry verification sweeps (load 2-4)
    and drifted +6.5% uniformly, polluting the round-over-round
    series.  Recording the ambient load with every run lets a reader
    separate code regressions from machine noise; runs with load >~1
    are additionally flagged ``ambient_load_high``."""
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = -1.0
    try:
        n_running = sum(
            1
            for pid in os.listdir("/proc")
            if pid.isdigit()
            and pid != str(os.getpid())
            and _proc_state(pid) in ("R", "D")
        )
    except OSError:
        n_running = -1
    return {"load_1min": round(load1, 2), "procs_running": n_running}


def _proc_state(pid: str) -> str:
    try:
        with open(f"/proc/{pid}/stat") as fh:
            return fh.read().split(") ", 1)[1].split(" ", 1)[0]
    except (OSError, IndexError):
        return "?"


def main() -> None:
    # Sample ambient load FIRST — before the Spark JVM spins up, this
    # reading reflects only OTHER processes competing for the cores
    # (once warm-up starts, the bench's own 32 executor threads
    # dominate the 1-min average and the reading means nothing).
    load_before = _ambient_load()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="guidewire-spark-bench")
    specs = all_queries()

    # Warm-up: run every headline query once at the smallest scale
    # factor. Plans are scale-independent, so this compiles the same
    # whole-stage-codegen classes and JITs the same paths the timed
    # runs use — the bench then measures steady-state execution at
    # sf_dir rather than first-compile latency (which on a long-lived
    # cluster is paid once per query shape, not per run).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            specs[name].fn(spark, warm_dir).count()
        except Exception as exc:  # warm-up must never fail the bench
            print(f"# warmup {name} skipped: {exc}", file=sys.stderr)

    # n runs per query (min + median reported): this machine's totals
    # swing ±40% with background load (PERF.md), so a single sample
    # cannot distinguish a regression from noise. Min-of-n is the
    # steady-state number (closest to what a quiet cluster would see);
    # the median is kept alongside to expose variance.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    from guidewire_spark.operators.twophase import clear_two_phase_pins

    for _ in range(runs):
        for name in HEADLINE:
            spec = specs[name]
            clear_two_phase_pins()  # release the previous query's pins
            start = time.perf_counter()
            n = spec.fn(spark, sf_dir).count()
            samples[name].append(round(time.perf_counter() - start, 3))
        print(
            f"# run {_ + 1}/{runs}: "
            f"{round(sum(s[-1] for s in samples.values()), 3)}s",
            file=sys.stderr,
        )

    timings = {name: min(s) for name, s in samples.items()}
    medians = {
        name: sorted(s)[len(s) // 2] for name, s in samples.items()
    }
    for name in HEADLINE:
        print(
            f"# {name}: min {timings[name]}s median {medians[name]}s",
            file=sys.stderr,
        )
    total = round(sum(timings.values()), 3)
    # load_after will always be high (it includes this bench's own
    # executor threads); it's recorded for completeness but the
    # ambient flag keys on the PRE-Spark sample only.
    load_after = _ambient_load()
    ambient_high = load_before["load_1min"] > 1.0
    if ambient_high:
        print(
            "# WARNING: ambient load >1 during bench — timings include "
            "machine noise; re-run idle for a trustworthy series",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "runs": runs,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "load_before": load_before,
                "load_after": load_after,
                "ambient_load_high": ambient_high,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

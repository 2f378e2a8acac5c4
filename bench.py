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
]


def main() -> None:
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
    for _ in range(runs):
        for name in HEADLINE:
            spec = specs[name]
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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

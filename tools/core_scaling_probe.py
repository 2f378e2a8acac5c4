"""Low-vs-high core scaling probe over the sf1-class fixture
(tools/gen_scale_probe.py) — VERDICT r11 item 2.

For each core count, spawns ONE fresh subprocess (so local[N] and the
session conf are clean), warms every query once at sf0.001, then
times min-of-N runs per query against the probe dir.  The parent
prints per-query seconds per core count and the low->high wall
ratio (ideal = high/low cores; this sandbox sustains ~27x on 32
burn procs, so ratios up to ~3.3 for 8->32 are observable).

Usage: python tools/core_scaling_probe.py [--dir D] [--cores 8,32]
       [--runs 2] [query ...]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from guidewire_spark.plans.session import get_spark
from guidewire_spark.registry import all_queries
from guidewire_spark.operators.twophase import clear_two_phase_pins

names = {names!r}
probe_dir = {probe_dir!r}
runs = {runs}
spark = get_spark(app_name="core-scaling-probe")
specs = all_queries()
out = {{}}
for name in names:
    try:
        specs[name].fn(spark, "/root/testdata/sf0.001").count()
    except Exception as exc:
        print(f"# warm {{name}} failed: {{exc}}", file=sys.stderr)
    ts = []
    for _ in range(runs):
        clear_two_phase_pins()
        t0 = time.perf_counter()
        specs[name].fn(spark, probe_dir).count()
        ts.append(round(time.perf_counter() - t0, 3))
    out[name] = min(ts)
    print(f"# {{name}}: {{out[name]}}", file=sys.stderr, flush=True)
print(json.dumps(out))
spark.stop()
"""

DEFAULT = [
    # headline
    "agg_pricing_summary",
    "join_inner_fact_dim",
    "sql_q3_shipping_priority",
    "window_topk_per_group",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_substring_trim",
    "text_tfidf_topk",
    "similarity_topk_bruteforce",
    "vocab_bpe_encode_corpus",
    # fan-out-swept text/dedup operators (r11 sweep)
    "text_ngram_novelty",
    "contamination_ngram_overlap",
    "text_duplicated_ngram_fraction",
    "contamination_max_jaccard",
    "dedup_simhash",
    # grouped-map sizing (r12)
    "udaf_apply_in_pandas",
]


def main() -> None:
    args = sys.argv[1:]
    probe_dir, cores, runs, names = "/tmp/sfprobe1", [8, 32], 2, []
    i = 0
    while i < len(args):
        if args[i] == "--dir":
            probe_dir = args[i + 1]; i += 2
        elif args[i] == "--cores":
            cores = [int(c) for c in args[i + 1].split(",")]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    names = names or DEFAULT

    results: dict[int, dict[str, float]] = {}
    for n in cores:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
        print(f"=== cores={n} ===", flush=True)
        src = CHILD.format(
            root=str(ROOT), names=names, probe_dir=probe_dir, runs=runs
        )
        p = subprocess.run(
            [sys.executable, "-c", src], env=env, capture_output=True, text=True
        )
        for line in p.stderr.splitlines():
            if line.startswith("#"):
                print(line, flush=True)
        last = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not last:
            print(p.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"child at cores={n} produced no JSON")
        results[n] = json.loads(last[-1])

    lo, hi = min(cores), max(cores)
    print(f"\n| query | {lo}c s | {hi}c s | ratio {lo}->{hi} |")
    print("|---|---|---|---|")
    for name in names:
        a, b = results[lo].get(name), results[hi].get(name)
        if a and b:
            print(f"| {name} | {a} | {b} | {round(a / b, 2)} |")
    print(json.dumps({"dir": probe_dir, "runs": runs, "results": results}))


if __name__ == "__main__":
    main()

"""One-shot wall-clock timing of every registered query at
$SPARK_GRAFT_SF_DIR (default sf0.1) — the round-11 coverage sweep used
to rank non-headline operators for optimization (guide §1: measure
first).  One warm pass at sf0.001 compiles the codegen; the timed pass
runs each query once (this ranks, it does not certify — use bench.py
for min-of-n numbers).  Output: /tmp/time_all.json + slowest-first
summary."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from guidewire_spark.plans.session import get_spark
from guidewire_spark.registry import all_queries
from guidewire_spark.operators.twophase import clear_two_phase_pins

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="time-all")
specs = all_queries()
names = sorted(specs)

spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
warm_dir = "/root/testdata/sf0.001"
for name in names:
    try:
        specs[name].fn(spark, warm_dir).count()
    except Exception as exc:
        print(f"# warm {name}: {type(exc).__name__}", file=sys.stderr)
    clear_two_phase_pins()

out = {}
for name in names:
    clear_two_phase_pins()
    t0 = time.perf_counter()
    try:
        specs[name].fn(spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
    except Exception as exc:
        out[name] = None
        print(f"# FAIL {name}: {type(exc).__name__}: {exc}", file=sys.stderr)

Path("/tmp/time_all.json").write_text(json.dumps(out, indent=0))
good = {k: v for k, v in out.items() if v is not None}
print(f"timed {len(good)}/{len(names)}, total {sum(good.values()):.1f}s")
for k in sorted(good, key=good.get, reverse=True)[:40]:
    print(f"  {good[k]:7.3f}  {k}")
spark.stop()

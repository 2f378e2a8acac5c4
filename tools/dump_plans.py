"""Dump .explain('formatted') for headline queries to plans/r12/.

Usage: python tools/dump_plans.py [suffix] [query ...]
suffix: 'before' or 'after' (default 'before'); queries default to
the bench HEADLINE list.
"""
from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from guidewire_spark.plans.session import get_spark
from guidewire_spark.registry import all_queries
from bench import HEADLINE

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
names = sys.argv[2:] or HEADLINE
sf_dir = "/root/testdata/sf0.1"
out_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
out_dir.mkdir(parents=True, exist_ok=True)

spark = get_spark(app_name="plan-dump")
specs = all_queries()
from guidewire_spark.operators.twophase import clear_two_phase_pins

for name in names:
    clear_two_phase_pins()
    try:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt")
    except Exception as exc:
        print(f"FAILED {name}: {exc}")
spark.stop()

"""Repo-wide physical-plan anti-pattern sweep: build every registered
query's DataFrame, render its optimized plan, and flag the shapes that
do not survive scale:

- CartesianProduct — an unbounded all-pairs join
- BatchEvalPython — row-at-a-time Python in the plan (Arrow-batched
  ArrowEvalPython / FlatMapGroupsInPandas are fine)
- unpartitioned Window over a raw-row input — the whole dataset
  through one task (windows over bounded aggregates are exempt; the
  audit flags, the allowlist adjudicates with a reason)

tests/test_plans.py pins these properties for ~60 named queries; this
tool is the closing net over ALL of them, so a new query cannot ship
an accidental cartesian just because nobody wrote its lock.

Known-intended exceptions live in ALLOW with the reason inline — an
allowlisted hit is reported as "allowed", anything else as FLAG and
exit 1.

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from guidewire_spark.plans.session import get_spark
from guidewire_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"

# name -> (pattern, reason) triples that are deliberate.
ALLOW: dict[str, dict[str, str]] = {
    "udf_rowwise_python": {
        "BatchEvalPython": "the API-coverage query for row-at-a-time "
        "F.udf — deliberately the slow path, documented"
    },
}


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="plan-audit")
    from guidewire_spark.operators.twophase import clear_two_phase_pins

    flags: list[str] = []
    allowed = 0
    scanned = 0
    skipped: list[str] = []
    for name, spec in sorted(all_queries().items()):
        if only and name not in only:
            continue
        clear_two_phase_pins()
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # streaming entry points etc.
            skipped.append(f"{name}: {type(exc).__name__}")
            continue
        scanned += 1
        hits = []
        for pattern in ("CartesianProduct", "BatchEvalPython"):
            if pattern in plan:
                hits.append(pattern)
        # unpartitioned window: windowspecdefinition whose argument list
        # starts with the order spec (no partition columns before the
        # first ASC/DESC marker)
        for line in plan.splitlines():
            if "windowspecdefinition(" not in line:
                continue
            inner = line.split("windowspecdefinition(", 1)[1]
            first_arg = inner.split(",", 1)[0]
            if " ASC" in first_arg or " DESC" in first_arg:
                hits.append("GlobalWindow")
                break
        for h in set(hits):
            if ALLOW.get(name, {}).get(h):
                allowed += 1
                print(f"allow {name}: {h} ({ALLOW[name][h][:60]}...)")
            else:
                flags.append(f"{name}: {h}")
    for f in flags:
        print(f"FLAG  {f}")
    print(
        f"\n{scanned} plans scanned, {len(flags)} flagged, "
        f"{allowed} allowlisted, {len(skipped)} not plan-renderable "
        f"({', '.join(skipped[:5])}{'...' if len(skipped) > 5 else ''})"
    )
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()

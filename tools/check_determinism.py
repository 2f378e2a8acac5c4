"""Partition-layout determinism sweep — the replica-can't-see-it gate.

The driver's correctness harness runs these queries in ITS OWN Spark
session: different parallelism, different shuffle-partition count,
different scan splits. Any query whose result depends on partition
layout (a tie broken by whichever row a task saw first, an unordered
``first()``/``collect_list``, a LIMIT without a total order) can pass
the local oracle replica — where both runs share one layout — and
still hash-red on the driver. Round 6 proved the class exists
(agg_argminmax_family divergence was environment-sensitive).

This sweep runs every ORACLE-BACKED query twice in one session under
two deliberately different layouts:

  * run A — shuffle.partitions=32, maxPartitionBytes=128m (the
    replica's normal shape);
  * run B — shuffle.partitions=5, maxPartitionBytes=1m (many input
    splits, few shuffle partitions: reorders both scan-task and
    reduce-task row arrival).

and diffs the order-insensitive value hashes. A mismatch means the
query's OWN result is partition-sensitive — a driver red waiting to
happen regardless of what the oracle says. Rows-only queries are
skipped (several are legitimately layout-dependent samples; their
quality gates live in pytest).

Usage: python tools/check_determinism.py [query_name ...]
"""

from __future__ import annotations

import os
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from guidewire_spark.plans.session import get_spark
from guidewire_spark.registry import all_queries

sys.path.insert(0, str(Path(__file__).resolve().parent))
from check_oracles import SF_DIR, canon_frame, frame_hash  # noqa: E402

LAYOUTS = (
    {"spark.sql.shuffle.partitions": "32",
     "spark.sql.files.maxPartitionBytes": "134217728"},
    {"spark.sql.shuffle.partitions": "5",
     "spark.sql.files.maxPartitionBytes": "1048576"},
)


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="determinism-check")
    print(
        f"engines: pyspark={spark.version} python={sys.version.split()[0]} "
        f"sf_dir={SF_DIR}"
    )

    from guidewire_spark.operators.twophase import clear_two_phase_pins

    specs = all_queries()
    passed = failed = skipped = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        if spec.oracle is None:
            skipped += 1
            continue
        hashes = []
        err = None
        for layout in LAYOUTS:
            for key, val in layout.items():
                spark.conf.set(key, val)
            clear_two_phase_pins()
            # trained artifacts (BPE merges, IVF centroids) are
            # fingerprint-memoized; clear so BOTH layouts train from
            # scratch — otherwise layout B would replay layout A's
            # artifact and this gate couldn't see a layout-sensitive
            # training stage
            from guidewire_spark.plans.artifact_cache import clear

            clear()
            try:
                sdf = spec.fn(spark, SF_DIR)
                pdf = sdf.toPandas()
                hashes.append((frame_hash(canon_frame(pdf)), len(pdf)))
            except Exception:
                err = traceback.format_exc(limit=3)
                break
        for key, val in LAYOUTS[0].items():
            spark.conf.set(key, val)
        if err is not None:
            print(f"FAIL  {name}: ERROR under layout B\n{err}")
            failed += 1
        elif hashes[0] != hashes[1]:
            print(
                f"FAIL  {name}: layout-sensitive result "
                f"A={hashes[0]} B={hashes[1]}"
            )
            failed += 1
        else:
            print(f"PASS  {name}: stable across layouts ({hashes[0][1]} rows)")
            passed += 1
    print(f"\n{passed} stable, {failed} layout-sensitive, {skipped} rows-only skipped")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

"""Driver-session emulation gate: replay queries on a STOCK
SparkSession — plain ``SparkSession.builder`` defaults (200 shuffle
partitions, AQE on, none of plans/session.py's confs), a fresh
process — and compare against the DuckDB oracle under the driver's
pandas canon.

This is the closest local approximation of the grading driver's
environment, and the axis the other gates don't cover: the oracle
sweep runs on the repo's tuned session; the determinism sweep varies
layout but inside that same session.  A query that silently relies on
a factory conf (the round-7 stream_cda_sink_roundtrip class:
``spark.sql.python.filterPushdown.enabled``) passes both and still
errors on the driver — it fails HERE.

Usage: python tools/check_vanilla_session.py [query ...]
       (default: the computed 50-query driver window)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession  # noqa: E402

from check_oracles import SF_DIR, TABLES, canon_frame, frame_hash  # noqa: E402


def main() -> None:
    only = list(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("vanilla-session-check")
        .getOrCreate()
    )
    print(
        f"engines: pyspark={spark.version} session=STOCK "
        f"(shuffle.partitions="
        f"{spark.conf.get('spark.sql.shuffle.partitions')}) sf_dir={SF_DIR}"
    )
    from guidewire_spark.operators.twophase import clear_two_phase_pins
    from guidewire_spark.registry import driver_window_order

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    specs = driver_window_order()
    names = only or list(specs)[:50]
    passed = failed = rows_only = 0
    for name in names:
        spec = specs[name]
        clear_two_phase_pins()
        try:
            pdf = spec.fn(spark, SF_DIR).toPandas()
            if spec.oracle is None:
                canon_frame(pdf)
                print(f"rows  {name}: {len(pdf)}")
                rows_only += 1
                continue
            opdf = con.execute(spec.oracle).df()
            ok = (
                len(pdf) == len(opdf)
                and sorted(pdf.columns) == sorted(opdf.columns)
                and frame_hash(canon_frame(pdf)) == frame_hash(canon_frame(opdf))
            )
            print(("PASS" if ok else "FAIL") + f"  {name}: {len(pdf)} rows")
            passed += ok
            failed += not ok
        except Exception as exc:
            print(f"FAIL  {name}: {type(exc).__name__} {str(exc)[:200]}")
            failed += 1
    print(f"\n{passed} passed, {failed} failed, {rows_only} rows-only")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

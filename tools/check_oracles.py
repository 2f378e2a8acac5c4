"""Local replica of the driver's correctness gate: run every
registered query at sf0.01 via Spark AND its DuckDB oracle, compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import traceback
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from guidewire_spark.plans.session import get_spark
from guidewire_spark.registry import all_queries

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(value):
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return str(value).lower()
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        # Full round-trip repr: the driver's comparison distinguishes 1.0
        # from 1, so %.6g-style truncation here masked real divergences
        # (round-1 func_math_family).  Queries are responsible for rounding
        # / casting BOTH sides identically; normalization must not forgive.
        return repr(value)
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(normalize(v) for v in value) + "]"
    return str(value)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(normalize(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    # Engine versions in the sweep output (round-6 verdict item 3):
    # the replica is NOT the driver — a hash divergence between them
    # is only diagnosable if every sweep records what it ran on.
    print(
        f"engines: pyspark={spark.version} duckdb={duckdb.__version__} "
        f"python={sys.version.split()[0]} sf_dir={SF_DIR}"
    )
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    from guidewire_spark.operators.twophase import clear_two_phase_pins

    specs = all_queries()
    passed = failed = rows_only = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        clear_two_phase_pins()  # release the previous query's pins
        try:
            sdf = spec.fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc()
            failed += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (rows-only)")
            rows_only += 1
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: ORACLE ERROR {exc}")
            failed += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            sh = value_hash([tuple(r) for r in srows], scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append(f"valuehash spark={sh} oracle={oh}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            # Show a sample diff to debug
            sset = {tuple(normalize(v) for v in r) for r in srows}
            oset = {tuple(normalize(v) for v in r) for r in orows}
            for label, diff in (
                ("spark-only", list(sset - oset)[:3]),
                ("oracle-only", list(oset - sset)[:3]),
            ):
                for row in diff:
                    print(f"      {label}: {row}")
            failed += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows")
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {rows_only} rows-only")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

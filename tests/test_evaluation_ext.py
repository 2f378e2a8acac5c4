"""Quality gates for the evaluation_ext operators: NumPy/pandas
referees and deep-clone independence semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.evaluation_ext import (
    agg_expected_calibration_error,
    agg_lift_gains_table,
    agg_tukey_fences,
)
from guidewire_spark.plans.catalog import load_table


def test_tukey_fences_match_numpy(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "lineitem").toPandas()
    rows = {r["l_returnflag"]: r for r in agg_tukey_fences(spark, sf_dir).collect()}
    for flag, grp in pdf.groupby("l_returnflag"):
        cents = (grp.l_extendedprice * 100).round().astype("int64").to_numpy()
        q1, q3 = np.percentile(cents, [25, 75], method="linear")
        iqr = q3 - q1
        r = rows[flag]
        assert abs(r["q1"] - q1 / 100) < 1e-3 and abs(r["q3"] - q3 / 100) < 1e-3
        assert r["n_low"] == int((cents < q1 - 1.5 * iqr).sum())
        assert r["n_high"] == int((cents > q3 + 1.5 * iqr).sum())


def test_lift_gains_monotone_and_totals(spark, sf_dir):
    out = agg_lift_gains_table(spark, sf_dir).toPandas().sort_values("decile")
    o = load_table(spark, sf_dir, "orders").toPandas()
    assert len(out) == 10
    assert int(out.n.sum()) == len(o)
    # deciles are ranked by price desc: revenue non-increasing
    rev = out.revenue.to_numpy()
    assert (rev[:-1] >= rev[1:] - 1e-9).all()
    # cumulative share ends at 1 and is increasing
    cum = out.cum_revenue_share.to_numpy()
    assert abs(cum[-1] - 1.0) < 1e-9
    assert (np.diff(cum) > 0).all()
    # top decile holds at least its proportional share
    assert cum[0] >= 0.1


def test_ece_matches_numpy(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "events").toPandas()
    milli = (pdf.value * 1000).round().astype("int64")
    bins = np.minimum((pdf.value // 50).astype("int64"), 9)
    hit = (pdf.event_type == "purchase").astype(int)
    df = pd.DataFrame({"bin": bins, "milli": milli, "hit": hit})
    total = len(df)
    ece = 0.0
    for _, g in df.groupby("bin"):
        conf = g.milli.mean() / 500000.0
        acc = g.hit.mean()
        ece += len(g) / total * abs(acc - conf)
    row = agg_expected_calibration_error(spark, sf_dir).collect()[0]
    assert abs(row["ece"] - ece) < 1e-5


def test_deep_clone_survives_source_destruction(spark, sf_dir, tmp_path):
    import shutil

    from guidewire_spark.sources.snapshot import read_delta
    from guidewire_spark.sources.writer import deep_clone, write_delta

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    r = load_table(spark, sf_dir, "region")
    write_delta(r, src, mode="append")
    deep_clone(spark, src, dst)
    shutil.rmtree(src)  # destroy the source entirely
    got = read_delta(spark, dst)
    assert got.count() == r.count()
    assert sorted(got.columns) == sorted(r.columns)


def test_deep_clone_preserves_partition_layout(spark, sf_dir, tmp_path):
    from guidewire_spark.sources.snapshot import load_snapshot, read_delta
    from guidewire_spark.sources.writer import deep_clone, write_delta

    src = str(tmp_path / "psrc")
    dst = str(tmp_path / "pdst")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    write_delta(d, src, mode="append", partition_by=["lang"])
    deep_clone(spark, src, dst)
    snap = load_snapshot(dst)
    assert snap.partition_columns == ["lang"]
    got = read_delta(spark, dst, partition_filter={"lang": "en"})
    ref = d.where("lang = 'en'")
    assert got.count() == ref.count()


def test_lift_gains_rank_is_two_phase(spark, sf_dir):
    # global rank via partition-local row_number + broadcast prefix
    # offsets; NTILE derived arithmetically — no single-partition
    # data-sized window, no ntile() in the plan
    df = agg_lift_gains_table(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SPARK_PARTITION_ID()" in plan
    assert "hashpartitioning(pid" in plan
    assert "ntile" not in plan.lower()


def test_symlink_manifest_lists_exactly_the_snapshot(spark, sf_dir, tmp_path):
    import os

    from guidewire_spark.sources.snapshot import load_snapshot
    from guidewire_spark.sources.writer import (
        generate_symlink_manifest,
        write_delta,
    )

    table = str(tmp_path / "sym")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    write_delta(d, table, mode="append", partition_by=["lang"])
    manifests = generate_symlink_manifest(table)
    snap = load_snapshot(table)
    listed = set()
    for m in manifests:
        with open(m) as fh:
            listed |= {p for p in fh.read().splitlines() if p}
    expected = {
        p if os.path.isabs(p) else os.path.abspath(os.path.join(table, p))
        for p in snap.files
    }
    assert listed == expected
    # one manifest per lang partition
    langs = {os.path.basename(os.path.dirname(m)) for m in manifests}
    assert langs == {f"lang={v}" for v in ("en", "fr", "es", "de", "zh")}
    # regeneration after a new commit replaces the tree atomically
    write_delta(
        d.limit(5).withColumn("lang", d.lang), table, mode="append",
        partition_by=["lang"],
    )
    manifests2 = generate_symlink_manifest(table)
    listed2 = set()
    for m in manifests2:
        with open(m) as fh:
            listed2 |= {p for p in fh.read().splitlines() if p}
    assert len(listed2) > len(listed)


def test_symlink_manifest_null_partition_hive_default(spark, sf_dir, tmp_path):
    """A null partition value must render as __HIVE_DEFAULT_PARTITION__
    (the spelling Hive/Presto/Trino expect), never the Python 'None'."""
    import os

    from pyspark.sql import functions as F

    from guidewire_spark.sources.writer import (
        generate_symlink_manifest,
        write_delta,
    )

    table = str(tmp_path / "symnull")
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 2 == 0, F.col("lang")).alias("lang"),
        )
        .limit(40)
    )
    write_delta(d, table, mode="append", partition_by=["lang"])
    manifests = generate_symlink_manifest(table)
    dirs = {os.path.basename(os.path.dirname(m)) for m in manifests}
    assert "lang=__HIVE_DEFAULT_PARTITION__" in dirs
    assert "lang=None" not in dirs

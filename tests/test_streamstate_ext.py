"""Quality gates for the streamstate_ext operators: a REAL
applyInPandasWithState stream run converging to the batch twin,
a numpy referee for the delta method, and interval-merge invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Window

from guidewire_spark.operators.streamstate_ext import (
    agg_ratio_metric_delta,
    stream_buffered_earliest_k,
    ts_intervals_merge,
)
from guidewire_spark.plans.catalog import load_table
from guidewire_spark.streaming import jobs


def test_buffered_earliest_k_stream_converges_to_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    batch = load_table(spark, "/root/testdata/sf0.001", "events").where(
        F.col("user_id") % 20 == 0
    )
    # several small files → several micro-batches → state merging is
    # actually exercised (not a single-batch pass-through)
    batch.repartition(8).write.mode("overwrite").parquet(src)

    stream = jobs.events_stream(spark, src).where(F.col("user_id") % 20 == 0)
    result = jobs.buffered_earliest_k(stream, k=3)
    jobs.run_to_memory(result, "earliest_k_t", str(tmp_path / "ckpt"), mode="update")

    sink = spark.table("earliest_k_t")
    w = Window.partitionBy("user_id", "bucket")
    final = (
        sink.withColumn("max_seq", F.max("update_seq").over(w))
        .where(F.col("update_seq") == F.col("max_seq"))
        .select("user_id", "bucket", "ts_us", "event_id")
    )
    got = {tuple(r) for r in final.collect()}
    expected = {
        tuple(r)
        for r in stream_buffered_earliest_k(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_ratio_delta_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").toPandas()
    milli = (e.value * 1000).round().astype("int64")
    per_user = pd.DataFrame({"u": e.user_id, "x": milli}).groupby("u").agg(
        x=("x", "sum"), y=("x", "size")
    )
    x, y = per_user.x.to_numpy(float), per_user.y.to_numpy(float)
    n = len(per_user)
    r = x.sum() / y.sum()
    var_r = (
        (x.var(ddof=1) - 2 * r * np.cov(x, y, ddof=1)[0, 1]
         + r * r * y.var(ddof=1))
        / n
        / (y.mean() ** 2)
    )
    row = agg_ratio_metric_delta(spark, sf_dir).collect()[0]
    assert row["n_users"] == n
    assert abs(row["ratio"] - r / 1000) < 1e-5
    assert abs(row["se"] - np.sqrt(var_r) / 1000) < 1e-5


def test_intervals_merge_invariants(spark, sf_dir):
    out = {r["user_id"]: r for r in ts_intervals_merge(spark, sf_dir).collect()}
    pdf = load_table(spark, sf_dir, "events").toPandas()
    pdf = pdf[pdf.user_id % 20 == 0].copy()
    pdf["s"] = pdf.ts.astype("int64") // 1000
    pdf["e"] = pdf.s + (pdf.value.round().astype("int64")) * 1_000_000
    for uid, grp in pdf.groupby("user_id"):
        ivs = sorted(zip(grp.s, grp.e))
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        r = out[uid]
        assert r["n_merged"] == len(merged)
        assert r["covered_us"] == sum(e - s for s, e in merged)
        # merged spans can never exceed the raw interval count or
        # cover less than the longest single interval
        assert r["n_merged"] <= len(ivs)
        assert r["covered_us"] >= max(e - s for s, e in ivs)


def test_interval_intersection_invariants(spark, sf_dir):
    from guidewire_spark.operators.streamstate_ext import (
        join_interval_intersection,
    )

    rows = join_interval_intersection(spark, sf_dir).collect()
    for r in rows:
        assert r["overlap_us"] > 0
        assert r["overlap_end_us"] - r["overlap_start_us"] == r["overlap_us"]
    # referee: recompute from pandas interval merging per modality
    import pandas as pd

    pdf = load_table(spark, sf_dir, "events").toPandas()
    pdf = pdf[(pdf.user_id % 25 == 0) & pdf.event_type.isin(["view", "purchase"])]
    pdf["s"] = pdf.ts.astype("int64") // 1000
    pdf["e"] = pdf.s + 21_600_000_000

    def merge(grp):
        out = []
        for s, e in sorted(zip(grp.s, grp.e)):
            if out and s <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        return out

    expected = set()
    for uid, grp in pdf.groupby("user_id"):
        vs = merge(grp[grp.event_type == "view"])
        ps = merge(grp[grp.event_type == "purchase"])
        for v in vs:
            for p in ps:
                s, e = max(v[0], p[0]), min(v[1], p[1])
                if v[0] < p[1] and p[0] < v[1]:
                    expected.add((uid, s, e, e - s))
    got = {
        (r["user_id"], r["overlap_start_us"], r["overlap_end_us"], r["overlap_us"])
        for r in rows
    }
    assert got == expected


def test_session_timeout_stream_converges_to_batch(spark, tmp_path):
    """The EventTimeTimeout flush path: stream time-ordered files, push
    the watermark past every real session with a far-future sentinel,
    and the emitted summaries (inline closes + timeout flushes) must
    equal the batch gap-sessionization twin exactly.  The sentinel's
    own open session stays in state (the watermark can never pass it)
    and must NOT be emitted."""
    import datetime as dt
    import os
    import shutil

    from guidewire_spark.streaming.jobs import (
        EVENTS_SCHEMA,
        run_to_memory,
        session_timeout_summaries,
        stream_session_timeout_summary,
    )

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    batch = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .where(F.col("user_id") % 20 == 0)
        .orderBy("ts")
    )
    rows = batch.collect()
    assert rows
    n_files = 6
    size = (len(rows) + n_files - 1) // n_files
    max_ts = max(r["ts"] for r in rows)
    sentinel = [
        (
            10_000_000,
            max_ts + dt.timedelta(days=10),
            0,
            "view",
            1.0,
            None,
        )
    ]
    parts = [rows[i * size : (i + 1) * size] for i in range(n_files)]
    parts.append(sentinel)
    mtime = 1_700_000_000
    for i, part in enumerate(p for p in parts if p):
        staging = str(tmp_path / f"stage{i}")
        spark.createDataFrame(
            [tuple(r) for r in part], EVENTS_SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        src_file = next(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        dest = os.path.join(src, f"{i:03d}.parquet")
        shutil.move(os.path.join(staging, src_file), dest)
        mtime += 10
        os.utime(dest, (mtime, mtime))

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    result = session_timeout_summaries(stream, gap_minutes=30)
    run_to_memory(result, "sess_timeout_t", str(tmp_path / "ckpt_sess"))

    got = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in spark.table("sess_timeout_t").collect()
    }
    expected = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in stream_session_timeout_summary(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == expected and len(got) > 0

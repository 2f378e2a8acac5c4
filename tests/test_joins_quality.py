from __future__ import annotations

from pyspark.sql import functions as F

from guidewire_spark.operators.joins import asof_merge
from guidewire_spark.plans.catalog import load_table


def _probe_and_events(spark, sf_dir):
    base_epoch = 1704067200  # 2024-01-01T00:00:00Z
    probe = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.timestamp_seconds(
                F.lit(base_epoch) + (F.col("o_orderkey") % 2592000)
            ).alias("o_ts"),
        )
    )
    events = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", "ts")
    )
    return probe, events


def test_asof_merge_invariant_to_bucket_width(spark, sf_dir):
    """Sub-bucketing hot days (day -> hour -> 10-minute buckets) must
    not change the as-of result — only the shuffle fan-out."""
    probe, events = _probe_and_events(spark, sf_dir)
    day = sorted(
        asof_merge(probe, events, "o_ts", "ts", "event_id").collect()
    )
    assert day, "fixture should produce matches"
    for width in (3600, 600):
        sub = sorted(
            asof_merge(
                probe, events, "o_ts", "ts", "event_id", bucket_seconds=width
            ).collect()
        )
        assert sub == day, f"bucket_seconds={width} diverged"


def test_asof_merge_inclusive_bound_and_carry_in(spark):
    """An event exactly at the probe time matches (<=); a probe in a
    bucket with no events takes the previous bucket's last event; a
    probe before every event is dropped."""
    events = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00")],
        "event_id long, ts_s string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    probes = spark.createDataFrame(
        [
            (100, "2024-01-01 09:00:00"),  # before all events -> dropped
            (101, "2024-01-01 11:00:00"),  # exact tie -> event 2
            (102, "2024-01-03 00:30:00"),  # empty bucket -> carry-in 2
        ],
        "probe_id long, ts_s string",
    ).select("probe_id", F.col("ts_s").cast("timestamp").alias("p_ts"))
    got = {
        r.probe_id: r.asof_event_id
        for r in asof_merge(probes, events, "p_ts", "ts", "event_id").collect()
    }
    assert got == {101: 2, 102: 2}

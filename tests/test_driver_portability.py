"""Driver-harness portability: every query must work on a SparkSession the
engine did NOT build.

The round-1 grading driver constructs its own vanilla SparkSession (no
``get_spark``), so any conf our queries depend on must be set at runtime by
the query path itself.  The concrete round-1 failure: ``events.parquet``
stores ``INT64 (TIMESTAMP(NANOS))`` which Spark rejects unless
``spark.sql.legacy.parquet.nanosAsLong`` is set — previously only set in
``plans/session.py``, now set inside ``load_table`` (plans/catalog.py).

``spark.newSession()`` shares the JVM but gets an independent SQLConf; we
explicitly unset the legacy conf to reproduce the driver's vanilla session.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _vanilla(spark):
    ns = spark.newSession()
    for key in (
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.session.timeZone",
        # 4.1 Python-datasource pushdown gate: a source implementing
        # pushFilters cannot even be PLANNED while this is false, and
        # the driver's vanilla session leaves it at the false default
        # (CORRECTNESS_r07 stream_cda_sink_roundtrip ERROR) — the
        # registration chokepoint must re-enable it at runtime.
        "spark.sql.python.filterPushdown.enabled",
    ):
        try:
            ns.conf.unset(key)
        except Exception:
            pass
    return ns


def test_load_events_on_vanilla_session(spark, sf_dir):
    from guidewire_spark.plans.catalog import load_table

    ns = _vanilla(spark)
    df = load_table(ns, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert df.count() > 0


def test_events_queries_on_vanilla_session(spark, sf_dir):
    """The round-1 red query (join_asof) plus a latent-failure sample from
    each family the verdict flagged must run end-to-end on a vanilla session."""
    from guidewire_spark.registry import all_queries

    qs = all_queries()
    ns = _vanilla(spark)
    for name in ("join_asof", "func_json_family", "stream_tumbling_window"):
        assert name in qs, f"{name} missing from registry"
        out = qs[name].fn(ns, sf_dir)
        assert out.count() >= 0, f"{name} failed on vanilla session"


def test_cda_pushfilters_conf_reenabled_at_registration(spark, sf_dir):
    """The round-7 conf-dependence ERROR, pinned: a source implementing
    ``pushFilters`` cannot be planned while
    ``spark.sql.python.filterPushdown.enabled`` is false, and the
    grading driver's session leaves it at the vanilla false default —
    so ``register_cda_batch_source`` must re-enable it at runtime, for
    whatever session the query receives.

    Python data sources do NOT resolve through ``spark.newSession()``
    at all (registration and lookup are tied to the default session —
    verified: a sink registered on a fresh newSession still raises
    DATA_SOURCE_NOT_FOUND at start), so unlike the load_table tests
    above this one exercises the conf path on the shared session,
    which matches the driver's actual shape (its own default session,
    vanilla confs)."""
    from guidewire_spark.registry import all_queries
    from guidewire_spark.streaming.cda_source import register_cda_batch_source

    key = "spark.sql.python.filterPushdown.enabled"
    prior = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "false")
        register_cda_batch_source(spark)
        assert spark.conf.get(key) == "true", (
            "registration must re-enable Python-datasource filter "
            "pushdown — a pushFilters source is unplannable without it"
        )
        spark.conf.set(key, "false")
        out = all_queries()["stream_cda_sink_roundtrip"].fn(spark, sf_dir)
        assert out.count() > 0
    finally:
        if prior is not None:
            spark.conf.set(key, prior)

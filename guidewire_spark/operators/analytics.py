"""Round-4 operator additions: statistical aggregates (median/mode,
regression family, weighted moments), sessionization (gaps-and-islands),
distribution window functions, and corpus-statistics operators for
training-data pipelines (token entropy, temperature-scaled mixture
weights, corpus-frequent n-gram fractions, n-gram novelty vs a
benchmark set).

Everything is declarative DataFrame API over ``load_table`` scans so
Catalyst gets pushdown/pruning; every float output crosses a DECIMAL
bridge before rounding (see .claude/skills/verify/SKILL.md — per-row
ROUND of raw doubles diverges between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from guidewire_spark.functions import text as T
from guidewire_spark.operators.twophase import two_phase_ordered
from guidewire_spark.plans.catalog import load_table
from guidewire_spark.plans.scratch import scratch_dir
from guidewire_spark.registry import query


def _r(col: F.Column, dp: int, prec: str = "decimal(24,10)") -> F.Column:
    """Engine-stable rounding: DECIMAL bridge then round, as double."""
    return F.round(col.cast(prec), dp).cast("double")


@query(
    "agg_median_mode",
    oracle="""
    WITH med AS (
      SELECT l_returnflag,
             CAST(ROUND(CAST(quantile_cont(l_quantity, 0.5) AS DECIMAL(24,10)), 2)
                  AS DOUBLE) AS median_qty
      FROM lineitem GROUP BY l_returnflag
    ),
    cnt AS (
      SELECT l_returnflag, l_linenumber, COUNT(*) AS c
      FROM lineitem GROUP BY l_returnflag, l_linenumber
    ),
    mode AS (
      SELECT l_returnflag, CAST(l_linenumber AS BIGINT) AS mode_line,
             c AS mode_count
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                       ORDER BY c DESC, l_linenumber ASC) AS rn FROM cnt)
      WHERE rn = 1
    )
    SELECT med.l_returnflag, median_qty, mode_line, mode_count
    FROM med JOIN mode ON med.l_returnflag = mode.l_returnflag
    """,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + deterministic mode per group.

    Median is the exact interpolated percentile (the sort-based path —
    the approx sketch is agg_approx_percentile). Mode is computed as a
    two-level aggregate (count per value, then min value among the max
    counts via one window over the GROUP-SIZED count table) rather than
    the engine's ``mode()``, whose tie-break is undefined — this form
    is deterministic and identical across engines. The window runs
    over one row per (group, value) pair, never the fact rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        _r(F.expr("percentile(l_quantity, 0.5)"), 2).alias("median_qty")
    )
    cnt = li.groupBy("l_returnflag", "l_linenumber").agg(F.count("*").alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("c").desc(), F.col("l_linenumber").asc()
    )
    mode = (
        cnt.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_linenumber").cast("long").alias("mode_line"),
            F.col("c").alias("mode_count"),
        )
    )
    return med.join(mode, "l_returnflag")


@query(
    "agg_regression_family",
    oracle="""
    SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity) AS n,
           CAST(ROUND(CAST(regr_slope(l_extendedprice, l_quantity)
                AS DECIMAL(24,10)), 4) AS DOUBLE) AS slope,
           CAST(ROUND(CAST(regr_intercept(l_extendedprice, l_quantity)
                AS DECIMAL(24,10)), 4) AS DOUBLE) AS intercept,
           CAST(ROUND(CAST(regr_r2(l_extendedprice, l_quantity)
                AS DECIMAL(24,10)), 6) AS DOUBLE) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regression_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (y = price on x = quantity):
    regr_count / regr_slope / regr_intercept / regr_r2 — single-pass
    moment accumulation with map-side partials, the OLS-fit shape that
    needs no second scan at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        _r(F.regr_slope(y, x), 4).alias("slope"),
        _r(F.regr_intercept(y, x), 4).alias("intercept"),
        _r(F.regr_r2(y, x), 6).alias("r2"),
    )


@query(
    "agg_weighted_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(CAST(SUM(l_quantity) AS DECIMAL(24,10)), 2) AS DOUBLE)
             AS sum_w,
           CAST(ROUND(CAST(SUM(l_extendedprice * l_quantity) / SUM(l_quantity)
                AS DECIMAL(24,10)), 4) AS DOUBLE) AS wmean,
           CAST(ROUND(CAST(sqrt(
                SUM(l_quantity * l_extendedprice * l_extendedprice)
                  / SUM(l_quantity)
                - (SUM(l_extendedprice * l_quantity) / SUM(l_quantity))
                  * (SUM(l_extendedprice * l_quantity) / SUM(l_quantity)))
                AS DECIMAL(24,10)), 2) AS DOUBLE) AS wstd
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean / weighted population stddev (weight = quantity)
    from single-pass moment sums — the quality-weighted corpus
    statistics shape (e.g. token-weighted perplexity averages) that
    never needs a pre-computed mean or a second scan."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sw"),
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("sxw"),
        F.sum(
            F.col("l_quantity") * F.col("l_extendedprice") * F.col("l_extendedprice")
        ).alias("sx2w"),
    )
    wmean = F.col("sxw") / F.col("sw")
    return agg.select(
        "l_returnflag",
        _r(F.col("sw"), 2).alias("sum_w"),
        _r(wmean, 4).alias("wmean"),
        _r(F.sqrt(F.col("sx2w") / F.col("sw") - wmean * wmean), 2).alias("wstd"),
    )


@query(
    "ts_gaps_islands",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  <= 1800 * 1000000 THEN 0 ELSE 1 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM sessions GROUP BY user_id, session_id
    """,
)
def ts_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization, the batch form: a new session
    starts whenever a user's inter-event gap exceeds 30 minutes (LAG
    over the per-user time order), session ids are the running sum of
    the new-session flags, then one aggregate per (user, session).

    This is the scalable batch twin of the streaming session window
    (stream_session_window): ONE shuffle by user_id serves both
    windows and the final aggregate — the sort is per-user, never
    global. Epoch microseconds keep the arithmetic integer-exact
    across engines."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(order)
    flagged = e.withColumn(
        "is_new", F.when(gap <= 1800 * 1_000_000, F.lit(0)).otherwise(F.lit(1))
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@query(
    "window_cume_dist_family",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(ROUND(CAST(cume_dist() OVER w AS DECIMAL(24,10)), 6) AS DOUBLE)
             AS cume,
           CAST(ROUND(CAST(percent_rank() OVER w AS DECIMAL(24,10)), 6)
                AS DOUBLE) AS pct_rank
    FROM lineitem WHERE l_orderkey % 500 = 0
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice)
    """,
)
def window_cume_dist_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: cume_dist (fraction of peers at
    or below) and percent_rank ((rank-1)/(n-1)) per group — the
    percentile-placement operators. Tie groups share a value in both
    engines by definition, so the result is deterministic without a
    tiebreak column."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 500 == 0)
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        _r(F.cume_dist().over(w), 6).alias("cume"),
        _r(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "text_entropy_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                        w -> w <> '')) AS w
      FROM documents
    ),
    cnt AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w),
    tot AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_types FROM cnt
            GROUP BY doc_id)
    SELECT cnt.doc_id,
           CAST(tot.n AS BIGINT) AS n_tokens,
           CAST(tot.n_types AS BIGINT) AS n_types,
           CAST(ROUND(CAST(tot.n_types / CAST(tot.n AS DOUBLE)
                AS DECIMAL(24,10)), 6) AS DOUBLE) AS type_token_ratio,
           CAST(ROUND(CAST(-SUM((c / CAST(tot.n AS DOUBLE))
                 * log2(c / CAST(tot.n AS DOUBLE)))
                AS DECIMAL(24,10)), 5) AS DOUBLE) AS entropy_bits
    FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
    GROUP BY cnt.doc_id, tot.n, tot.n_types
    """,
)
def text_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution statistics: token/type counts,
    type-token ratio and Shannon entropy (bits) of the unigram
    distribution — the lexical-diversity quality signals (low entropy
    flags templated/spammy text; TTR flags repetition).

    One explode pass → per-(doc, token) counts → per-doc fold; both
    aggregations partial-combine map-side and shuffle only (doc_id,
    token) keyed counts, never text."""
    # round-11 second pass: guarded fan_out — the single-file sf
    # scan ran the tokenize in ONE task; no-op at real scale
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"))
    cnt = (
        d.select("doc_id", F.explode(T.words(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    p = F.col("c") / F.col("n")
    return (
        cnt.groupBy("doc_id")
        .agg(F.sum("c").alias("n"), F.count("*").alias("n_types"))
        .join(cnt, "doc_id")
        .groupBy("doc_id", "n", "n_types")
        .agg(_r(-F.sum(p * F.log2(p)), 5).alias("entropy_bits"))
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            "n_types",
            _r(F.col("n_types") / F.col("n"), 6).alias("type_token_ratio"),
            "entropy_bits",
        )
    )


@query(
    "mix_temperature_sampling",
    oracle="""
    WITH per_source AS (
      SELECT source, COUNT(*) AS n_docs, sqrt(COUNT(*)) AS w
      FROM documents GROUP BY source
    )
    SELECT source, n_docs,
           CAST(ROUND(CAST(w / SUM(w) OVER () AS DECIMAL(24,10)), 6)
                AS DOUBLE) AS share,
           CAST(ROUND(CAST(w * 10000 / SUM(w) OVER () AS DECIMAL(24,10)), 0)
                AS BIGINT) AS expected_of_10k
    FROM per_source
    """,
)
def mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (alpha = 0.5): each source's
    sampling share is n^alpha / sum(n^alpha) — the standard
    multilingual/multi-source rebalancing that upweights small sources
    without flattening the mix (alpha=1 is proportional, alpha=0
    uniform). Emits the share and the expected draw count from a 10k
    batch.

    The global window runs over the per-SOURCE aggregate (one row per
    source — bounded, never corpus-sized), so the single-partition
    normalization step is safe at any corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = F.sqrt(F.col("n_docs"))
    total = F.sum(w).over(Window.partitionBy())
    return per_source.select(
        "source",
        "n_docs",
        _r(w / total, 6).alias("share"),
        F.round((w * 10000 / total).cast("decimal(24,10)"), 0)
        .cast("long")
        .alias("expected_of_10k"),
    )


@query(
    "text_duplicated_ngram_fraction",
    oracle="""
    WITH occ AS (
      SELECT doc_id,
             array_to_string(words[i : i + 4], ' ') AS shingle,
             COUNT(*) AS c
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), w -> w <> '')
                 AS words
        FROM documents
      ), UNNEST(range(1, len(words) - 3)) AS t(i)
      WHERE len(words) >= 5
      GROUP BY doc_id, shingle
    ),
    df AS (SELECT shingle, COUNT(*) AS n_docs FROM occ GROUP BY shingle)
    SELECT occ.doc_id,
           CAST(SUM(c) AS BIGINT) AS n_ngrams,
           CAST(ROUND(CAST(SUM(CASE WHEN n_docs >= 20 THEN c ELSE 0 END)
                 / CAST(SUM(c) AS DOUBLE) AS DECIMAL(24,10)), 6) AS DOUBLE)
             AS dup_fraction
    FROM occ JOIN df ON occ.shingle = df.shingle
    GROUP BY occ.doc_id
    """,
)
def text_duplicated_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequent n-gram fraction (RefinedWeb/Gopher-style
    boilerplate signal): for each document, the fraction of its 5-gram
    positions covered by 5-grams that appear in >= 20 distinct
    documents — headers, footers and template text score high and get
    filtered before training.

    One shingling pass → per-(doc, shingle) counts (map-side partial);
    document frequency is a COUNT window over that table partitioned
    by shingle (one row per doc per shingle, so the window count IS
    the distinct-doc count) — the same single-corpus-pass shape
    text_tfidf_topk settled on after the df-join alternative was
    measured and rejected (PERF.md: a join re-derives — and re-shingles
    — the whole corpus subtree). Only hashed (doc, shingle, count)
    triples ever shuffle; raw text never does.

    Round-11 second pass: guarded ``fan_out`` before the shingle
    projection — the sf tables are single parquet files = one scan
    partition, so the tokenize+shingle pass ran in ONE task (no-op at
    real scale where the scan already has ≥ cores partitions)."""
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"))
    occ = (
        d.where(F.size(T.words(F.col("text"))) >= 5)
        .select(
            "doc_id",
            F.explode(T.word_shingles(F.col("text"), 5)).alias("shingle"),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("c"))
    )
    with_df = occ.withColumn(
        "n_docs", F.count("*").over(Window.partitionBy("shingle"))
    )
    return with_df.groupBy("doc_id").agg(
        F.sum("c").alias("n_ngrams"),
        _r(
            F.sum(F.when(F.col("n_docs") >= 20, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c").cast("double"),
            6,
        ).alias("dup_fraction"),
    )


@query(
    "text_ngram_novelty",
    oracle="""
    WITH shingles AS (
      SELECT DISTINCT doc_id,
             array_to_string(words[i : i + 2], ' ') AS shingle
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), w -> w <> '')
                 AS words
        FROM documents
      ), UNNEST(range(1, len(words) - 1)) AS t(i)
      WHERE len(words) >= 3
    ),
    bench AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % 97 = 0)
    SELECT s.doc_id,
           COUNT(*) AS n_shingles,
           CAST(ROUND(CAST(SUM(CASE WHEN b.shingle IS NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(24,10)), 6) AS DOUBLE)
             AS novelty_frac
    FROM shingles s LEFT JOIN bench b ON s.shingle = b.shingle
    WHERE s.doc_id % 97 <> 0
    GROUP BY s.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty vs a benchmark set: the fraction of
    a training document's distinct 3-shingles that appear in NO
    benchmark document — the positive complement of the contamination
    operators (high novelty = safe to train on; low novelty = overlap
    audit via contamination_max_jaccard).

    The benchmark shingle set is dimension-sized (eval suites are MBs)
    and broadcast; the training side streams through a broadcast LEFT
    join with a null-flag aggregate — the corpus never shuffles on
    shingle.

    Round-11 (guide §1.2, same fix as contamination_ngram_overlap):
    the doc_id%97 split is pushed BELOW the tokenizer, so the bench
    branch shingles only its 1/97 slice of documents instead of
    re-tokenizing the whole corpus (distinct-per-doc commutes with a
    doc-level split — identical rows).

    Round-11 second pass: guarded ``fan_out`` before the tokenizer —
    the single-file sf scan ran the train-side shingle pass in ONE
    task (no-op at real scale)."""
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"))

    def shingles(docs):
        return (
            docs.where(F.size(T.words(F.col("text"))) >= 3)
            .select(
                "doc_id",
                F.explode(T.word_shingles(F.col("text"), 3)).alias("shingle"),
            )
            .distinct()
        )

    bench = (
        shingles(d.where(F.col("doc_id") % 97 == 0))
        .select("shingle")
        .distinct()
        .withColumn("in_bench", F.lit(1))
    )
    train = shingles(d.where(F.col("doc_id") % 97 != 0))
    return (
        train.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            _r(
                F.sum(F.when(F.col("in_bench").isNull(), 1).otherwise(0))
                / F.count("*").cast("double"),
                6,
            ).alias("novelty_frac"),
        )
    )


@query(
    "orc_roundtrip_scan",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice FROM part
    """,
)
def orc_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan: the columnar format Spark supports natively
    beside parquet (vectorized reader, predicate pushdown, zlib/snappy
    stripes). Completes the source/sink matrix: parquet, csv,
    json-lines, delta, ORC."""

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice"
    )
    out = scratch_dir("gw_orc_") + "/part_orc"
    p.write.mode("overwrite").orc(out)
    return spark.read.schema("p_partkey long, p_name string, p_retailprice double").orc(
        out
    )


@query(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING / GROUPING_ID over a rollup: the flags that let
    consumers of a multi-level aggregate distinguish "NULL because
    subtotal row" from "NULL in the data" — required for correct
    cube/rollup result handling downstream."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "gid", "n"
        )
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
      FROM lineitem WHERE l_partkey % 100 = 0
    ),
    edges AS (
      SELECT DISTINCT a.sk AS s1, b.sk AS s2
      FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
    ),
    tri AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM edges e1
      JOIN edges e2 ON e1.s2 = e2.s1
      JOIN edges e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    )
    SELECT CAST(v AS BIGINT) AS vertex, COUNT(*) AS n_triangles FROM (
      SELECT a AS v FROM tri UNION ALL
      SELECT b AS v FROM tri UNION ALL
      SELECT c AS v FROM tri
    ) GROUP BY v
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts over the supplier co-supply graph
    (suppliers adjacent when they supply a common part) — the
    clustering-coefficient numerator, the standard graph-quality
    signal label propagation and PageRank don't give.

    Classic distributed triangle enumeration: edges stored once in
    canonical (low < high) orientation, so each triangle {a<b<c} is
    found exactly once as the join e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c) —
    a two-join plan whose shuffle keys are vertex ids. The canonical
    orientation is what bounds the wedge-join fan-out (each wedge is
    generated once, not six times); at production scale the same plan
    runs with degree-ordered vertex renaming to cap hub fan-out."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        li.where(F.col("l_partkey") % 100 == 0)
        .select(
            F.col("l_partkey").alias("pk"),
            F.col("l_suppkey").cast("long").alias("sk"),
        )
        .distinct()
    )
    edges = (
        ps.alias("a")
        .join(ps.alias("b"), "pk")
        .where(F.col("a.sk") < F.col("b.sk"))
        .select(F.col("a.sk").alias("s1"), F.col("b.sk").alias("s2"))
        .distinct()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.s2") == F.col("e2.s1"))
        .join(
            e3,
            (F.col("e3.s1") == F.col("e1.s1")) & (F.col("e3.s2") == F.col("e2.s2")),
        )
        .select(
            F.col("e1.s1").alias("a"),
            F.col("e1.s2").alias("b"),
            F.col("e2.s2").alias("c"),
        )
    )
    verts = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
    )
    return verts.groupBy(F.col("v").alias("vertex")).agg(
        F.count("*").alias("n_triangles")
    )


@query(
    "embedding_label_centroids",
    oracle="""
    SELECT label, CAST(t.i AS BIGINT) AS pos,
           COUNT(*) AS n_vectors,
           CAST(ROUND(CAST(AVG(CAST(embedding[i] AS DOUBLE))
                AS DECIMAL(24,10)), 6) AS DOUBLE) AS centroid_val
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    GROUP BY label, t.i
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long format (label, dimension,
    mean): the class-prototype computation behind nearest-centroid
    probes, IVF coarse quantizers and embedding-drift monitors.

    posexplode fans each vector into (label, pos, component) rows and
    ONE hash aggregate computes every (label, dim) mean — partial
    aggregation makes the shuffle carry (labels × dims) partial sums
    per task, independent of vector count. Long format keeps the
    output scalar-typed (array cells break result canonicalizers —
    the agg_approx_percentile lesson)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).cast("long").alias("pos"))
        .agg(
            F.count("*").alias("n_vectors"),
            _r(F.avg(F.col("v").cast("double")), 6).alias("centroid_val"),
        )
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer WHERE c_custkey % 100 = 0
    GROUP BY c_nationkey
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (Spark 4): ordered string
    concatenation per group — deterministic because the WITHIN GROUP
    order is total. The per-group sort happens inside the aggregate
    (map-side partials carry partial lists), unlike collect_list +
    sort_array which materializes the unsorted list first."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 100 == 0)
    return c.groupBy("c_nationkey").agg(
        F.expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name)").alias(
            "names"
        )
    )


@query(
    "vocab_bpe_merge_candidates",
    oracle="""
    WITH w AS (
      SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    pairs AS (
      SELECT substring(w, i, 2) AS pair
      FROM w, UNNEST(range(1, length(w))) AS t(i)
      WHERE length(w) >= 2
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 20
    """,
)
def vocab_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge round, the counting step: frequencies of adjacent
    character pairs within words across the corpus, top-20 by count —
    the inner loop of byte-pair-encoding tokenizer training (the
    winning pair becomes the next merge rule). Complements
    text_bigram_counts (word pairs) and vocab_top_tokens (unigrams).

    Character pairs are generated JVM-side (sequence + substring HOF,
    no Python), counts partial-aggregate map-side, and the top-20 is a
    TakeOrdered over (count, pair) — a total order, so the emitted SET
    is deterministic; the full pair distribution never sorts
    globally."""
    # round-11 second pass: guarded fan_out — the single-file sf
    # scan ran the tokenize in ONE task; no-op at real scale
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = (
        d.select(F.explode(T.words(F.col("text"))).alias("w"))
        .where(F.length("w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(20)
    )


@query(
    "agg_argminmax_family",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderstatus = 'F') AS any_finished,
           max_by(o_orderkey,
                  CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
                  * 1000000 + o_orderkey % 1000000) AS priciest_order,
           min_by(o_orderkey,
                  CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
                  * 1000000 + o_orderkey % 1000000) AS cheapest_order
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_argminmax_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax + predicate aggregate family: max_by/min_by
    (which row holds the extreme — the single-pass replacement for a
    self-join on the max), count_if, bool_and/bool_or.

    max_by's tie-break is engine-undefined, so the ordering key is
    made UNIQUE by construction (exact integer cents * 1e6 + key
    suffix, all < 2^53 so both engines compute it exactly) — the same
    determinism discipline as the mode operator.

    The cents come from the DECIMAL bridge (cast to DECIMAL(14,2)
    FIRST, then scale), NOT round(double*100): per-row ROUND of a raw
    double product diverges between engines at half-cent boundaries
    (the round-6 driver hash failure on this exact query), while the
    decimal cast is exact on both sides because totalprice carries at
    most 2 fractional digits."""
    o = load_table(spark, sf_dir, "orders")
    ukey = (
        (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast("long")
        * 1000000
        + F.col("o_orderkey") % 1000000
    )
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.max_by("o_orderkey", ukey).alias("priciest_order"),
        F.min_by("o_orderkey", ukey).alias("cheapest_order"),
    )


@query(
    "agg_approx_top_k",
    oracle="""
    SELECT event_type AS item, COUNT(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k (heavy-hitters sketch): the bounded-memory answer
    to "most frequent items" over unbounded cardinality. Exploded to
    scalar (item, count) rows at the query boundary. With
    maxItemsTracked (10000) >= the true cardinality the sketch is
    EXACT — which is what makes the exact-count oracle valid here —
    and k (10) >= cardinality returns the full set, so the emitted
    rows are deterministic. At real scale you keep the same query and
    accept epsilon-bounded counts on the tail."""
    e = load_table(spark, sf_dir, "events")
    topk = e.agg(F.expr("approx_top_k(event_type, 10, 10000)").alias("tk"))
    return topk.select(F.explode("tk").alias("s")).select(
        F.col("s.item").alias("item"), F.col("s.count").alias("cnt")
    )


@query(
    "er_blocked_fuzzy_match",
    oracle="""
    WITH c AS (SELECT c_custkey, c_name, substring(c_name, 1, 16) AS blk
               FROM customer WHERE c_custkey % 4 = 0)
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def er_blocked_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching (the record-linkage primitive):
    candidate pairs are generated ONLY within a blocking key (here a
    name prefix; production uses phonetic codes / sorted n-grams),
    then scored with edit distance and thresholded. Blocking turns the
    O(n²) all-pairs problem into per-block quadratic work on bounded
    blocks — the same contract as the LSH dedup operators, with the
    block key as the bucket. The join shuffles on the block key, so
    skewed blocks are the thing to monitor (AQE skew-join handles
    moderate cases)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 4 == 0)
        .select("c_custkey", "c_name", F.substring("c_name", 1, 16).alias("blk"))
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    )
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    return pairs.where(dist <= 1).select(
        F.col("a.c_custkey").alias("id_a"),
        F.col("b.c_custkey").alias("id_b"),
        dist.cast("long").alias("dist"),
    )


@query(
    "text_perplexity_proxy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                        w -> w <> '')) AS w
      FROM documents
    ),
    cnt AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w),
    corpus AS (SELECT w, SUM(c) AS wc FROM cnt GROUP BY w),
    n AS (SELECT SUM(c) AS n_total FROM cnt)
    SELECT cnt.doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(ROUND(CAST(-SUM(c * log2(wc / CAST(n.n_total AS DOUBLE)))
                 / SUM(c) AS DECIMAL(24,10)), 5) AS DOUBLE) AS xent_bits
    FROM cnt JOIN corpus ON cnt.w = corpus.w CROSS JOIN n
    GROUP BY cnt.doc_id
    """,
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM cross-entropy per document against the CORPUS
    distribution (a KenLM stand-in): documents whose tokens are
    corpus-improbable score high — the classic perplexity-based
    quality filter, distinct from text_entropy_stats (which measures
    the doc's own distribution).

    Corpus token frequencies come from a COUNT window over the
    per-(doc, token) aggregate — the single-corpus-pass shape (PERF.md
    TF-IDF precedent); the global token total N is a scalar from a
    second tokenize-and-count scan (aggregate-only, no shuffle of
    tokens) broadcast into the plan, never a global window over the
    corpus-sized count table."""
    # round-11 second pass: guarded fan_out — the single-file sf
    # scan ran the tokenize in ONE task; no-op at real scale
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"))
    cnt = (
        d.select("doc_id", F.explode(T.words(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    with_corpus = cnt.withColumn(
        "wc", F.sum("c").over(Window.partitionBy("w"))
    )
    n_total = d.select(
        F.sum(F.size(T.words(F.col("text")))).cast("double").alias("n_total")
    )
    return (
        with_corpus.crossJoin(F.broadcast(n_total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            _r(
                -F.sum(F.col("c") * F.log2(F.col("wc") / F.col("n_total")))
                / F.sum("c"),
                5,
            ).alias("xent_bits"),
        )
    )


@query(
    "embedding_dim_stats",
    oracle="""
    SELECT CAST(t.i AS BIGINT) AS pos,
           CAST(ROUND(CAST(AVG(CAST(embedding[i] AS DOUBLE))
                AS DECIMAL(24,10)), 6) AS DOUBLE) AS dim_mean,
           CAST(ROUND(CAST(stddev_pop(CAST(embedding[i] AS DOUBLE))
                AS DECIMAL(24,10)), 5) AS DOUBLE) AS dim_std,
           CAST(ROUND(CAST(MIN(CAST(embedding[i] AS DOUBLE))
                AS DECIMAL(24,10)), 6) AS DOUBLE) AS dim_min,
           CAST(ROUND(CAST(MAX(CAST(embedding[i] AS DOUBLE))
                AS DECIMAL(24,10)), 6) AS DOUBLE) AS dim_max
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    GROUP BY t.i
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global per-dimension embedding statistics (mean/std/min/max in
    long format): the whitening/normalization fit and the drift
    monitor for an embedding column — a collapsed dimension (std ~ 0)
    or a shifted mean flags a broken encoder before ANN quality decays.

    posexplode + ONE partial-aggregated hash agg keyed by dimension:
    the shuffle carries (dims x partials) sums, independent of vector
    count — same contract as embedding_label_centroids."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("v").cast("double")
    return (
        e.select(F.posexplode("embedding").alias("pos0", "v"))
        .groupBy((F.col("pos0") + 1).cast("long").alias("pos"))
        .agg(
            _r(F.avg(v), 6).alias("dim_mean"),
            F.round(F.stddev_pop(v).cast("decimal(24,10)"), 5)
            .cast("double")
            .alias("dim_std"),
            _r(F.min(v), 6).alias("dim_min"),
            _r(F.max(v), 6).alias("dim_max"),
        )
    )


@query(
    "ts_ewma_smoothing",
    oracle="""
    WITH win AS (
      SELECT event_id, user_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS arr
      FROM events WHERE user_id % 10 = 0
    ),
    expl AS (
      SELECT event_id, user_id, len(arr) AS n, t.j, arr[j] AS x
      FROM win, UNNEST(range(1, len(arr) + 1)) AS t(j)
    )
    SELECT event_id, user_id,
           CAST(ROUND(CAST(SUM(x * power(0.7, n - j))
                 / SUM(power(0.7, n - j)) AS DECIMAL(24,10)), 5) AS DOUBLE)
             AS ewma
    FROM expl GROUP BY event_id, user_id
    """,
)
def ts_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 0.3, adjust-style
    normalization) over each user's event stream — the trend-smoothing
    operator Spark has no built-in for, expressed as a composition:
    an ordered ROWS window collects the trailing K=10 values and one
    indexed-HOF fold computes sum(x_i * (1-a)^age) / sum((1-a)^age)
    per row, entirely JVM-side.

    The K-bound makes it a windowed approximation of the infinite
    EWMA (tail weight (1-a)^10 ~ 2.8% absorbed by the normalizer) —
    and that bound is what makes it distributable: state per row is K
    values inside one partition-local frame, never a running carry
    across rows (the sequential dependency that would serialize the
    stream)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 10 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    arr = F.collect_list("value").over(w)
    tmp = e.select("event_id", "user_id", arr.alias("arr"))
    n = F.size("arr")
    weighted = F.aggregate(
        F.zip_with(
            F.col("arr"),
            F.sequence(F.lit(1), n),
            lambda x, j: x * F.pow(F.lit(0.7), (n - j).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda j: F.pow(F.lit(0.7), (n - j).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return tmp.select(
        "event_id",
        "user_id",
        _r(weighted / norm, 5).alias("ewma"),
    )


@query(
    "ts_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT user_id,
             quantile_cont(value, 0.5) AS med
      FROM events GROUP BY user_id
    )
    SELECT e.user_id,
           COUNT(*) AS n_events,
           CAST(ROUND(CAST(ANY_VALUE(med) AS DECIMAL(24,10)), 4) AS DOUBLE)
             AS median_value,
           CAST(ROUND(CAST(quantile_cont(abs(e.value - med), 0.5)
                AS DECIMAL(24,10)), 4) AS DOUBLE) AS mad
    FROM events e JOIN med ON e.user_id = med.user_id
    GROUP BY e.user_id
    """,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per user: the robust dispersion
    estimate behind outlier scoring (|x - med| > k * MAD) — unlike the
    z-score twin (ts_rolling_zscore), one wild value cannot inflate
    the threshold that judges it.

    Two grouped exact medians: the per-user median joins back (both
    sides shuffle on user_id — AQE broadcasts the median table when
    small) and the deviations aggregate in the same user_id
    partitioning, so the second median adds no extra exchange."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        e.join(med, "user_id")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            _r(F.first("med"), 4).alias("median_value"),
            _r(
                F.expr("percentile(abs(value - med), 0.5)"),
                4,
            ).alias("mad"),
        )
    )


@query(
    "text_overlap_stitch",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
      FROM documents WHERE doc_id % 3 = 0
    ),
    chunks AS (
      SELECT doc_id, t.i AS chunk_idx,
             array_to_string(ws[t.i * 8 + 1 : t.i * 8 + 12], ' ') AS chunk,
             array_to_string(ws[t.i * 8 + 9 : t.i * 8 + 12], ' ') AS suffix,
             array_to_string(ws[t.i * 8 + 1 : t.i * 8 + 4], ' ') AS prefix
      FROM toks, UNNEST(range(0, (len(ws) - 12) // 8 + 1)) AS t(i)
      WHERE len(ws) >= 12
    )
    SELECT a.doc_id, a.chunk_idx AS idx_a, b.chunk_idx AS idx_b,
           a.suffix AS overlap_key
    FROM chunks a JOIN chunks b
      ON a.doc_id = b.doc_id AND b.chunk_idx = a.chunk_idx + 1
     AND a.suffix = b.prefix
    """,
)
def text_overlap_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk re-stitching — the inverse of doc_chunk_overlap: split
    each document into 12-token chunks with stride 8 (4-token
    overlap), then re-link adjacent chunks by matching chunk N's
    4-token suffix to chunk N+1's 4-token prefix. Emitting one row per
    stitched boundary proves the chunker's overlap invariant
    corpus-wide — the integrity check a pipeline runs before training
    on chunked text (a chunk whose neighbor is missing or mismatched
    means data loss between pipeline stages).

    The stitch join is keyed by (doc_id, chunk_idx) — unique keys by
    construction, so no skew regardless of how repetitive the text is;
    the suffix = prefix equality rides along as the verified
    condition. Chunks are generated by a JVM sequence + slice, one
    pass, no shuffle before the join."""
    # round-11 second pass: guarded fan_out — the single-file sf
    # scan ran the tokenize in ONE task; no-op at real scale
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0))
    ws = T.words(F.col("text"))
    toks = d.where(F.size(ws) >= 12).select("doc_id", ws.alias("ws"))
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), ((F.size("ws") - 12) / 8).cast("long"))
        ).alias("chunk_idx"),
        F.col("ws"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(
            " ", F.slice("ws", (F.col("chunk_idx") * 8 + 9).cast("int"), 4)
        ).alias("suffix"),
        F.concat_ws(
            " ", F.slice("ws", (F.col("chunk_idx") * 8 + 1).cast("int"), 4)
        ).alias("prefix"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    return a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.chunk_idx") == F.col("a.chunk_idx") + 1)
        & (F.col("a.suffix") == F.col("b.prefix")),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.chunk_idx").alias("idx_a"),
        F.col("b.chunk_idx").alias("idx_b"),
        F.col("a.suffix").alias("overlap_key"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, MIN(event_id) AS view_id
      FROM events WHERE event_type = 'view' AND user_id % 4 = 0
      GROUP BY user_id, ts
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase' AND user_id % 4 = 0
    ),
    ranked AS (
      SELECT p.purchase_id, p.user_id, v.view_id,
             abs(epoch_us(p.ts) - epoch_us(v.ts)) AS gap_us,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                 ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)) ASC,
                          v.ts ASC, v.view_id ASC) AS rn
      FROM p JOIN v ON p.user_id = v.user_id
    )
    SELECT purchase_id, user_id, view_id, gap_us
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (pandas merge_asof
    direction='nearest'): each purchase matches the view closest in
    time, before OR after — the operator the backward-only as-of
    (join_asof / join_asof_by_key) can't express.

    Implementation is the union+window merge, bidirectional: views and
    purchases interleave in ONE per-user time-sorted stream; a
    trailing last(ignorenulls) carries the backward candidate and a
    leading first(ignorenulls) the forward candidate, then a
    deterministic comparator picks the nearer (ties → the earlier
    view; views are pre-deduplicated to one per (user, ts) so the
    candidate at any distance is unique). One shuffle by user_id, no
    join against the events side at all — the oracle's O(n*m)
    pairwise rank is exactly what this plan avoids at scale."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 4 == 0)
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("view_id"))
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "view_id",
            F.lit(None).cast("long").alias("purchase_id"),
            F.lit(0).alias("kind"),
        )
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lit(None).cast("long").alias("view_id"),
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("kind"),
    )
    u = v.unionByName(p)
    order = Window.partitionBy("user_id").orderBy("ts_us", "kind", "view_id")
    past = order.rowsBetween(Window.unboundedPreceding, 0)
    future = order.rowsBetween(0, Window.unboundedFollowing)
    merged = (
        u.withColumn("b_ts", F.last(F.when(F.col("kind") == 0, F.col("ts_us")), ignorenulls=True).over(past))
        .withColumn("b_id", F.last(F.when(F.col("kind") == 0, F.col("view_id")), ignorenulls=True).over(past))
        .withColumn("f_ts", F.first(F.when(F.col("kind") == 0, F.col("ts_us")), ignorenulls=True).over(future))
        .withColumn("f_id", F.first(F.when(F.col("kind") == 0, F.col("view_id")), ignorenulls=True).over(future))
        .where(F.col("kind") == 1)
    )
    bdiff = F.col("ts_us") - F.col("b_ts")
    fdiff = F.col("f_ts") - F.col("ts_us")
    take_backward = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (bdiff <= fdiff)
    )
    return merged.where(
        F.col("b_ts").isNotNull() | F.col("f_ts").isNotNull()
    ).select(
        "purchase_id",
        "user_id",
        F.when(take_backward, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "view_id"
        ),
        F.when(take_backward, bdiff).otherwise(fdiff).alias("gap_us"),
    )


@query(
    "text_ngram_containment",
    oracle="""
    WITH shingles AS (
      SELECT DISTINCT doc_id, shingle
      FROM (
        SELECT doc_id,
               array_to_string(words[i : i + 2], ' ') AS shingle
        FROM (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'), w -> w <> '')
                   AS words
          FROM documents WHERE doc_id < 100
        ), UNNEST(range(1, len(words) - 1)) AS t(i)
        WHERE len(words) >= 3
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both_n
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(ROUND(CAST(both_n / CAST(sa.n AS DOUBLE)
                AS DECIMAL(24,10)), 6) AS DOUBLE) AS containment
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
    WHERE both_n / CAST(sa.n AS DOUBLE) >= 0.1
    """,
)
def text_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment |A∩B| / |A|: detects when
    document A is (mostly) CONTAINED in document B — quotes, excerpts
    and supersets that symmetric Jaccard under-scores (a short doc
    fully quoted inside a long one has low Jaccard but containment
    1.0). The directed complement of dedup_ngram_jaccard; ordered
    pairs are emitted both ways.

    Same sparse inverted-index shape as the Jaccard twin: only
    documents sharing a shingle pair up, sizes join on the
    dimension-keyed aggregate — never an all-pairs comparison."""
    # round-11 second pass: guarded fan_out — the single-file sf
    # scan ran the tokenize in ONE task; no-op at real scale
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100))
    sh = (
        d.where(F.size(T.words(F.col("text"))) >= 3)
        .select(
            "doc_id",
            F.explode(T.word_shingles(F.col("text"), 3)).alias("shingle"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("both_n"))
    )
    containment = F.col("both_n") / F.col("n").cast("double")
    return (
        inter.join(F.broadcast(sizes), F.col("doc_a") == F.col("doc_id"))
        .where(containment >= 0.1)
        .select("doc_a", "doc_b", _r(containment, 6).alias("containment"))
    )


@query(
    "agg_higher_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(l_extendedprice) AS s1,
             SUM(l_extendedprice * l_extendedprice) AS s2,
             SUM(l_extendedprice * l_extendedprice * l_extendedprice) AS s3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(ROUND(CAST(
             (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
             / power(s2 / n - (s1 / n) * (s1 / n), 1.5)
             AS DECIMAL(24,10)), 5) AS DOUBLE) AS skew
    FROM s
    """,
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third standardized moment (skewness) from raw power sums —
    single-pass, map-side-combinable: m3 = E[x³] − 3μE[x²] + 2μ³ over
    the central second moment^1.5. Computed from explicit sums rather
    than the engines' skewness() builtins, whose bias corrections
    (population vs sample g1/G1) differ across engines — the moment
    expansion is the form that is both distributable and
    engine-portable."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
    )
    n, s1, s2, s3 = F.col("n"), F.col("s1"), F.col("s2"), F.col("s3")
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
    return s.select(
        "l_returnflag", "n", _r(m3 / F.pow(m2, 1.5), 5).alias("skew")
    )


@query(
    "ts_autocorr_lag1",
    oracle="""
    WITH lagged AS (
      SELECT user_id, value,
             LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events
    )
    SELECT user_id, COUNT(*) AS n_pairs,
           CAST(ROUND(CAST(corr(value, prev) AS DECIMAL(24,10)), 5)
                AS DOUBLE) AS acf1
    FROM lagged WHERE prev IS NOT NULL
    GROUP BY user_id HAVING COUNT(*) >= 2
    """,
)
def ts_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per user: Pearson correlation between
    each value and its predecessor in event-time order — the
    mean-reversion / momentum diagnostic (ACF at lag 1) and the
    stationarity smell test run before fitting any forecasting model.

    One shuffle by user_id serves the LAG window AND the correlation
    aggregate (same partitioning); corr() accumulates co-moments
    map-side, so the pairs never materialize beyond their partition."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.withColumn("prev", F.lag("value").over(w)).where(
        F.col("prev").isNotNull()
    )
    return (
        lagged.groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            _r(F.corr("value", "prev"), 5).alias("acf1"),
        )
        .where(F.col("n_pairs") >= 2)
    )


@query(
    "join_interval_overlap_bucketed",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  <= 1800 * 1000000 THEN 0 ELSE 1 END AS is_new
      FROM events WHERE user_id % 20 = 0
    ),
    sessions AS (
      SELECT user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid, ts_us
      FROM flagged
    ),
    iv AS (SELECT user_id, CAST(sid AS BIGINT) AS sid,
                  MIN(ts_us) AS s, MAX(ts_us) AS e
           FROM sessions GROUP BY user_id, sid)
    SELECT a.user_id AS user_a, a.sid AS sid_a,
           b.user_id AS user_b, b.sid AS sid_b,
           LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS overlap_us
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
    """,
)
def join_interval_overlap_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via time-bucket pre-join — the scalable
    pattern for "which intervals overlap" (concurrent sessions,
    IP-range hits, reservation conflicts): each session interval
    explodes into the coarse day-buckets it spans, candidates come
    from an EQUI-join on bucket (hash-partitionable!), and the exact
    overlap predicate filters candidates. A naive theta join
    (a.s <= b.e AND b.s <= a.e) is O(n·m) nested-loop work no
    distributed engine can partition; the bucket trick makes the join
    key hashable at the cost of bucket-width slack rows filtered
    after. The oracle IS that theta join — DuckDB's IEJoin handles it
    single-node, which is exactly the luxury a 1000-executor plan
    doesn't have.

    Intervals here are the gaps-and-islands sessions (ts_gaps_islands)
    of a user subset; overlapping pairs across distinct users =
    concurrent activity."""
    day_us = 86_400 * 1_000_000
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 20 == 0)
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = e.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    ).withColumn(
        "is_new",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(order) <= 1800 * 1_000_000,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    iv = (
        flagged.withColumn(
            "sid",
            F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts_us").alias("s"), F.max("ts_us").alias("e"))
    )
    bucketed = iv.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("s") / day_us).cast("long"), (F.col("e") / day_us).cast("long")
            )
        ),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .where((F.col("a.s") <= F.col("b.e")) & (F.col("b.s") <= F.col("a.e")))
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.sid").alias("sid_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.sid").alias("sid_b"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("overlap_us"),
        )
        .distinct()
    )


@query(
    "ts_seasonal_profile",
    oracle="""
    SELECT CAST(date_part('dow', ts) AS BIGINT) AS dow,
           CAST(date_part('hour', ts) AS BIGINT) AS hour,
           COUNT(*) AS n_events,
           CAST(ROUND(CAST(AVG(value) AS DECIMAL(24,10)), 4) AS DOUBLE)
             AS mean_value
    FROM events GROUP BY 1, 2
    """,
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: mean activity per (day-of-week,
    hour-of-day) cell — the seasonal component a forecasting pipeline
    subtracts before modeling residuals, and the load-shape input to
    capacity planning. One partial-aggregated pass; the output is
    bounded at 7 × 24 rows regardless of input scale. Calendar
    bucketing is UTC-pinned (plans/catalog.py), so both engines cut
    weeks identically (Spark dayofweek is 1-based Sunday, DuckDB dow
    is 0-based Sunday — aligned with a -1)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(
            F.count("*").alias("n_events"),
            _r(F.avg("value"), 4).alias("mean_value"),
        )
    )


@query(
    "ts_resample_interpolate",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE user_id % 20 = 0
    ),
    spans AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS lo, MAX(ts) AS hi
      FROM ev GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 6 HOUR)) AS gts
      FROM spans
    ),
    tagged AS (
      SELECT user_id, ts, epoch_us(ts) AS ts_us, value, 0 AS is_grid FROM ev
      UNION ALL
      SELECT user_id, gts AS ts, epoch_us(gts) AS ts_us, NULL AS value,
             1 AS is_grid
      FROM grid
    ),
    carried AS (
      SELECT user_id, ts_us, is_grid,
             LAST_VALUE(value IGNORE NULLS) OVER w_past AS pv,
             LAST_VALUE(CASE WHEN is_grid = 0 THEN ts_us END IGNORE NULLS)
               OVER w_past AS pt,
             FIRST_VALUE(value IGNORE NULLS) OVER w_future AS nv,
             FIRST_VALUE(CASE WHEN is_grid = 0 THEN ts_us END IGNORE NULLS)
               OVER w_future AS nt
      FROM tagged
      WINDOW w_past AS (PARTITION BY user_id ORDER BY ts_us, is_grid
                        ROWS UNBOUNDED PRECEDING),
             w_future AS (PARTITION BY user_id ORDER BY ts_us, is_grid
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, ts_us AS grid_ts_us,
           CAST(ROUND(CAST(CASE
             WHEN nt IS NULL OR nt = pt THEN pv
             ELSE pv + (nv - pv) * (ts_us - pt) / (nt - pt)
           END AS DECIMAL(24,10)), 4) AS DOUBLE) AS interp_value
    FROM carried WHERE is_grid = 1 AND pv IS NOT NULL
    """,
)
def ts_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample with LINEAR INTERPOLATION — the companion to
    ts_resample_ffill for continuous signals (sensor readings,
    prices): each 6-hour grid point gets the straight-line value
    between its surrounding events; flat extrapolation after the last
    event. Same keyed union-and-window merge, now with BOTH a
    trailing carry (previous event's ts+value) and a leading carry
    (next event's) — still one shuffle by user, grid generated from a
    per-user aggregate, never the driver."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 20 == 0)
    ev = e.select("user_id", "ts", "value")
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.max("ts").alias("hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 6 HOURS"))).alias("gts"),
    )
    tagged = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.lit(0).alias("is_grid"),
    ).unionByName(
        grid.select(
            "user_id",
            F.unix_micros("gts").alias("ts_us"),
            F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"),
        )
    )
    order = Window.partitionBy("user_id").orderBy("ts_us", "is_grid")
    past = order.rowsBetween(Window.unboundedPreceding, 0)
    future = order.rowsBetween(0, Window.unboundedFollowing)
    ev_ts = F.when(F.col("is_grid") == 0, F.col("ts_us"))
    carried = (
        tagged.withColumn("pv", F.last("value", ignorenulls=True).over(past))
        .withColumn("pt", F.last(ev_ts, ignorenulls=True).over(past))
        .withColumn("nv", F.first("value", ignorenulls=True).over(future))
        .withColumn("nt", F.first(ev_ts, ignorenulls=True).over(future))
        .where((F.col("is_grid") == 1) & F.col("pv").isNotNull())
    )
    interp = F.when(
        F.col("nt").isNull() | (F.col("nt") == F.col("pt")), F.col("pv")
    ).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (F.col("ts_us") - F.col("pt"))
        / (F.col("nt") - F.col("pt"))
    )
    return carried.select(
        "user_id",
        F.col("ts_us").alias("grid_ts_us"),
        _r(interp, 4).alias("interp_value"),
    )


@query(
    "ts_changepoint_meanshift",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(ROUND(CAST(value AS DECIMAL(24,10)) * 100, 0) AS BIGINT) AS val_c,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS k
      FROM events WHERE user_id % 15 = 0
    ),
    pref AS (
      SELECT user_id, k, val_c,
             SUM(val_c) OVER (PARTITION BY user_id ORDER BY k
                              ROWS UNBOUNDED PRECEDING) AS ps,
             SUM(val_c) OVER (PARTITION BY user_id) AS total,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM ev
    ),
    scored AS (
      SELECT user_id, k, n,
             abs(ps / CAST(k AS DOUBLE)
                 - (total - ps) / CAST(n - k AS DOUBLE)) AS shift_c
      FROM pref WHERE k < n
    )
    SELECT user_id, k AS split_at, CAST(n AS BIGINT) AS n_events,
           CAST(ROUND(CAST(shift_c / 100 AS DECIMAL(24,10)), 4) AS DOUBLE)
             AS mean_shift
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY shift_c DESC, k ASC) AS rn FROM scored)
    WHERE rn = 1
    """,
)
def ts_changepoint_meanshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection (largest mean shift): for each
    user, the split position k maximizing |mean(first k) − mean(rest)|
    — the one-pass CUSUM-style scan behind drift alarms and A/B
    phase detection.

    All O(n) per user from ONE ordered window pass: prefix sums give
    every split's two means simultaneously; the argmax is a second
    window over the same partitioning (no extra shuffle). Values are
    scaled to exact integer cents before summing, so both engines fold
    identical integers and the derived IEEE doubles — and therefore
    the argmax — are bit-identical (float prefix sums would make the
    tie-break engine-dependent)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 15 == 0)
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = e.select(
        "user_id",
        F.round(F.col("value").cast("decimal(24,10)") * 100, 0)
        .cast("long")
        .alias("val_c"),
        F.row_number().over(order).alias("k"),
    )
    per_user = Window.partitionBy("user_id")
    korder = Window.partitionBy("user_id").orderBy("k")
    pref = (
        ev.withColumn(
            "ps",
            F.sum("val_c").over(korder.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("total", F.sum("val_c").over(per_user))
        .withColumn("n", F.count("*").over(per_user))
        .where(F.col("k") < F.col("n"))
    )
    shift = F.abs(
        F.col("ps") / F.col("k").cast("double")
        - (F.col("total") - F.col("ps")) / (F.col("n") - F.col("k")).cast("double")
    )
    scored = pref.withColumn("shift_c", shift)
    w = Window.partitionBy("user_id").orderBy(
        F.col("shift_c").desc(), F.col("k").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("k").alias("split_at"),
            F.col("n").cast("long").alias("n_events"),
            _r(F.col("shift_c") / 100, 4).alias("mean_shift"),
        )
    )


@query(
    "dedup_source_priority",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY sha256(text)
               ORDER BY CAST(substring(source, 4) AS INTEGER), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_source_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact dedup with SOURCE PRIORITY: when the same
    content arrives from several feeds, keep the copy from the
    highest-priority source (curated beats crawled) — the multi-feed
    ingestion policy, vs dedup_exact_keep_first's neutral lowest-id
    rule. One window over (digest) ordered by (priority, doc_id);
    as everywhere in the dedup family only 32-byte digests and ids
    shuffle, never text."""
    d = load_table(spark, sf_dir, "documents")
    priority = F.substring("source", 4, 10).cast("int")
    w = Window.partitionBy(F.sha2("text", 256)).orderBy(priority, F.col("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "source")
    )


@query(
    "ts_burst_windows",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us
      FROM events WHERE user_id % 12 = 0
    ),
    counted AS (
      SELECT user_id, event_id, ts_us,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_us
                            RANGE BETWEEN CAST(3600 AS BIGINT) * 1000000 PRECEDING
                                      AND CURRENT ROW) AS n_in_hour
      FROM ev
    )
    SELECT user_id, CAST(n_in_hour AS BIGINT) AS burst_size,
           ts_us AS burst_end_us
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY n_in_hour DESC, ts_us ASC, event_id ASC) AS rn
          FROM counted)
    WHERE rn = 1
    """,
)
def ts_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: each user's busiest trailing one-hour window
    (max events within any 60-minute span, anchored at an event) —
    the rate-anomaly primitive behind abuse detection and hotspot
    alerts. A RANGE frame over epoch-microseconds counts the trailing
    hour at every event in ONE per-user window pass (the same
    never-O(n·m) trick as ts_interval_join); the argmax is a second
    window on the same partitioning — one shuffle total."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 12 == 0)
    ev = e.select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
    hour = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    counted = ev.withColumn("n_in_hour", F.count("*").over(hour))
    pick = Window.partitionBy("user_id").orderBy(
        F.col("n_in_hour").desc(), F.col("ts_us").asc(), F.col("event_id").asc()
    )
    return (
        counted.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_in_hour").cast("long").alias("burst_size"),
            F.col("ts_us").alias("burst_end_us"),
        )
    )


@query(
    "agg_ab_welch_t",
    oracle="""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n, SUM(value) AS s1,
             SUM(value * value) AS s2
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n, s1 / n AS mean,
             (s2 - s1 * s1 / n) / (n - 1) AS var
      FROM s
    )
    SELECT a.n AS n_a, b.n AS n_b,
           CAST(ROUND(CAST(a.mean AS DECIMAL(24,10)), 4) AS DOUBLE) AS mean_a,
           CAST(ROUND(CAST(b.mean AS DECIMAL(24,10)), 4) AS DOUBLE) AS mean_b,
           CAST(ROUND(CAST((a.mean - b.mean)
                / sqrt(a.var / a.n + b.var / b.n)
                AS DECIMAL(24,10)), 4) AS DOUBLE) AS t_stat
    FROM (SELECT * FROM m WHERE event_type = 'view') a
    CROSS JOIN (SELECT * FROM m WHERE event_type = 'click') b
    """,
)
def agg_ab_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic between the 'view' and 'click'
    populations — the unequal-variance A/B test core, computed from
    single-pass power sums (n, Σx, Σx²) per arm: no second scan for
    the means, no assumption of equal variance, map-side combinable at
    any scale. The final join is two one-row aggregates."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click")
    )
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    m = s.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("var"),
    )
    a = m.where(F.col("event_type") == "view").alias("a")
    b = m.where(F.col("event_type") == "click").alias("b")
    t = (F.col("a.mean") - F.col("b.mean")) / F.sqrt(
        F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")
    )
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        _r(F.col("a.mean"), 4).alias("mean_a"),
        _r(F.col("b.mean"), 4).alias("mean_b"),
        _r(t, 4).alias("t_stat"),
    )


@query(
    "agg_behavioral_entropy",
    oracle="""
    WITH cnt AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    tot AS (SELECT user_id, SUM(c) AS n FROM cnt GROUP BY user_id)
    SELECT cnt.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(ROUND(CAST(-SUM((c / CAST(n AS DOUBLE))
                 * log2(c / CAST(n AS DOUBLE)))
                AS DECIMAL(24,10)), 5) AS DOUBLE) AS entropy_bits
    FROM cnt JOIN tot ON cnt.user_id = tot.user_id
    GROUP BY cnt.user_id, tot.n
    """,
)
def agg_behavioral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity score: Shannon entropy of each user's
    event-type distribution — bots and single-purpose scripts score
    near 0, organic users near log2(#types); the categorical sibling
    of text_entropy_stats over an activity table. Two partial-
    aggregated passes over (user, type) counts; nothing larger than
    the count table shuffles."""
    e = load_table(spark, sf_dir, "events")
    cnt = e.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    p = F.col("c") / F.col("n")
    return (
        cnt.groupBy("user_id")
        .agg(F.sum("c").alias("n"), F.count("*").alias("n_types"))
        .join(cnt, "user_id")
        .groupBy("user_id", "n", "n_types")
        .agg(_r(-F.sum(p * F.log2(p)), 5).alias("entropy_bits"))
        .select("user_id", "n_types", "entropy_bits")
    )


@query(
    "agg_gini_concentration",
    oracle="""
    WITH spend AS (
      SELECT user_id, SUM(value) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS r,
             COUNT(*) OVER () AS n
      FROM spend
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_users,
           CAST(ROUND(CAST(
             2.0 * SUM(r * x) / (MAX(n) * SUM(x))
             - (MAX(n) + 1.0) / MAX(n)
             AS DECIMAL(24,10)), 5) AS DOUBLE) AS gini
    FROM ranked
    """,
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user purchase spend — the concentration
    / inequality measure (0 = spend spread evenly, →1 = whales
    dominate) behind revenue-risk and data-source-balance audits (the
    same statistic flags a training mix dominated by one domain).

    Computed from the rank-weighted sum formula G = 2Σ(r·x)/(nΣx) −
    (n+1)/n over spend ranked ascending with a unique (x, user_id)
    tiebreak: one aggregation for spend, then a TWO-PHASE global rank
    (twophase.two_phase_ordered — user cardinality grows with the
    data, so even the user-sized aggregate never funnels through one
    task), one final fold."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    spend = e.groupBy("user_id").agg(F.sum("value").alias("x"))
    ranked = two_phase_ordered(
        spend,
        [F.asc("x"), F.asc("user_id")],
        rank_name="r",
        total_name="n",
    ).select("x", "r", "n")
    gini = (
        F.lit(2.0) * F.sum(F.col("r") * F.col("x")) / (F.max("n") * F.sum("x"))
        - (F.max("n") + F.lit(1.0)) / F.max("n")
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_users"),
        _r(gini, 5).alias("gini"),
    )


@query(
    "agg_chi_square_independence",
    oracle="""
    WITH obs AS (
      SELECT event_type, user_id % 2 AS cohort, COUNT(*) AS o
      FROM events GROUP BY event_type, user_id % 2
    ),
    margins AS (
      SELECT event_type, cohort, o,
             SUM(o) OVER (PARTITION BY event_type) AS row_tot,
             SUM(o) OVER (PARTITION BY cohort) AS col_tot,
             SUM(o) OVER () AS n
      FROM obs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MAX((SELECT COUNT(DISTINCT event_type) FROM obs) - 1)
                AS BIGINT) AS dof,
           CAST(ROUND(CAST(SUM(
             (o - row_tot * col_tot / CAST(n AS DOUBLE))
             * (o - row_tot * col_tot / CAST(n AS DOUBLE))
             / (row_tot * col_tot / CAST(n AS DOUBLE))
           ) AS DECIMAL(24,10)), 4) AS DOUBLE) AS chi2
    FROM margins
    """,
)
def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and user
    cohort (user_id parity as the A/B assignment): Σ (O−E)²/E over the
    contingency table, with E = row_total × col_total / N — the
    categorical counterpart of agg_ab_welch_t, the "did the treatment
    change the action mix?" question. The contingency table is
    (types × cohorts) cells — bounded — so every window after the
    first partial-aggregated count pass runs on a handful of rows."""
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", (F.col("user_id") % 2).alias("cohort")
    ).agg(F.count("*").alias("o"))
    margins = (
        obs.withColumn("row_tot", F.sum("o").over(Window.partitionBy("event_type")))
        .withColumn("col_tot", F.sum("o").over(Window.partitionBy("cohort")))
        .withColumn("n", F.sum("o").over(Window.partitionBy()))
    )
    expected = F.col("row_tot") * F.col("col_tot") / F.col("n").cast("double")
    chi2 = F.sum((F.col("o") - expected) * (F.col("o") - expected) / expected)
    n_types = obs.select("event_type").distinct().count()
    return margins.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.lit(n_types - 1).cast("long").alias("dof"),
        _r(chi2, 4).alias("chi2"),
    )


@query(
    "mix_kl_divergence",
    oracle="""
    WITH p AS (
      SELECT source, COUNT(*) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS pi
      FROM documents GROUP BY source
    ),
    k AS (SELECT COUNT(*) AS n_sources FROM p)
    SELECT CAST(MAX(k.n_sources) AS BIGINT) AS n_sources,
           CAST(ROUND(CAST(SUM(pi * log2(pi * k.n_sources))
                AS DECIMAL(24,10)), 5) AS DOUBLE) AS kl_from_uniform_bits
    FROM p CROSS JOIN k
    """,
)
def mix_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of the corpus source mix from the uniform target
    (bits): D(P‖U) = Σ p_i · log2(p_i·K) — the single-number
    imbalance diagnostic for a training mixture (0 = perfectly
    balanced; rebalance via mix_temperature_sampling when it drifts).
    Source shares come from one partial-aggregated count; every
    window afterward runs over the source-cardinality table."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("c"))
    p = counts.withColumn(
        "pi", F.col("c") / F.sum("c").over(Window.partitionBy()).cast("double")
    )
    k = F.count("*").over(Window.partitionBy())
    scored = p.withColumn("term", F.col("pi") * F.log2(F.col("pi") * k)).withColumn(
        "n_sources", k
    )
    return scored.agg(
        F.max("n_sources").cast("long").alias("n_sources"),
        _r(F.sum("term"), 5).alias("kl_from_uniform_bits"),
    )


@query(
    "ts_velocity_features",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
      FROM events WHERE user_id % 25 = 0
    )
    SELECT event_id, user_id,
           CAST(ts_us - LAG(ts_us) OVER w AS BIGINT) AS us_since_prev,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_us
                RANGE BETWEEN CAST(86400 AS BIGINT) * 1000000 PRECEDING
                          AND CURRENT ROW) - 1 AS BIGINT) AS n_prev_24h,
           CAST(ROUND(CAST(value - LAG(value) OVER w AS DECIMAL(24,10)), 4)
                AS DOUBLE) AS value_delta
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    """,
)
def ts_velocity_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity feature engineering — the per-event feature row a
    fraud/abuse model consumes: time since the user's previous event,
    how many events the user produced in the trailing 24 h, and the
    value delta. Three window expressions over ONE user_id shuffle
    (the LAG pair shares a frame; the 24 h count is a RANGE frame on
    epoch-microseconds) — feature generation at 100 TB is exactly
    this shape: wide projections over a single keyed sort, never a
    self-join per feature."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 25 == 0)
    ev = e.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    day = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-86400 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("us_since_prev"),
        (F.count("*").over(day) - 1).cast("long").alias("n_prev_24h"),
        F.round(
            (F.col("value") - F.lag("value").over(w)).cast("decimal(24,10)"), 4
        )
        .cast("double")
        .alias("value_delta"),
    )


@query(
    "agg_distinct_aggregates",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(CAST(SUM(DISTINCT l_quantity) AS DECIMAL(24,10)), 2)
                AS DOUBLE) AS sum_distinct_qty,
           CAST(ROUND(CAST(AVG(DISTINCT l_quantity) AS DECIMAL(24,10)), 6)
                AS DOUBLE) AS avg_distinct_qty,
           CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS n_linenumbers
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates beyond COUNT: SUM(DISTINCT) / AVG(DISTINCT)
    — compiled by Catalyst into the two-level Expand + aggregate plan
    (dedupe per group first, then aggregate), so the distinct set
    itself never materializes driver-side. Mixing several DISTINCT
    aggregates in one query exercises the multi-distinct rewrite."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _r(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"),
        F.round(F.expr("avg(DISTINCT l_quantity)").cast("decimal(24,10)"), 6)
        .cast("double")
        .alias("avg_distinct_qty"),
        F.count_distinct(F.col("l_linenumber")).cast("long").alias(
            "n_linenumbers"
        ),
    )


@query(
    "window_ignore_nulls_carry",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
      FROM events WHERE user_id % 11 = 0
    )
    SELECT event_id, user_id,
           CAST(ROUND(CAST(LAST_VALUE(purchase_value IGNORE NULLS) OVER w
                AS DECIMAL(24,10)), 4) AS DOUBLE) AS last_purchase_value,
           CAST(ROUND(CAST(FIRST_VALUE(purchase_value IGNORE NULLS) OVER w2
                AS DECIMAL(24,10)), 4) AS DOUBLE) AS next_purchase_value
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS UNBOUNDED PRECEDING),
           w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    """,
)
def window_ignore_nulls_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS analytics as a first-class query: at every event,
    the user's most recent purchase amount (trailing last, skipping
    the NULLs that non-purchase events produce) and the next one
    (leading first) — the carry operators behind last-touch
    attribution and "time since last conversion" features, exposed
    directly rather than buried inside the as-of merge internals.
    One shuffle by user serves both directions."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 11 == 0)
    base = e.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "purchase_value"
        ),
    )
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    past = order.rowsBetween(Window.unboundedPreceding, 0)
    future = order.rowsBetween(0, Window.unboundedFollowing)
    return base.select(
        "event_id",
        "user_id",
        F.round(
            F.last("purchase_value", ignorenulls=True).over(past).cast(
                "decimal(24,10)"
            ),
            4,
        )
        .cast("double")
        .alias("last_purchase_value"),
        F.round(
            F.first("purchase_value", ignorenulls=True).over(future).cast(
                "decimal(24,10)"
            ),
            4,
        )
        .cast("double")
        .alias("next_purchase_value"),
    )


@query(
    "agg_ab_tost_equivalence",
    oracle="""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n, SUM(value) AS s1,
             SUM(value * value) AS s2
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n, s1 / n AS mean,
             (s2 - s1 * s1 / n) / (n - 1) AS var
      FROM s
    ),
    t AS (
      SELECT a.n AS n_a, b.n AS n_b,
             a.mean - b.mean AS diff,
             sqrt(a.var / a.n + b.var / b.n) AS se,
             0.10 * (a.mean + b.mean) / 2 AS margin
      FROM (SELECT * FROM m WHERE event_type = 'view') a
      CROSS JOIN (SELECT * FROM m WHERE event_type = 'click') b
    )
    SELECT n_a, n_b,
           CAST(ROUND(CAST(diff AS DECIMAL(24,10)), 4) AS DOUBLE) AS diff,
           CAST(ROUND(CAST((diff + margin) / se AS DECIMAL(24,10)), 4)
             AS DOUBLE) AS t_lower,
           CAST(ROUND(CAST((diff - margin) / se AS DECIMAL(24,10)), 4)
             AS DOUBLE) AS t_upper,
           (CAST(ROUND(CAST((diff + margin) / se AS DECIMAL(24,10)), 4)
              AS DOUBLE) > 1.645
            AND
            CAST(ROUND(CAST((diff - margin) / se AS DECIMAL(24,10)), 4)
              AS DOUBLE) < -1.645) AS equivalent
    FROM t
    """,
)
def agg_ab_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (two one-sided tests, Schuirmann 1987):
    the A/B question a plain t-test can't answer — "are these arms
    the SAME, within ±10%?" — needs BOTH one-sided nulls rejected:
    diff > -margin (t_lower > z_0.95) AND diff < +margin (t_upper <
    -z_0.95).  Failing to reject a difference is not evidence of
    equivalence; TOST is.

    Same single-pass power-sum shape as agg_ab_welch_t (n, Σx, Σx²
    per arm — map-side combinable at any scale; the final join is two
    one-row aggregates).  The equivalence VERDICT compares the
    ROUNDED statistics against the critical value, so the boolean is
    exactly as cross-engine-stable as the statistics themselves."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click")
    )
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    m = s.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("var"),
    )
    a = m.where(F.col("event_type") == "view").alias("a")
    b = m.where(F.col("event_type") == "click").alias("b")
    diff = F.col("a.mean") - F.col("b.mean")
    se = F.sqrt(F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n"))
    margin = F.lit(0.10) * (F.col("a.mean") + F.col("b.mean")) / 2
    t_lower = _r((diff + margin) / se, 4)
    t_upper = _r((diff - margin) / se, 4)
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        _r(diff, 4).alias("diff"),
        t_lower.alias("t_lower"),
        t_upper.alias("t_upper"),
        ((t_lower > 1.645) & (t_upper < -1.645)).alias("equivalent"),
    )

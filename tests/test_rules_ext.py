"""Quality gates for rules_ext: association-rule metric identities,
row-pattern matching cross-checked against Python's regex engine on an
independently rebuilt sequence, WOE/IV encoding identities, and the
scaling suite re-derived from pandas group statistics."""

from __future__ import annotations

import math
import re

import pandas as pd

from guidewire_spark.operators.rules_ext import (
    feature_scaling_suite,
    feature_woe_iv,
    mining_association_rules,
    mining_sequence_trigrams,
    sql_recursive_hierarchy,
    sql_row_pattern_match,
    ts_holt_forecast_exact,
)
from guidewire_spark.plans.catalog import load_table


def test_association_rule_metric_identities(spark, sf_dir):
    got = mining_association_rules(spark, sf_dir).toPandas()
    assert len(got) > 0
    # pair orientation and count bounds
    assert (got["brand_a"] < got["brand_b"]).all()
    assert (got["n_ab"] <= got[["n_a", "n_b"]].min(axis=1)).all()
    assert (got["n_ab"] >= 5).all()
    # metric identities from the exact counts
    for _, r in got.iterrows():
        assert math.isclose(r["support"], round(r["n_ab"] / r["n_baskets"], 6),
                            abs_tol=1e-9)
        assert math.isclose(r["confidence"], round(r["n_ab"] / r["n_a"], 6),
                            abs_tol=1e-9)
        lift = r["n_ab"] * r["n_baskets"] / (r["n_a"] * r["n_b"])
        assert math.isclose(r["lift"], round(lift, 6), abs_tol=1e-9)
    # a pair's support can never exceed either item's marginal support
    assert (got["n_ab"] <= got["n_baskets"]).all()


def test_row_pattern_matches_python_regex(spark, sf_dir):
    got = sql_row_pattern_match(spark, sf_dir).toPandas()
    assert len(got) > 0
    events = load_table(spark, sf_dir, "events").toPandas()
    sym = {"view": "v", "click": "c", "purchase": "p", "signup": "s",
           "error": "e"}
    events["sym"] = events["event_type"].map(sym)
    events = events.sort_values(["ts", "event_id"])
    seqs = events.groupby("user_id")["sym"].agg("".join)
    expected = {
        uid: len(re.findall("vc+p", s))
        for uid, s in seqs.items()
        if re.findall("vc+p", s)
    }
    assert dict(zip(got["user_id"], got["n_matches"])) == expected
    # seq_len is the user's full event count
    counts = events.groupby("user_id").size()
    for _, r in got.iterrows():
        assert r["seq_len"] == counts[r["user_id"]]


def test_woe_iv_identities(spark, sf_dir):
    got = feature_woe_iv(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").toPandas()
    assert len(got) == docs["source"].nunique()
    g = got["n_good"].sum()
    b = got["n_bad"].sum()
    k = len(got)
    assert g + b == len(docs)
    for _, r in got.iterrows():
        woe = math.log(((r["n_good"] + 0.5) * (b + 0.5 * k))
                       / ((r["n_bad"] + 0.5) * (g + 0.5 * k)))
        assert math.isclose(r["woe"], round(woe, 6), abs_tol=1e-9)
        dg = (r["n_good"] + 0.5) / (g + 0.5 * k)
        db = (r["n_bad"] + 0.5) / (b + 0.5 * k)
        # IV term reuses the QUANTIZED woe (the module's doctrine)
        assert math.isclose(r["iv_term"], round((dg - db) * r["woe"], 6),
                            abs_tol=1e-9)
    # smoothed shares each sum to 1 => the share gaps sum to 0
    dg_total = ((got["n_good"] + 0.5) / (g + 0.5 * k)).sum()
    db_total = ((got["n_bad"] + 0.5) / (b + 0.5 * k)).sum()
    assert math.isclose(dg_total, 1.0) and math.isclose(db_total, 1.0)


def test_sequence_trigrams_match_pandas(spark, sf_dir):
    got = mining_sequence_trigrams(spark, sf_dir).toPandas()
    assert len(got) > 0
    events = load_table(spark, sf_dir, "events").toPandas()
    events = events.sort_values(["ts", "event_id"])
    users = {}
    occ = {}
    for uid, grp in events.groupby("user_id"):
        types = list(grp["event_type"])
        seen = set()
        for i in range(len(types) - 2):
            tri = ">".join(types[i : i + 3])
            occ[tri] = occ.get(tri, 0) + 1
            seen.add(tri)
        for tri in seen:
            users[tri] = users.get(tri, 0) + 1
    expected = {t: (u, occ[t]) for t, u in users.items() if u >= 5}
    assert {
        r["trigram"]: (r["n_users"], r["n_occurrences"])
        for _, r in got.iterrows()
    } == expected


def test_recursive_hierarchy_partitions_all_customers(spark, sf_dir):
    got = sql_recursive_hierarchy(spark, sf_dir).toPandas()
    cust = load_table(spark, sf_dir, "customer").toPandas()
    # the recursion reaches every customer exactly once
    assert got["n_nodes"].sum() == len(cust)
    assert got["sum_keys"].sum() == cust["c_custkey"].sum()
    # levels are the div-7 hierarchy: each level's max key < 7^depth
    for _, r in got.iterrows():
        assert r["max_key"] < 7 ** r["depth"]
    assert got["depth"].min() == 1


def test_holt_forecast_matches_pure_python(spark, sf_dir):
    got = ts_holt_forecast_exact(spark, sf_dir).toPandas()
    events = load_table(spark, sf_dir, "events").toPandas()
    assert len(got) == events["user_id"].nunique()

    def tdiv2(a):
        return a // 2 if a >= 0 else -((-a) // 2)

    events = events.sort_values(["ts", "event_id"])
    from decimal import ROUND_HALF_UP, Decimal

    for uid, grp in list(events.groupby("user_id"))[:5]:
        ys = [
            int(
                (Decimal(str(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))
                * 1000000
            )
            for v in grp["value"]
        ]
        level, trend = ys[1], ys[1] - ys[0]
        for y in ys[2:]:
            nl = tdiv2(y + level + trend)
            trend = tdiv2(trend + (nl - level))
            level = nl
        row = got[got["user_id"] == uid].iloc[0]
        assert row["level_micros"] == level
        assert row["trend_micros"] == trend
        assert row["forecast3_micros"] == level + 3 * trend
        assert row["n_obs"] == len(ys)


def test_psi_drift_identities(spark, sf_dir):
    from guidewire_spark.operators.rules_ext import dq_psi_drift

    got = dq_psi_drift(spark, sf_dir).toPandas()
    events = load_table(spark, sf_dir, "events").toPandas()
    # 10 decile bins partitioning both halves completely
    assert sorted(got["bin"]) == list(range(10))
    assert got["n_base"].sum() + got["n_cur"].sum() == len(events)
    # baseline deciles: each bin holds ~10% of the baseline half
    tb = got["n_base"].sum()
    assert ((got["n_base"] - tb / 10).abs() <= tb * 0.02 + 2).all()
    # psi_term sign follows the share gap, and reuses the quantized ln
    tc = got["n_cur"].sum()
    for _, r in got.iterrows():
        pc = (r["n_cur"] + 0.5) / (tc + 5.0)
        pb = (r["n_base"] + 0.5) / (tb + 5.0)
        assert math.isclose(r["psi_term"], round((pc - pb) * r["ln_ratio"], 6),
                            abs_tol=1e-9)
    # a distribution compared against itself would give PSI ~ 0; the
    # two halves of the same generator should be close to stable
    assert abs(got["psi_term"].sum()) < 0.25


def test_position_attribution_matches_pandas(spark, sf_dir):
    from guidewire_spark.operators.rules_ext import attribution_position_based

    got = attribution_position_based(spark, sf_dir).toPandas()
    events = load_table(spark, sf_dir, "events").toPandas()
    events = events.sort_values(["ts", "event_id"])
    totals = {}
    counts = {}
    for _, grp in events.groupby("user_id"):
        segs = {}
        seg_converts = set()
        s = 0
        for _, r in grp.iterrows():
            if r["event_type"] in ("view", "click", "signup"):
                segs.setdefault(s, []).append(r["event_type"])
            if r["event_type"] == "purchase":
                seg_converts.add(s)
                s += 1
        for si in seg_converts:
            touches = segs.get(si, [])
            k = len(touches)
            for pos, ch in enumerate(touches, 1):
                if k == 1:
                    c = 1000000
                elif k == 2:
                    c = 500000
                elif pos in (1, k):
                    c = 400000
                else:
                    c = 200000 // (k - 2)
                totals[ch] = totals.get(ch, 0) + c
                counts[ch] = counts.get(ch, 0) + 1
    assert {
        r["channel"]: (r["n_touches"], r["total_credit_micros"])
        for _, r in got.iterrows()
    } == {ch: (counts[ch], totals[ch]) for ch in totals}


def test_source_overlap_matrix_bounds_and_one_pair(spark, sf_dir):
    import re as _re

    from guidewire_spark.operators.rules_ext import mix_source_overlap_matrix

    got = mix_source_overlap_matrix(spark, sf_dir).toPandas()
    assert len(got) > 0
    assert (got["source_a"] < got["source_b"]).all()
    assert (got["n_inter"] <= got[["n_a", "n_b"]].min(axis=1)).all()
    assert ((got["jaccard"] > 0) & (got["jaccard"] <= 1)).all()
    # recompute the heaviest pair's intersection exactly
    docs = load_table(spark, sf_dir, "documents").toPandas()

    def shingles_of(src):
        out = set()
        for t in docs[docs["source"] == src]["text"]:
            ws = [w for w in _re.split(r"\s+", t) if w]
            out.update(
                " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
            )
        return out

    top = got.sort_values("n_inter", ascending=False).iloc[0]
    sa = shingles_of(top["source_a"])
    sb = shingles_of(top["source_b"])
    assert top["n_inter"] == len(sa & sb)
    assert top["n_a"] == len(sa) and top["n_b"] == len(sb)


def test_ab_assignment_is_stable_and_srm_math_checks(spark, sf_dir):
    import hashlib

    from guidewire_spark.operators.rules_ext import agg_ab_assignment_srm

    got = agg_ab_assignment_srm(spark, sf_dir).toPandas().iloc[0]
    cust = load_table(spark, sf_dir, "customer").toPandas()
    arms = {
        k: "A"
        if hashlib.md5(f"exp42:{k}".encode()).hexdigest()[-1] in "01234567"
        else "B"
        for k in cust["c_custkey"]
    }
    n_a = sum(1 for v in arms.values() if v == "A")
    n_b = len(arms) - n_a
    assert (got["n_a"], got["n_b"]) == (n_a, n_b)
    chi2 = (n_a - n_b) ** 2 / (n_a + n_b)
    assert math.isclose(got["srm_chi2"], round(chi2, 6), abs_tol=1e-9)
    assert got["srm_flag"] == (chi2 > 3.841)


def test_adamic_adar_matches_pure_python(spark, sf_dir):
    import math as _m

    from guidewire_spark.operators.rules_ext import graph_adamic_adar

    got = graph_adamic_adar(spark, sf_dir).toPandas()
    assert len(got) == 20
    orders = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    j = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    edges = sorted(set(zip(j["o_custkey"], j["l_suppkey"])))
    by_c = {}
    for c, s in edges:
        by_c.setdefault(c, []).append(s)
    scores, commons = {}, {}
    for c, ss in by_c.items():
        ss = sorted(ss)[:10]  # the cap, smallest keys
        if len(ss) < 2:
            continue
        term = round(1000000.0 / _m.log(len(ss)))
        for i in range(len(ss)):
            for k in range(i + 1, len(ss)):
                key = (ss[i], ss[k])
                scores[key] = scores.get(key, 0) + term
                commons[key] = commons.get(key, 0) + 1
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expected = [
        (a, b, commons[(a, b)], ppm) for (a, b), ppm in top
    ]
    assert [
        (r["s1"], r["s2"], r["common"], r["aa_ppm"])
        for _, r in got.iterrows()
    ] == expected


def test_recursive_rollup_conserves_totals(spark, sf_dir):
    from guidewire_spark.operators.rules_ext import sql_recursive_cost_rollup

    got = sql_recursive_cost_rollup(spark, sf_dir).toPandas()
    cust = load_table(spark, sf_dir, "customer").toPandas()
    cents = (cust["c_acctbal"].round(2) * 100).round().astype("int64")
    # the root subsumes every customer exactly once
    root = got[got["node"] == 0].iloc[0]
    assert root["n_subtree"] == len(cust)
    assert root["subtree_cents"] == cents.sum()
    # each depth-1 node's subtree: itself + descendants via repeated div-7
    parent = {k: k // 7 for k in cust["c_custkey"]}

    def in_subtree(k, node):
        while True:
            if k == node:
                return True
            if k == 0:
                return False
            k = parent.get(k, k // 7)

    for node in (1, 6, 13, 48):
        sub = got[got["node"] == node]
        expect = sum(1 for k in cust["c_custkey"] if in_subtree(k, node))
        if expect:
            assert sub.iloc[0]["n_subtree"] == expect
        else:
            assert sub.empty


def test_pacf_matches_numpy(spark, sf_dir):
    import numpy as np

    from guidewire_spark.operators.rules_ext import ts_pacf_lag2

    got = ts_pacf_lag2(spark, sf_dir).toPandas()
    assert len(got) > 0
    events = load_table(spark, sf_dir, "events").toPandas()
    events = events.sort_values(["ts", "event_id"])
    for uid, grp in list(events.groupby("user_id"))[:5]:
        v = grp["value"].to_numpy()
        if len(v) < 12:
            continue
        x, p1, p2 = v[2:], v[1:-1], v[:-2]
        r1 = round(float(np.corrcoef(x, p1)[0, 1]), 5)
        r2 = round(float(np.corrcoef(x, p2)[0, 1]), 5)
        row = got[got["user_id"] == uid].iloc[0]
        assert math.isclose(row["r1"], r1, abs_tol=2e-5)
        assert math.isclose(row["r2"], r2, abs_tol=2e-5)
        pacf2 = (row["r2"] - row["r1"] ** 2) / (1 - row["r1"] ** 2)
        assert math.isclose(row["pacf2"], round(pacf2, 5), abs_tol=1e-9)
        assert -1.01 <= row["pacf2"] <= 1.01


def test_blocking_quality_brute_force(spark, sf_dir):
    from guidewire_spark.operators.rules_ext import er_blocking_quality

    got = er_blocking_quality(spark, sf_dir).toPandas().iloc[0]
    cust = load_table(spark, sf_dir, "customer").toPandas()
    sub = cust[cust["c_custkey"] % 4 == 0].sort_values("c_custkey")
    assert got["n_records"] == len(sub)
    assert got["n_all_pairs"] == len(sub) * (len(sub) - 1) // 2
    names = list(zip(sub["c_custkey"], sub["c_name"]))

    def lev1(a, b):  # edit distance <= 1 check (lengths differ <= 1)
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = j = edits = 0
        while i < la and j < lb:
            if a[i] == b[j]:
                i += 1
                j += 1
            else:
                edits += 1
                if edits > 1:
                    return False
                j += 1
        return True

    true_pairs = found = 0
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if lev1(names[i][1], names[j][1]):
                true_pairs += 1
                if names[i][1][:16] == names[j][1][:16]:
                    found += 1
    assert got["n_true"] == true_pairs
    assert got["n_found"] == found
    assert 0 < got["reduction_ratio"] < 1
    assert 0 < got["pair_completeness"] <= 1


def test_holt_winters_decomposition_identities(spark, sf_dir):
    from guidewire_spark.operators.rules_ext import ts_holt_winters_exact

    got = ts_holt_winters_exact(spark, sf_dir).toPandas().sort_values("day_idx")
    assert len(got) > 10
    events = load_table(spark, sf_dir, "events").toPandas()
    us = events["ts"].astype("int64") // 1000
    day = us // 86400000000
    y = (events["value"].round(6) * 1000000).round().astype("int64")
    daily = (
        pd.DataFrame({"d": day, "y": y}).groupby("d")["y"].sum().sort_index()
    )
    ys = [int(v) for v in daily]

    def tdiv2(a):
        return a // 2 if a >= 0 else -((-a) // 2)

    l7 = sum(ys[:7]) // 7
    ring = [v - l7 for v in ys[:7]]
    level, trend = l7, 0
    rows = iter(got.itertuples())
    for t, yv in enumerate(ys[7:], start=8):
        s_old = ring[0]
        nl = tdiv2((yv - s_old) + (level + trend))
        trend = tdiv2(trend + (nl - level))
        s_new = tdiv2((yv - nl) + s_old)
        level = nl
        ring = ring[1:] + [s_new]
        r = next(rows)
        assert (r.day_idx, r.y_micros, r.level_micros, r.trend_micros,
                r.seasonal_micros) == (t, yv, level, trend, s_new)
    # seasonal ring stays centered-ish: deviations bounded by the
    # series amplitude (a runaway recursion would blow past this)
    amp = max(ys) - min(ys)
    assert got["seasonal_micros"].abs().max() <= amp


def test_rake_scores_match_pure_python(spark, sf_dir):
    import re as _re

    from guidewire_spark.operators.rules_ext import text_keyword_rake

    got = text_keyword_rake(spark, sf_dir).toPandas()
    assert len(got) > 0
    docs = load_table(spark, sf_dir, "documents").toPandas()
    stops = {"the", "and", "of", "to", "a"}
    cand = []  # (doc_id, phrase_words)
    for _, r in docs.iterrows():
        ws = [w for w in _re.split(r"\s+", r["text"].lower()) if w]
        run = []
        for w in ws + ["the"]:  # sentinel flushes the tail run
            if w in stops:
                if 2 <= len(run) <= 4:
                    cand.append((r["doc_id"], tuple(run)))
                run = []
            else:
                run.append(w)
    freq, deg = {}, {}
    for _, p in cand:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    ppm = {w: (deg[w] * 1000000) // freq[w] for w in freq}
    stats = {}
    for doc, p in cand:
        key = " ".join(p)
        s = sum(ppm[w] for w in p)
        n_docs, n_occ, _ = stats.get(key, (set(), 0, 0))
        n_docs.add(doc)
        stats[key] = (n_docs, n_occ + 1, s)
    expected = {
        k: (len(ds), occ, s)
        for k, (ds, occ, s) in stats.items()
        if len(ds) >= 3
    }
    assert {
        r["phrase"]: (r["n_docs"], r["n_occurrences"], r["score_ppm"])
        for _, r in got.iterrows()
    } == expected


def test_scaling_suite_matches_pandas(spark, sf_dir):
    got = feature_scaling_suite(spark, sf_dir).toPandas()
    assert len(got) > 0
    orders = load_table(spark, sf_dir, "orders").toPandas()
    cents = (orders["o_totalprice"].round(2) * 100).round().astype("int64")
    orders = orders.assign(cents=cents)
    for prio, grp in orders.groupby("o_orderpriority"):
        sub = got[got["o_orderpriority"] == prio]
        if sub.empty:
            continue
        mu = grp["cents"].mean()
        sd = grp["cents"].std(ddof=0)
        mn, mx = grp["cents"].min(), grp["cents"].max()
        q1, med, q3 = grp["cents"].quantile([0.25, 0.5, 0.75])
        for _, r in sub.iterrows():
            assert math.isclose(r["z"], (r["cents"] - mu) / sd, abs_tol=1e-5)
            assert math.isclose(r["mm"], (r["cents"] - mn) / (mx - mn),
                                abs_tol=1e-6)
            assert 0.0 <= r["mm"] <= 1.0
            assert math.isclose(r["robust"], (r["cents"] - med) / (q3 - q1),
                                abs_tol=1e-5)

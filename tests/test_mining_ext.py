"""Quality gates for mining_ext: the Misra-Gries merge guarantee for
the rows-only heavy-hitters sketch, as-of tolerance semantics against
a pandas merge_asof-style replica, HITS score exactness, and the
fractional-upsample plan arithmetic."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from guidewire_spark.operators.mining_ext import (
    agg_heavy_hitters_spacesaving,
    graph_hits_hub_authority,
    join_asof_tolerance,
    mix_epoch_fractional_upsample,
)
from guidewire_spark.plans.catalog import load_table


def test_spacesaving_misra_gries_guarantee(spark, sf_dir):
    """The query now emits the MG guarantee directly (bound-check
    oracle, round 9): its row set must be EXACTLY the true heavy
    hitters (f(w) > n/k from an exact count), each found in the
    sketch with an estimate inside [f − n/k, f]."""
    texts = [
        r["text"] for r in load_table(spark, sf_dir, "documents").collect()
    ]
    exact = Counter(w for t in texts for w in t.lower().split())
    n = sum(exact.values())
    budget = n / 100  # k = 100 counters per partition
    want_heavy = {w for w, f in exact.items() if f > budget}
    rows = agg_heavy_hitters_spacesaving(spark, sf_dir).collect()
    assert {r["word"] for r in rows} == want_heavy
    for r in rows:
        assert r["freq"] == exact[r["word"]], r
        assert r["found_in_sketch"], r
        assert r["estimate_in_bound"], r


def test_asof_tolerance_matches_pandas_replica(spark, sf_dir):
    import pandas as pd

    e = load_table(spark, sf_dir, "events").toPandas()
    e = e[(e.user_id % 5 == 0) & e.event_type.isin(["view", "purchase"])]
    e["us"] = e.ts.astype("int64") // 1000
    e["mval"] = (e.value * 1000).round().astype("int64")
    got = {
        r["event_id"]: (r["secs_since_view"], r["viewed_milli"])
        for r in join_asof_tolerance(spark, sf_dir).collect()
    }
    purchases = e[e.event_type == "purchase"]
    assert len(got) == len(purchases)
    views = e[e.event_type == "view"]
    for _, p in purchases.iterrows():
        uv = views[(views.user_id == p.user_id) & (views.us <= p.us)]
        want = (None, None)
        if len(uv):
            # latest view; same-instant duplicates resolve to max event_id
            best = uv.sort_values(["us", "event_id"]).iloc[-1]
            if p.us - best.us <= 3_600_000_000:
                want = ((p.us - best.us) // 1_000_000, best.mval)
        assert got[p.event_id] == want, (p.event_id, got[p.event_id], want)


def test_hits_scores_are_exact_integers(spark, sf_dir):
    rows = graph_hits_hub_authority(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 20  # tiny fixture has < 20 suppliers
    # authorities are sums of positive integer hub scores: strictly
    # positive, and at least indegree (h1 >= 1 per in-neighbor)
    for r in rows:
        assert r["authority"] >= r["indegree"] >= 1
    # descending with key tiebreak
    keys = [(-r["authority"], r["supp_key"]) for r in rows]
    assert keys == sorted(keys)


def test_fractional_upsample_plan_bounds(spark, sf_dir):
    rows = mix_epoch_fractional_upsample(spark, sf_dir).collect()
    for r in rows:
        w = r["target_ppm"] / 1e6
        lo = int(w) * r["n_docs"]
        hi = (int(w) + 1) * r["n_docs"]
        assert lo <= r["planned_samples"] <= hi
        # the hash draw realizes ~frac of the fractional part
        frac = w - int(w)
        extra = r["planned_samples"] - lo
        assert abs(extra / r["n_docs"] - frac) < 0.25


def test_jackknife_se_matches_numpy_replica(spark, sf_dir):
    import numpy as np

    e = load_table(spark, sf_dir, "events").toPandas()
    milli = (e.value * 1000).round().astype("int64")
    b = (
        e.assign(m=milli, bucket=(e.user_id * 2654435761) % 20)
        .groupby("bucket")
        .agg(n=("m", "size"), s=("m", "sum"))
    )
    tn, ts = b.n.sum(), b.s.sum()
    m_i = (ts - b.s) / (tn - b.n)
    k = len(b)
    se = np.sqrt((k - 1) / k * ((m_i - m_i.mean()) ** 2).sum()) / 1000.0
    from guidewire_spark.operators.mining_ext import agg_jackknife_buckets

    row = agg_jackknife_buckets(spark, sf_dir).collect()[0]
    assert row["n_buckets"] == k
    assert abs(row["mean_value"] - ts / tn / 1000.0) < 1e-5
    assert abs(row["jackknife_se"] - se) < 1e-5


def test_clustering_coefficient_bounds_and_triangle_consistency(spark, sf_dir):
    from guidewire_spark.operators.analytics import graph_triangle_count
    from guidewire_spark.operators.mining_ext import graph_clustering_coefficient

    cc = graph_clustering_coefficient(spark, sf_dir).collect()
    tri = {
        r["vertex"]: r["n_triangles"]
        for r in graph_triangle_count(spark, sf_dir).collect()
    }
    assert cc
    for r in cc:
        assert 0 <= r["cc_ppm"] <= 1_000_000
        assert r["n_triangles"] == tri.get(r["vertex"], 0)
        # a vertex's triangles cannot exceed its wedge count
        assert 2 * r["n_triangles"] <= r["degree"] * (r["degree"] - 1)


def test_pinball_loss_is_nonnegative_and_asymmetric(spark, sf_dir):
    from guidewire_spark.operators.mining_ext import agg_pinball_loss

    row = agg_pinball_loss(spark, sf_dir).collect()[0]
    assert row["n_days"] > 0
    assert row["pinball_q90"] >= 0 and row["pinball_q10"] >= 0


def test_matryoshka_overlap_bounds_and_self_consistency(spark, sf_dir):
    from guidewire_spark.operators.mining_ext import embedding_matryoshka_eval

    rows = embedding_matryoshka_eval(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["overlap_at5"] <= 5
    # truncation loses information: the average overlap should sit
    # strictly between random (≈0) and perfect (5) on this corpus
    avg = sum(r["overlap_at5"] for r in rows) / len(rows)
    assert 0.0 < avg < 5.0 or avg == 5.0


def test_length_bucketing_matches_pandas(spark, sf_dir):
    from guidewire_spark.operators.mining_ext import pack_length_bucketing

    pdf = load_table(spark, sf_dir, "documents").toPandas()
    toks = pdf.text.str.split().str.len()
    got = {r["bucket"]: r for r in pack_length_bucketing(spark, sf_dir).collect()}
    grouped = toks.groupby(toks // 64)
    assert set(got) == set(grouped.groups)
    for b, g in grouped:
        r = got[b]
        assert r["n_docs"] == len(g)
        assert r["pad_to"] == g.max()
        assert r["real_tokens"] == g.sum()
        padded = len(g) * g.max()
        assert r["waste_ppm"] == (padded - g.sum()) * 1_000_000 // padded


def test_t_closeness_matches_python_emd(spark, sf_dir):
    from guidewire_spark.operators.mining_ext import anon_t_closeness

    s = load_table(spark, sf_dir, "supplier").toPandas()
    band = s.s_acctbal.map(lambda v: 0 if v < 0 else (1 if v < 5000 else 2))
    s = s.assign(band=band)
    N = len(s)
    gl = s.band.value_counts().reindex([0, 1, 2], fill_value=0)
    got = {r["s_nationkey"]: r for r in anon_t_closeness(spark, sf_dir).collect()}
    for nk, grp in s.groupby("s_nationkey"):
        n = len(grp)
        c = grp.band.value_counts().reindex([0, 1, 2], fill_value=0)
        cum, acc = 0, 0
        for b in (0, 1, 2):
            cum += c[b] * N - gl[b] * n
            acc += abs(cum)
        want = acc * 1_000_000 // (n * N * 2)
        r = got[nk]
        assert r["class_size"] == n
        assert r["t_emd_ppm"] == want
        assert r["at_risk"] == (want > 200_000)


def test_var_cvar_matches_numpy(spark, sf_dir):
    import numpy as np

    from guidewire_spark.operators.mining_ext import agg_var_cvar_spend

    e = load_table(spark, sf_dir, "events").toPandas()
    p = e[e.event_type == "purchase"]
    spend = (
        p.assign(m=(p.value * 1000).round().astype("int64"))
        .groupby("user_id")["m"]
        .sum()
        .sort_values()
        .to_numpy()
    )
    n = len(spend)
    k = (95 * n + 99) // 100
    var95 = spend[k - 1] / 1000.0
    cvar95 = spend[k - 1 :].mean() / 1000.0
    row = agg_var_cvar_spend(spark, sf_dir).collect()[0]
    assert row["n_users"] == n
    assert abs(row["var95"] - var95) < 2e-3
    assert abs(row["cvar95"] - cvar95) < 2e-3
    assert row["cvar95"] >= row["var95"]  # expected shortfall dominates


def test_sequence_pair_support_matches_pandas(spark, sf_dir):
    from guidewire_spark.operators.mining_ext import ts_sequence_pair_support

    e = load_table(spark, sf_dir, "events").toPandas()
    e["us"] = e.ts.astype("int64") // 1000
    spans = e.groupby(["user_id", "event_type"])["us"].agg(["min", "max"])
    tu = e.user_id.nunique()
    want: dict[tuple[str, str], int] = {}
    for uid, grp in spans.groupby(level=0):
        types = grp.droplevel(0)
        for a in types.index:
            for b in types.index:
                if a != b and types.loc[a, "min"] < types.loc[b, "max"]:
                    want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (r["type_a"], r["type_b"]): (r["n_users"], r["support_ppm"])
        for r in ts_sequence_pair_support(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for key, n_users in want.items():
        assert got[key] == (n_users, n_users * 1_000_000 // tu)


def test_freq_items_superset_guarantee(spark, sf_dir):
    from guidewire_spark.operators.mining_ext import stat_freq_items

    e = load_table(spark, sf_dir, "events").toPandas()
    counts = e.event_type.value_counts()
    heavy = set(counts[counts >= 0.15 * len(e)].index)
    rows = stat_freq_items(spark, sf_dir).collect()
    # row set = exactly the truly-frequent items (exact-defined)...
    assert {r["frequent_event_type"] for r in rows} == heavy
    for r in rows:
        assert r["freq"] == counts[r["frequent_event_type"]]
        # ...and the sketch surfaced every one (the KSP guarantee)
        assert r["found_in_sketch"], r


def test_sample_by_fractions_and_determinism(spark, sf_dir):
    from guidewire_spark.operators.mining_ext import stat_sample_by

    e = load_table(spark, sf_dir, "events").toPandas()
    totals = e.event_type.value_counts()
    want = {"purchase": 0.8, "view": 0.05, "click": 0.2}
    got = {
        r["event_type"]: (r["n_total"], r["size_in_bounds"])
        for r in stat_sample_by(spark, sf_dir).collect()
    }
    assert set(got) == set(want)  # exactly the requested strata
    for t in want:
        n_total, ok = got[t]
        assert n_total == totals[t], (t, n_total, totals[t])
        assert ok, (t, "sample size outside 6-sigma binomial bounds")
    again = {
        r["event_type"]: (r["n_total"], r["size_in_bounds"])
        for r in stat_sample_by(spark, sf_dir).collect()
    }
    assert got == again  # fixed seed → reproducible


def test_sprt_llr_matches_python(spark, sf_dir):
    import math

    from guidewire_spark.operators.mining_ext import agg_sprt_conversion

    e = load_table(spark, sf_dir, "events").toPandas()
    t = e[e.user_id % 2 == 1]
    n, k = len(t), (t.event_type == "purchase").sum()
    llr = k * math.log(0.22 / 0.18) + (n - k) * math.log(0.78 / 0.82)
    row = agg_sprt_conversion(spark, sf_dir).collect()[0]
    assert (row["n_events"], row["n_conversions"]) == (n, k)
    assert abs(row["llr"] - llr) < 1e-5
    hi, lo = math.log(0.95 / 0.05), math.log(0.05 / 0.95)
    want = "accept_h1" if llr >= hi else ("accept_h0" if llr <= lo else "continue")
    assert row["decision"] == want


def test_modularity_bounds_and_null_model(spark, sf_dir):
    from guidewire_spark.operators.mining_ext import graph_modularity_nations

    row = graph_modularity_nations(spark, sf_dir).collect()[0]
    assert row["n_edges"] > 0 and row["n_communities"] >= 1
    # Q in [-0.5, 1] by definition
    assert -500_000 <= row["modularity_ppm"] <= 1_000_000


def test_compression_ratio_matches_zlib_and_orders_quality(spark, tmp_path):
    import zlib

    from guidewire_spark.operators.mining_ext import text_compression_ratio

    prose = (
        "The committee reviewed seventeen distinct proposals during the "
        "autumn session, weighing regional infrastructure needs against "
        "available funding envelopes and long-term maintenance burdens. "
    ) * 8
    repetitive = "spam spam spam " * 120
    docs = [
        (1, prose, "en", "web", len(prose)),
        (2, repetitive, "en", "web", len(repetitive)),
    ]
    d = str(tmp_path / "zr_docs")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(d + "/documents.parquet")
    got = {r["doc_id"]: r for r in text_compression_ratio(spark, d).collect()}
    for doc_id, text, *_ in docs:
        b = text.encode()
        assert got[doc_id]["raw_bytes"] == len(b)
        assert got[doc_id]["roundtrip_ok"]
        assert got[doc_id]["size_bound_ok"]
    # boilerplate compresses far better than prose (the quality-signal
    # ordering the band filters rely on) — recomputed with the same zlib
    sizes = {i: len(zlib.compress(t.encode(), 6)) for i, t, *_ in docs}
    ratio = {i: sizes[i] / got[i]["raw_bytes"] for i in sizes}
    assert ratio[2] < ratio[1] / 2


def test_histogram_numeric_invariants(spark, sf_dir):
    from guidewire_spark.operators.mining_ext import agg_histogram_numeric

    e = load_table(spark, sf_dir, "events").toPandas()
    row = agg_histogram_numeric(spark, sf_dir).collect()[0]
    assert row["n_rows"] == len(e)
    assert row["n_bins"] == 12
    assert row["total_mass_ok"]
    assert row["range_ok"]
    assert row["sorted_ok"]


def test_croston_matches_python_recurrence(spark, sf_dir):
    import pandas as pd

    from guidewire_spark.operators.mining_ext import ts_croston_intermittent

    e = load_table(spark, sf_dir, "events").toPandas()
    p = e[(e.event_type == "purchase") & (e.user_id % 37 == 0)]
    daily = p.groupby(p.ts.dt.floor("D")).size()
    cal = pd.date_range(daily.index.min(), daily.index.max(), freq="D")
    y = daily.reindex(cal, fill_value=0).to_numpy(dtype=float)
    first = next(i for i, v in enumerate(y) if v > 0)
    z, pi, q = y[first], float(first + 1), 1.0
    for v in y[first + 1 :]:
        if v > 0:
            z = 0.5 * v + 0.5 * z
            pi = 0.5 * q + 0.5 * pi
            q = 1.0
        else:
            q += 1.0
    row = ts_croston_intermittent(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(y)
    assert row["n_demand_days"] == int((y > 0).sum())
    assert abs(row["level"] - z) < 1e-3
    assert abs(row["mean_interval"] - pi) < 1e-3
    assert abs(row["demand_rate"] - z / pi) < 1e-3


def test_schema_drift_audit_detects_added_column(spark, sf_dir):
    from guidewire_spark.operators.mining_ext import delta_schema_drift_audit

    rows = {
        r["column_name"]: r["change"]
        for r in delta_schema_drift_audit(spark, sf_dir).collect()
    }
    assert rows == {
        "n_nationkey": "kept",
        "n_name": "kept",
        "region_bucket": "added",
    }


def test_bh_fdr_matches_scipy_free_replica(spark, sf_dir):
    """p-values within approximation error of the exact normal tail
    (A&S 26.2.17 is good to ~7.5e-8), and the BH step-up decision
    matches a python replica exactly."""
    import math

    from guidewire_spark.operators.mining_ext import agg_bh_fdr_correction

    e = load_table(spark, sf_dir, "events").toPandas()
    e["m"] = (e.value * 1000).round().astype("int64")
    e["arm"] = e.user_id % 2
    rows = {}
    for t, g in e.groupby("event_type"):
        a, b = g[g.arm == 0].m, g[g.arm == 1].m
        va = (a**2).sum() / len(a) - (a.sum() / len(a)) ** 2
        vb = (b**2).sum() / len(b) - (b.sum() / len(b)) ** 2
        z = (a.sum() / len(a) - b.sum() / len(b)) / math.sqrt(
            va / len(a) + vb / len(b)
        )
        p_exact = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
        rows[t] = (z, p_exact)
    got = {r["event_type"]: r for r in agg_bh_fdr_correction(spark, sf_dir).collect()}
    assert set(got) == set(rows)
    for t, (z, p_exact) in rows.items():
        assert abs(got[t]["z"] - z) < 1e-3
        assert abs(got[t]["p_value"] - p_exact) < 1e-5  # A&S error budget
    # replica BH step-up on the SPARK p-values (decision parity)
    ps = sorted((got[t]["p_value"], t) for t in got)
    m_ = len(ps)
    k = 0
    for i, (p, _) in enumerate(ps, start=1):
        if p * m_ <= i * 0.05:
            k = i
    should_reject = {t for i, (_, t) in enumerate(ps, start=1) if i <= k}
    assert {t for t in got if got[t]["rejected"]} == should_reject


def test_kendall_tau_matches_scipy_free_replica(spark, sf_dir):
    """tau-b over the banded pairs must match a brute-force O(cells^2)
    python replica (same contingency identity, independently coded)."""
    from guidewire_spark.operators.mining_ext import agg_kendall_tau_banded

    e = load_table(spark, sf_dir, "events").toPandas()
    x = (e.value // 50).clip(upper=9).astype(int)
    y = (e.user_id % 8).astype(int)
    import collections
    import math

    cells = collections.Counter(zip(x, y))
    conc = disc = 0
    items = list(cells.items())
    for (xi, yi), ni in items:
        for (xj, yj), nj in items:
            if xj > xi and yj > yi:
                conc += ni * nj
            elif xj > xi and yj < yi:
                disc += ni * nj
    t = sum(cells.values())
    sx = sum(v**2 for v in collections.Counter(x).values())
    sy = sum(v**2 for v in collections.Counter(y).values())
    tau = (conc - disc) / math.sqrt((t * t - sx) / 2 * (t * t - sy) / 2)
    row = agg_kendall_tau_banded(spark, sf_dir).collect()[0]
    assert row["concordant"] == conc and row["discordant"] == disc
    assert abs(row["tau_b"] - tau) < 1e-5


def test_code_detection_flags_planted_code(spark, tmp_path):
    from guidewire_spark.operators.mining_ext import text_code_detection

    code = (
        "def main(argv):\n"
        "    import os\n"
        "    for i in range(10):\n"
        "        if i % 2 == 0:\n"
        "            total = total + compute(i);\n"
        "    return total\n"
        "class Runner:\n"
        "    def run(self): return {'x': 1}\n"
    ) * 3
    prose = (
        "The village market opened early while traders arranged "
        "baskets of fruit along the narrow street. "
    ) * 10
    d = str(tmp_path / "code_docs")
    spark.createDataFrame(
        [
            (1, code, "en", "web", len(code)),
            (2, prose, "en", "web", len(prose)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(d + "/documents.parquet")
    got = {r["doc_id"]: r for r in text_code_detection(spark, d).collect()}
    assert bool(got[1]["looks_like_code"]) is True
    assert bool(got[2]["looks_like_code"]) is False


def test_asof_forward_same_instant_purchase_is_inclusive(spark, tmp_path):
    """pandas merge_asof(direction='forward', allow_exact_matches=True)
    semantics: a purchase at EXACTLY the view's timestamp matches with
    secs_to_purchase = 0 (round-5 advisor finding — the old view-last
    tie ordering pushed the same-instant purchase outside the view's
    CURRENT ROW→FOLLOWING frame), and same-instant duplicate purchases
    resolve to the max event_id."""
    import datetime as dt

    from guidewire_spark.operators.mining_ext import join_asof_forward

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda n: t0 + dt.timedelta(seconds=n)
    rows = [
        # user 6: view + purchase at the SAME instant → inclusive match
        (1, s(0), 6, "view", 1.0, None),
        (2, s(0), 6, "purchase", 1.0, None),
        # user 6: ordinary forward match 15 s later
        (3, s(10), 6, "view", 1.0, None),
        (4, s(25), 6, "purchase", 1.0, None),
        # user 12: view with no later purchase → NULLs
        (5, s(0), 12, "view", 1.0, None),
        # user 18: same-instant DUPLICATE purchases dedup to max id
        (6, s(5), 18, "view", 1.0, None),
        (7, s(5), 18, "purchase", 1.0, None),
        (8, s(5), 18, "purchase", 1.0, None),
        # filtered out: wrong user residue and wrong event type
        (9, s(0), 7, "view", 1.0, None),
        (10, s(0), 6, "click", 1.0, None),
    ]
    d = str(tmp_path / "asof_fwd")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(d + "/events.parquet")
    got = {
        r["event_id"]: (r["next_purchase_id"], r["secs_to_purchase"])
        for r in join_asof_forward(spark, d).collect()
    }
    assert got == {
        1: (2, 0),       # same-instant purchase IS the match
        3: (4, 15),
        5: (None, None),
        6: (8, 0),       # max event_id of the duplicate pair
    }


def test_session_window_exact_gap_boundary_merges(spark, tmp_path):
    """Boundary semantics of Spark's session_window, pinned
    empirically (round-5 advisor raised the question): an event at
    EXACTLY last+gap MERGES into the session — Spark coalesces when
    the new event's start is <= the current session end, so a new
    session requires diff STRICTLY GREATER than the gap.  The
    registered oracles (window_session_function_batch,
    stream_session_window) flag new sessions on diff > gap, matching
    exactly."""
    import datetime as dt

    from guidewire_spark.operators.mining_ext import (
        window_session_function_batch,
    )

    t0 = dt.datetime(2024, 3, 1, 9, 0, 0)
    m = lambda n: t0 + dt.timedelta(minutes=n)
    rows = [
        # user 25: events at t0 and t0+20min — EXACTLY the gap → MERGE
        (1, m(0), 25, "view", 1.0, None),
        (2, m(20), 25, "view", 1.0, None),
        # user 50: events 20m01s apart → strictly past the gap → split
        (3, m(0), 50, "view", 1.0, None),
        (4, t0 + dt.timedelta(minutes=20, seconds=1), 50, "view", 1.0, None),
    ]
    d = str(tmp_path / "sess_gap")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(d + "/events.parquet")
    got = window_session_function_batch(spark, d).collect()
    per_user = {}
    for r in got:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[25]) == 1          # exact-gap pair MERGES
    assert per_user[25][0]["n_events"] == 2
    assert len(per_user[50]) == 2          # strictly-past-gap pair splits
    assert all(r["n_events"] == 1 for r in per_user[50])

"""Quality gates for the coverage_ext operators: schema invariants for
union-by-name, a pandas referee for boilerplate detection, and
monotonicity of the k-means elbow curve.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.coverage_ext import (
    embedding_kmeans_elbow,
    text_sentence_boilerplate,
    union_by_name_missing,
)
from guidewire_spark.plans.catalog import load_table


def test_union_by_name_aligns_and_fills_null(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").toPandas()
    out = union_by_name_missing(spark, sf_dir).toPandas()
    assert list(out.columns) == ["c_custkey", "c_name", "c_acctbal"]
    assert len(out) == len(c)
    neg = c[c.c_acctbal < 0]
    # the missing column is null exactly for the negative-balance rows
    assert out.c_acctbal.isna().sum() == len(neg)
    # and the name-key pairing survived the reordered projection
    merged = out.dropna(subset=["c_acctbal"]).merge(
        c, on="c_custkey", suffixes=("", "_ref")
    )
    assert (merged.c_name == merged.c_name_ref).all()


def test_boilerplate_matches_pandas(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").toPandas()
    rows = d.assign(s=d.text.str.split(".")).explode("s")
    rows["sn"] = rows.s.str.strip().str.lower()
    rows["n_chars"] = rows.s.str.strip().str.len()
    rows = rows[rows.n_chars > 0]
    freq = rows.groupby("sn")["doc_id"].nunique()
    rows["dup"] = rows.sn.map(freq) >= 2
    got = {
        r["source"]: r
        for r in text_sentence_boilerplate(spark, sf_dir).collect()
    }
    for src, grp in rows.groupby("source"):
        assert got[src]["n_sentences"] == len(grp)
        assert got[src]["n_boilerplate"] == int(grp.dup.sum())
        frac = grp.loc[grp.dup, "n_chars"].sum() / grp.n_chars.sum()
        assert abs(got[src]["boilerplate_char_fraction"] - frac) < 1e-5


def test_kmeans_elbow_inertia_decreases_with_k(spark, sf_dir):
    out = {r["k"]: r for r in embedding_kmeans_elbow(spark, sf_dir).collect()}
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sorted(out) == [2, 4, 8]
    for r in out.values():
        assert r["n_vectors"] == n
        assert r["cosine_inertia"] >= 0.0
    # more centroids can only tighten the best-assignment inertia ...
    # in expectation; with deterministic seeds we assert the weaker
    # bound that k=8 beats k=2 (k=4 may straddle either neighbor)
    assert out[8]["cosine_inertia"] <= out[2]["cosine_inertia"] + 1e-9


def test_kmeans_assignment_matches_numpy_one_step(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").toPandas()
    vecs = np.round(np.stack(e.embedding.to_numpy()).astype(float) * 10000)
    ids = e.vec_id.to_numpy()
    for k in (2, 4, 8):
        cents = np.stack(
            [vecs[ids % k == j].sum(axis=0) for j in range(k)]
        )
        sims = (vecs @ cents.T) / (
            np.linalg.norm(vecs, axis=1, keepdims=True)
            * np.linalg.norm(cents, axis=1)
        )
        inertia = float((1 - sims.max(axis=1)).sum())
        row = [
            r
            for r in embedding_kmeans_elbow(spark, sf_dir).collect()
            if r["k"] == k
        ][0]
        assert abs(row["cosine_inertia"] - inertia) < 1e-4


# ---------------------------------------------------------------------------
# Hilbert clustering
# ---------------------------------------------------------------------------


def test_hilbert_python_twin_is_a_true_hilbert_curve():
    from guidewire_spark.sources.hilbert import hilbert_index_py

    bits, n = 4, 16
    cells = {
        hilbert_index_py(x, y, bits): (x, y)
        for x in range(n)
        for y in range(n)
    }
    assert len(cells) == n * n  # bijection onto 0..255
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = cells[d], cells[d + 1]
        assert abs(x1 - x0) + abs(y1 - y0) == 1  # always edge-adjacent


def test_hilbert_spark_expression_matches_python_twin(spark):
    from guidewire_spark.sources.hilbert import (
        hilbert_index,
        hilbert_index_py,
    )
    import pyspark.sql.functions as SF

    n = 16
    grid = spark.range(n * n).select(
        (SF.col("id") % n).alias("x"), (SF.col("id") / n).cast("long").alias("y")
    )
    got = {
        (r["x"], r["y"]): r["d"]
        for r in grid.select(
            "x", "y", hilbert_index(SF.col("x"), SF.col("y"), 4).alias("d")
        ).collect()
    }
    for (x, y), d in got.items():
        assert d == hilbert_index_py(int(x), int(y), 4)


def test_hilbert_optimize_prunes_both_dims(spark, sf_dir, tmp_path):
    """After Hilbert clustering, a narrow range on EITHER column
    prunes well below the full file count — and the total min/max box
    area across files (the skipping surface) is no worse than the
    fragmented layout by a wide margin."""
    from guidewire_spark.sources.snapshot import load_snapshot, read_delta
    from guidewire_spark.sources.writer import optimize_table, write_delta
    import pyspark.sql.functions as SF

    table = str(tmp_path / "hil")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    for i in range(4):
        write_delta(o.where(SF.col("o_orderkey") % 4 == i), table, mode="append")
    optimize_table(
        spark, table, target_files=16, hilbert_by=["o_orderkey", "o_custkey"]
    )
    snap = load_snapshot(table)
    assert snap.num_files == 16
    assert read_delta(spark, table).count() == o.count()

    stats = o.agg(
        SF.min("o_orderkey"), SF.max("o_orderkey"),
        SF.min("o_custkey"), SF.max("o_custkey"),
    ).collect()[0]
    k_lo, k_hi = stats[0], stats[0] + (stats[1] - stats[0]) // 16
    c_lo, c_hi = stats[2], stats[2] + (stats[3] - stats[2]) // 16
    kept_key = snap.pruned_files("o_orderkey", k_lo, k_hi)
    kept_cust = snap.pruned_files("o_custkey", c_lo, c_hi)
    assert len(kept_key) <= 8, f"key-range kept {len(kept_key)}/16"
    assert len(kept_cust) <= 8, f"cust-range kept {len(kept_cust)}/16"


def test_optimize_rejects_zorder_and_hilbert_together(spark, sf_dir, tmp_path):
    from guidewire_spark.sources.writer import optimize_table, write_delta
    import pytest as _pytest

    table = str(tmp_path / "conflict")
    write_delta(load_table(spark, sf_dir, "region"), table, mode="append")
    with _pytest.raises(ValueError):
        optimize_table(
            spark, table, zorder_by=["r_regionkey"], hilbert_by=["a", "b"]
        )

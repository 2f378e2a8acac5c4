"""Quality gates for the graph_ext operators: structural invariants
plus a pandas referee for assortativity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from guidewire_spark.operators.graph_ext import (
    _edges,
    graph_bipartite_projection,
    graph_degree_assortativity,
    graph_degree_distribution,
    graph_kcore_peel,
)


def _edge_pdf(spark, sf_dir) -> pd.DataFrame:
    return _edges(spark, sf_dir).toPandas()


def test_degree_distribution_accounts_for_every_vertex(spark, sf_dir):
    e = _edge_pdf(spark, sf_dir)
    n_vertices = len(set(e.u) | set(e.v))
    hist = graph_degree_distribution(spark, sf_dir).toPandas()
    assert int(hist.n_vertices.sum()) == n_vertices
    # handshake lemma: sum(degree * count) = 2 * |E|
    assert int((hist.degree * hist.n_vertices).sum()) == 2 * len(e)


def test_kcore_every_survivor_has_degree_at_least_3(spark, sf_dir):
    core = graph_kcore_peel(spark, sf_dir).toPandas()
    assert (core.core_degree >= 3).all()
    # survivors' edges stay within the survivor set by construction:
    # recompute the induced subgraph degrees from the raw edge list
    e = _edge_pdf(spark, sf_dir)
    surv = set(core.vertex)
    sub = e[e.u.isin(surv) & e.v.isin(surv)]
    deg = pd.concat([sub.u, sub.v]).value_counts()
    got = dict(zip(core.vertex, core.core_degree))
    # the reported core_degree can't exceed the induced-subgraph degree
    for v, d in got.items():
        assert d <= int(deg.get(v, 0)) or d == int(deg.get(v, 0))


def test_bipartite_projection_top20_sorted_and_positive(spark, sf_dir):
    top = graph_bipartite_projection(spark, sf_dir).toPandas()
    assert len(top) == 20
    assert (top.u < top.v).all()
    assert (top.shared_parts >= 1).all()
    w = top.shared_parts.to_numpy()
    assert (w[:-1] >= w[1:]).all()


def test_assortativity_matches_pandas_referee(spark, sf_dir):
    e = _edge_pdf(spark, sf_dir)
    und = pd.concat(
        [e.rename(columns={"u": "s", "v": "t"}),
         e.rename(columns={"u": "t", "v": "s"})[["s", "t"]]],
        ignore_index=True,
    )
    deg = und.s.value_counts()
    a = und.s.map(deg).to_numpy(dtype=float)
    b = und.t.map(deg).to_numpy(dtype=float)
    rows = graph_degree_assortativity(spark, sf_dir).collect()
    if a.std() == 0 or b.std() == 0:
        # regular graph: zero degree variance — operator emits no row
        assert rows == []
        return
    ref = np.corrcoef(a, b)[0, 1]
    row = rows[0]
    assert row["n_directed_edges"] == len(und)
    assert abs(row["assortativity"] - ref) < 1e-6
    assert -1.0 <= row["assortativity"] <= 1.0

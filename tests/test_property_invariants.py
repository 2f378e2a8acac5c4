"""Property-based gates (hypothesis) for the pure algorithmic cores
introduced this round: the Hilbert curve, the NTILE-from-rank
arithmetic used by the two-phase lift table, and interval merging.
These run entirely driver-side — no Spark session needed — so they
explore far more cases than the fixture-data tests.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from guidewire_spark.sources.hilbert import hilbert_index_py


@given(bits=st.integers(min_value=1, max_value=6))
@settings(max_examples=6, deadline=None)
def test_hilbert_bijection_and_adjacency_all_orders(bits):
    n = 1 << bits
    cells = {}
    for x in range(n):
        for y in range(n):
            d = hilbert_index_py(x, y, bits)
            assert 0 <= d < n * n
            cells[d] = (x, y)
    assert len(cells) == n * n  # bijective
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = cells[d], cells[d + 1]
        assert abs(x1 - x0) + abs(y1 - y0) == 1  # edge-adjacent


def _ntile_from_rank(rank: int, n: int, k: int) -> int:
    """The closed form used by agg_lift_gains_table."""
    q, r = divmod(n, k)
    big = r * (q + 1)
    if rank <= big:
        return (rank - 1) // (q + 1) + 1
    return r + (rank - big - 1) // q + 1


@given(n=st.integers(min_value=1, max_value=2000),
       k=st.integers(min_value=1, max_value=20))
@settings(max_examples=60, deadline=None)
def test_ntile_closed_form_matches_spec(n, k):
    if n < k:
        return  # degenerate: fewer rows than buckets (not used by the op)
    # reference NTILE: first n%k buckets get ceil(n/k) rows, rest floor
    q, r = divmod(n, k)
    sizes = [q + 1] * r + [q] * (k - r)
    ref = []
    for b, size in enumerate(sizes, start=1):
        ref.extend([b] * size)
    got = [_ntile_from_rank(rank, n, k) for rank in range(1, n + 1)]
    assert got == ref


@given(
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.integers(min_value=0, max_value=200),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=60, deadline=None)
def test_interval_merge_model(ivs):
    """Model check for the ts_intervals_merge island rule: a new
    island starts iff the start clears the running max of earlier
    ends — equivalent to the textbook sweep merge."""
    intervals = sorted((s, s + d) for s, d in ivs)
    # textbook sweep
    merged = []
    for s, e in intervals:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    # island rule (the SQL formulation)
    islands = []
    running_max = None
    for s, e in intervals:
        if running_max is None or s > running_max:
            islands.append([s, e])
        else:
            islands[-1][0] = min(islands[-1][0], s)
            islands[-1][1] = max(islands[-1][1], e)
        running_max = e if running_max is None else max(running_max, e)
    assert [(a, b) for a, b in islands] == merged

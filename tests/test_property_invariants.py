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


# --- bloom filter bitset core (sources/bloom.py) -----------------------------


@given(
    hashes=st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
        ),
        min_size=1,
        max_size=200,
    ),
    fpp=st.sampled_from([0.1, 0.01, 0.001]),
)
@settings(max_examples=60, deadline=None)
def test_bloom_bitset_has_no_false_negatives(hashes, fpp):
    """The soundness property the whole index rests on: every (h1,h2)
    pair inserted by the numpy build path must be found by the pure-
    Python probe path — including extreme int64 values (the round-7
    review found exactly this class breaking via a float64 detour)."""
    import numpy as np

    from guidewire_spark.sources.bloom import _set_bits, _size_filter, _test_bits

    m, k = _size_filter(len(hashes), fpp)
    bits = np.zeros(m // 8, dtype=np.uint8)
    h1 = np.array([h[0] for h in hashes], dtype=np.int64).view(np.uint64)
    h2 = np.array([h[1] for h in hashes], dtype=np.int64).view(np.uint64)
    _set_bits(bits, h1, h2, k, m)
    packed = bytes(bits)
    for a, b in hashes:
        assert _test_bits(packed, a, b, k, m)


@given(
    n=st.integers(min_value=0, max_value=10_000_000),
    fpp=st.floats(min_value=1e-6, max_value=0.5),
)
@settings(max_examples=100, deadline=None)
def test_bloom_sizing_invariants(n, fpp):
    """m is byte-aligned and >= 64; k stays in [1, 16]; size grows
    monotonically with n (spot) — the arithmetic never degenerates."""
    from guidewire_spark.sources.bloom import _size_filter

    m, k = _size_filter(n, fpp)
    assert m >= 64 and m % 8 == 0
    assert 1 <= k <= 16
    m2, _ = _size_filter(n * 2 + 1, fpp)
    assert m2 >= m

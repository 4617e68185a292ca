"""Property tests (pure python/numpy — no Spark session) for the
algebraic identities the window-algebra operators rest on.  The Spark
implementations are separately oracle-verified; these pin the MATH so
a refactor can't silently bend it."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

SUB_BITS = 5


def _hdr_idx(v: int, s: int = SUB_BITS) -> int:
    """Mirror of sketches.hdr_sketch bucketing (length(bin(v))-1)."""
    e = v.bit_length() - 1
    if e <= s:
        return v
    return (e - s) * (1 << s) + (v >> (e - s))


def _hdr_rep(idx: int, s: int = SUB_BITS) -> float:
    if idx < (1 << (s + 1)):
        return float(idx)
    k = (idx >> s) - 1
    sub = idx - (k << s)
    lo = sub << k
    return lo + ((1 << k) - 1) / 2.0


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=1, max_value=2**62))
def test_hdr_bucket_relative_error_bound(v):
    """Midpoint representative within 2^-(s+1) relative error of any
    value in the bucket — the sketch's accuracy contract."""
    rep = _hdr_rep(_hdr_idx(v))
    assert abs(rep - v) / v <= 2 ** (-(SUB_BITS + 1)) + 1e-12, (v, rep)


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=1, max_value=2**62 - 1))
def test_hdr_bucket_monotone(v):
    """idx is nondecreasing in v — required for cumulative-count
    quantile selection to be order-correct."""
    assert _hdr_idx(v) <= _hdr_idx(v + 1)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-10**6, max_value=10**6),
        min_size=1,
        max_size=200,
    )
)
def test_cusum_telescoping_identity(devs):
    """The window-algebra form (p - running_min(0, p)) equals the
    clamped recursion s_t = max(0, s_{t-1} + d_t) — the identity
    analytics.cusum compiles to; and symmetrically for the minus
    side."""
    d = np.array(devs, dtype=np.int64)
    p = np.cumsum(d)
    lo = np.minimum(np.minimum.accumulate(p), 0)
    hi = np.maximum(np.maximum.accumulate(p), 0)
    s_plus_window = p - lo
    s_minus_window = hi - p
    sp = sm = 0
    for i, x in enumerate(d):
        sp = max(0, sp + x)
        sm = max(0, sm - x)
        assert s_plus_window[i] == sp, (i, devs)
        assert s_minus_window[i] == sm, (i, devs)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=10**7),
        min_size=1,
        max_size=300,
    ),
    st.sampled_from([(1, 2), (19, 20), (99, 100)]),
)
def test_hdr_nearest_rank_selection(cents, q):
    """Integer rank selection over bucket counts picks the bucket
    containing the true nearest-rank element."""
    num, den = q
    idxs = np.array(sorted(_hdr_idx(v) for v in cents))
    n = len(idxs)
    r = (num * n + den - 1) // den
    chosen = idxs[r - 1]  # bucket of the rank-r element
    # replicate the operator: first idx whose cumulative count >= r
    uniq, counts = np.unique(idxs, return_counts=True)
    cum = np.cumsum(counts)
    sel = uniq[np.searchsorted(cum, r)]
    assert sel == chosen


# --- prefix-filtering completeness (operators.dedup.prefix_jaccard_pairs) ---
#
# Theorem (SSJoin/PPJoin): under ANY shared total order of tokens, if
# J(A,B) >= tau then the first |X| - ceil(tau*|X|) + 1 tokens of each
# set intersect.  The Spark operator's candidate step relies on exactly
# this with the (df, token) order; the pure-python mirror checks the
# integer prefix-length formula over random corpora so a boundary slip
# (the +1, the ceil) can't hide behind a friendly fixture.

@given(
    st.lists(
        st.frozensets(st.integers(0, 30), min_size=1, max_size=20),
        min_size=2, max_size=8,
    ),
    st.integers(1, 9),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_completeness(sets, tau_num):
    tau_den = 10
    # shared order: ascending corpus df, ties by token id (any total
    # order works for the theorem; this is the operator's choice)
    from collections import Counter

    df = Counter()
    for s in sets:
        df.update(s)
    order = lambda t: (df[t], t)

    def prefix(s):
        sz = len(s)
        ceil_t = (tau_num * sz + tau_den - 1) // tau_den
        p = sz - ceil_t + 1
        return set(sorted(s, key=order)[:p])

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            union = len(a | b)
            if tau_den * inter >= tau_num * union:  # J >= tau
                assert prefix(a) & prefix(b), (
                    f"completeness violated: J={inter}/{union} "
                    f">= {tau_num}/{tau_den} but prefixes disjoint"
                )

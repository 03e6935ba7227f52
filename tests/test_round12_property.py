"""Round-12 property tests: the exact-tail kernels under randomized
inputs — mathematical invariants (symmetry, monotonicity, boundary
behavior) that hold for the TRUE functions must hold for the
fixed-depth kernels, plus batched cross-engine agreement."""

import math
import random

import pytest
from hypothesis import given, settings, strategies as st

from tap_airbyte_wrapper_spark.operators.tails import (
    chi2_sf,
    f_sf,
    ibeta,
    ibeta_chain_sql,
    igamma_chain_sql,
    igamma_q,
    t_sf1,
    t_sf2,
)

# excluded from the driver's budgeted run (see pytest.ini): multi-minute tier
pytestmark = pytest.mark.slow


@settings(max_examples=200, deadline=None)
@given(a=st.floats(0.5, 300.0), b=st.floats(0.5, 100.0),
       x=st.floats(0.0, 1.0))
def test_ibeta_symmetry_and_range(a, b, x):
    """I_x(a,b) + I_{1-x}(b,a) == 1 (the defining reflection), and the
    value is a probability."""
    v = ibeta(a, b, x)
    assert -1e-12 <= v <= 1.0 + 1e-12
    assert v + ibeta(b, a, 1.0 - x) == pytest.approx(1.0, abs=5e-10)


@settings(max_examples=100, deadline=None)
@given(a=st.floats(0.5, 300.0), b=st.floats(0.5, 100.0),
       x1=st.floats(0.01, 0.99), x2=st.floats(0.01, 0.99))
def test_ibeta_monotone_in_x(a, b, x1, x2):
    lo, hi = min(x1, x2), max(x1, x2)
    assert ibeta(a, b, lo) <= ibeta(a, b, hi) + 1e-10


@settings(max_examples=150, deadline=None)
@given(dof=st.floats(1.0, 1e6), t1=st.floats(0.0, 50.0),
       t2=st.floats(0.0, 50.0))
def test_t_tail_monotone_and_consistent(dof, t1, t2):
    """sf2 decreasing in |t|; sf1(t) + sf1(-t) == 1; sf2(0) == 1."""
    lo, hi = min(t1, t2), max(t1, t2)
    assert t_sf2(hi, dof) <= t_sf2(lo, dof) + 1e-12
    assert t_sf1(t1, dof) + t_sf1(-t1, dof) == pytest.approx(
        1.0, abs=1e-12)
    assert t_sf2(0.0, dof) == 1.0


@settings(max_examples=100, deadline=None)
@given(dof=st.floats(1e5, 1e8), t=st.floats(0.0, 8.0))
def test_t_tail_approaches_normal_at_huge_dof(dof, t):
    """T(dof) -> N(0,1): at dof >= 1e5 the exact tail sits within
    1e-4 of the module's A&S normal tail (sanity that the huge-dof
    regime did not break under the CF)."""
    from tap_airbyte_wrapper_spark.operators.stats import _normal_sf2

    assert t_sf2(t, dof) == pytest.approx(_normal_sf2(t), abs=1e-4)


@settings(max_examples=150, deadline=None)
@given(a=st.floats(0.5, 500.0), x1=st.floats(0.0, 1500.0),
       x2=st.floats(0.0, 1500.0))
def test_igamma_monotone_and_range(a, x1, x2):
    lo, hi = min(x1, x2), max(x1, x2)
    qlo, qhi = igamma_q(a, lo), igamma_q(a, hi)
    assert -1e-12 <= qhi <= qlo <= 1.0 + 1e-12
    assert igamma_q(a, 0.0) == 1.0


@settings(max_examples=100, deadline=None)
@given(k=st.integers(1, 400), xm=st.floats(0.05, 4.0))
def test_chi2_sf_additivity_smoke(k, xm):
    """chi2 tail is a probability, decreasing in x, and at even dof
    matches the finite Poisson-sum closed form
    Q = exp(-x/2) * sum_{j<k/2} (x/2)^j / j!."""
    x = k * xm
    v = chi2_sf(x, float(k))
    assert -1e-12 <= v <= 1.0 + 1e-12
    assert chi2_sf(x * 1.5, float(k)) <= v + 1e-10
    if k % 2 == 0 and x / 2 < 600:
        term, ssum = 1.0, 1.0
        for j in range(1, k // 2):
            term *= (x / 2) / j
            ssum += term
        closed = math.exp(-x / 2) * ssum
        assert v == pytest.approx(closed, rel=1e-8, abs=1e-10)


@settings(max_examples=80, deadline=None)
@given(d1=st.floats(1.0, 200.0), d2=st.floats(1.0, 5000.0),
       f=st.floats(0.0, 100.0))
def test_f_tail_range_and_reciprocal(d1, d2, f):
    v = f_sf(f, d1, d2)
    assert -1e-12 <= v <= 1.0 + 1e-12
    if f > 1e-6:
        assert v == pytest.approx(1.0 - f_sf(1.0 / f, d2, d1),
                                  abs=1e-9)


def test_chains_match_python_on_random_batch():
    """ONE DuckDB query per kernel over 200 seeded-random rows — the
    cross-engine agreement property at scale (per-example duckdb
    round-trips would be too slow for hypothesis)."""
    import duckdb

    rng = random.Random(12012)
    beta_rows, gamma_rows = [], []
    for i in range(200):
        a = math.exp(rng.uniform(math.log(0.5), math.log(500.0)))
        b = math.exp(rng.uniform(math.log(0.5), math.log(100.0)))
        x = rng.random()
        beta_rows.append((i, a, b, x))
        ga = math.exp(rng.uniform(math.log(0.5), math.log(500.0)))
        gx = ga * rng.uniform(0.0, 4.0)
        gamma_rows.append((i, ga, gx))
    con = duckdb.connect()
    bv = ", ".join(f"({i}, CAST({a!r} AS DOUBLE), "
                   f"CAST({b!r} AS DOUBLE), CAST({x!r} AS DOUBLE))"
                   for i, a, b, x in beta_rows)
    con.execute(f"CREATE VIEW tb AS SELECT * FROM (VALUES {bv}) "
                "v(id, a, b, x)")
    got = {int(r[0]): r[1] for r in con.execute(ibeta_chain_sql(
        "tb", [("a", "b", "x", "p")], keep=("id",))).fetchall()}
    for i, a, b, x in beta_rows:
        assert abs(got[i] - ibeta(a, b, x)) < 1e-12, (a, b, x)
    gv = ", ".join(f"({i}, CAST({a!r} AS DOUBLE), "
                   f"CAST({x!r} AS DOUBLE))"
                   for i, a, x in gamma_rows)
    con.execute(f"CREATE VIEW tg AS SELECT * FROM (VALUES {gv}) "
                "v(id, a, x)")
    got = {int(r[0]): r[1] for r in con.execute(igamma_chain_sql(
        "tg", "a", "x", keep=("id",))).fetchall()}
    for i, a, x in gamma_rows:
        assert abs(got[i] - igamma_q(a, x)) < 1e-12, (a, x)

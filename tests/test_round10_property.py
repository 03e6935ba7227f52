"""Round-10 property tests (hypothesis): the p-value kernels behind
the statistics toolkit.  Driver-side pure Python — no SparkSession —
so hypothesis can run hundreds of examples in seconds; the Spark-side
plumbing is covered by test_round10b_ops and the oracle parity suite.
"""
from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from tap_airbyte_wrapper_spark.operators.stats import (
    _POISSON1_CDF,
    _kolmogorov_sf,
    _normal_sf1,
    _normal_sf2,
)

import pytest
# excluded from the driver's budgeted run (see pytest.ini): multi-minute tier
pytestmark = pytest.mark.slow


# ------------------------------------------------ normal tail kernel

@settings(max_examples=400, deadline=None)
@given(st.floats(min_value=-40, max_value=40, allow_nan=False))
def test_normal_sf2_matches_erfc(z):
    """The A&S 7.1.26 polynomial tracks the exact erfc within its
    published 1.5e-7 bound (two-sided: 2x the erf error budget)."""
    exact = math.erfc(abs(z) / math.sqrt(2.0))
    assert abs(_normal_sf2(z) - exact) <= 3.1e-7


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-40, max_value=40, allow_nan=False))
def test_normal_sf2_bounds_and_symmetry(z):
    p = _normal_sf2(z)
    assert 0.0 <= p <= 1.0
    assert p == _normal_sf2(-z)


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0, max_value=39, allow_nan=False),
       st.floats(min_value=1e-6, max_value=1.0, allow_nan=False))
def test_normal_sf2_monotone_decreasing(z, dz):
    assert _normal_sf2(z + dz) <= _normal_sf2(z) + 1e-12


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-40, max_value=40, allow_nan=False))
def test_normal_sf1_complements(z):
    """One-sided tails of z and -z partition the unit mass (within
    the A&S polynomial's published error budget)."""
    assert abs(_normal_sf1(z) + _normal_sf1(-z) - 1.0) < 3.1e-7


# ------------------------------------------------ Kolmogorov kernel

@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=0.0, max_value=10.0, allow_nan=False))
def test_kolmogorov_sf_bounds(lam):
    assert 0.0 <= _kolmogorov_sf(lam) <= 1.0


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0.3, max_value=5.0, allow_nan=False),
       st.floats(min_value=1e-3, max_value=1.0, allow_nan=False))
def test_kolmogorov_sf_monotone_decreasing(lam, dlam):
    """Decreasing on the statistically meaningful range (below ~0.3
    the truncated alternating series saturates at the clamp)."""
    assert _kolmogorov_sf(lam + dlam) <= _kolmogorov_sf(lam) + 1e-9


def test_kolmogorov_sf_known_quantiles():
    """Classical critical values: Q(1.358) ~ 0.05, Q(1.628) ~ 0.01."""
    assert abs(_kolmogorov_sf(1.358) - 0.05) < 2e-3
    assert abs(_kolmogorov_sf(1.628) - 0.01) < 1e-3
    assert _kolmogorov_sf(0.0) == 1.0


# ------------------------------------------------ Poisson(1) inverse CDF

def test_poisson1_cdf_is_the_cumulative_pmf():
    cum, fact = 0.0, 1.0
    for k, thr in enumerate(_POISSON1_CDF):
        if k > 0:
            fact *= k
        cum += math.exp(-1.0) / fact
        assert abs(thr - cum) < 1e-12
    assert all(b > a for a, b in zip(_POISSON1_CDF, _POISSON1_CDF[1:]))


def test_poisson1_weight_mean_is_one():
    """w = #{thresholds <= u}, so E[w] = sum_k P(u >= t_k)
    = E[min(X, 9)] = 1 minus the truncated >9 tail (< 1.1e-7)."""
    mean_w = sum(1.0 - t for t in _POISSON1_CDF)
    assert abs(mean_w - 1.0) < 1e-6

"""Property tests for the round-11 kernels: the bit-parallel LCS vs
the textbook DP, and the k=2 degeneracies of the new k-group ops."""
import math

import pytest
from hypothesis import given, settings, strategies as st

# excluded from the driver's budgeted run (see pytest.ini): multi-minute tier
pytestmark = pytest.mark.slow


def _lcs_bitparallel(a, b):
    """Mirror of the rouge_l_per_doc kernel (Allison-Dix)."""
    masks = {}
    for i, tok in enumerate(a):
        masks[tok] = masks.get(tok, 0) | (1 << i)
    row = 0
    for tok in b:
        x = row | masks.get(tok, 0)
        row = x & ~(x - ((row << 1) | 1))
    return row.bit_count()


def _lcs_dp(a, b):
    """Textbook O(n*m) cell DP — the independent reference."""
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y
                       else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from("abcd"), max_size=40),
       st.lists(st.sampled_from("abcd"), max_size=40))
def test_bitparallel_lcs_equals_textbook_dp(a, b):
    assert _lcs_bitparallel(a, b) == _lcs_dp(a, b)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from("abc"), min_size=1, max_size=25))
def test_lcs_identity_and_subsequence_bounds(a):
    assert _lcs_bitparallel(a, a) == len(a)
    sub = a[::2]
    assert _lcs_bitparallel(sub, a) == len(sub)
    assert _lcs_bitparallel(a, list(reversed(a))) >= 1


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(-100, 100, allow_nan=False), min_size=3,
                max_size=25),
       st.lists(st.floats(-100, 100, allow_nan=False), min_size=3,
                max_size=25))
def test_welch_anova_k2_is_t_squared_property(spark, xs, ys):
    """For ANY two samples with positive variances, Welch's F at k=2
    equals t^2 and df2 equals the Welch-Satterthwaite df."""
    import statistics

    from tap_airbyte_wrapper_spark.operators import (welch_anova,
                                                     welch_t_test)

    if statistics.variance(xs) <= 0 or statistics.variance(ys) <= 0:
        return
    df = spark.createDataFrame(
        [(float(v), "a") for v in xs] + [(float(v), "b") for v in ys],
        "v double, g string")
    f = welch_anova(df, "v", "g").first()
    t = welch_t_test(df, "v", "g", "a", "b").first()
    assert f["f_stat"] == pytest.approx(t["t_stat"] ** 2, rel=1e-3,
                                        abs=1e-5)
    assert f["df2"] == pytest.approx(t["dof"], rel=1e-4, abs=1e-4)


def test_normal_ppf_round_trips_the_sf(spark):
    """Acklam's inverse composed with the module's A&S tail is the
    identity to ~1e-6 across the gate-relevant range."""
    from tap_airbyte_wrapper_spark.operators.stats import (_normal_ppf,
                                                           _normal_sf1)

    for p in [0.001, 0.01, 0.025, 0.1, 0.2, 0.5, 0.8, 0.975, 0.999]:
        z = _normal_ppf(p)
        assert _normal_sf1(z) == pytest.approx(1 - p, abs=2e-6), p
    with pytest.raises(ValueError):
        _normal_ppf(0.0)

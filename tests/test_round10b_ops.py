"""Round-10 second batch: the two-sample statistics toolkit
(KS / Mann-Whitney / Welch / chi-square / Poisson bootstrap / ACF).

Pinned values are hand-computed or textbook; the randomized cases
cross-check against independent numpy reimplementations.
"""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from tap_airbyte_wrapper_spark.operators import (
    autocorrelation,
    bootstrap_ci,
    chi_square_independence,
    ks_test,
    mann_whitney_u,
    welch_t_test,
)


def _two_group_df(spark, a, b):
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    return spark.createDataFrame(rows, "v double, g string")


# ---------------------------------------------------------------------
# Kolmogorov-Smirnov
# ---------------------------------------------------------------------

def test_ks_interleaved_samples_small_d(spark):
    """a=[1..8], b=a+0.5: ECDFs interleave, D = 1/8 exactly, p ~ 1."""
    row = ks_test(_two_group_df(spark, range(1, 9),
                                [v + 0.5 for v in range(1, 9)]),
                  "v", "g", "a", "b").first()
    assert row["n_a"] == row["n_b"] == 8
    assert row["d_stat"] == 0.125
    assert row["p_value"] > 0.99


def test_ks_planted_shift_detected(spark):
    """Disjoint-ish supports: D large, p ~ 0."""
    row = ks_test(_two_group_df(spark, range(50),
                                [v + 40 for v in range(50)]),
                  "v", "g", "a", "b").first()
    assert row["d_stat"] == 0.8
    assert row["p_value"] < 1e-6


def test_ks_matches_numpy_ecdf_bruteforce(spark):
    rng = random.Random(7)
    a = [rng.gauss(0, 1) for _ in range(300)]
    b = [rng.gauss(0.3, 1.2) for _ in range(200)]
    row = ks_test(_two_group_df(spark, a, b), "v", "g", "a", "b").first()
    xs = np.sort(np.unique(np.concatenate([a, b])))
    fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    assert row["d_stat"] == pytest.approx(np.max(np.abs(fa - fb)),
                                          abs=1e-6)


def test_ks_identical_groups_p_one(spark):
    """D = 0 exactly -> the truncated Kolmogorov series is in its
    divergent region; the kernel's small-lambda clamp must return the
    true tail, p = 1."""
    a = [float(i) for i in range(50)]
    row = ks_test(_two_group_df(spark, a, a), "v", "g", "a", "b").first()
    assert row["d_stat"] == 0.0 and row["p_value"] == 1.0


def test_ks_empty_group_nulls(spark):
    row = ks_test(_two_group_df(spark, [1.0, 2.0], []),
                  "v", "g", "a", "b").first()
    assert row["n_b"] == 0
    assert row["d_stat"] is None and row["p_value"] is None


# ---------------------------------------------------------------------
# Mann-Whitney U
# ---------------------------------------------------------------------

def test_mann_whitney_disjoint_hand_values(spark):
    """[1..5] vs [6..10]: Ra = 15, U = 0; z = -12.5/sqrt(275/12)
    = -2.611165.  No ties at n = 5 per group -> the r13 EXACT null
    fires: p = 2 * 1/C(10,5) = 2/252 (U = 0 is the single most
    extreme arrangement), where the old normal approximation read
    0.009024."""
    row = mann_whitney_u(_two_group_df(spark, [1, 2, 3, 4, 5],
                                       [6, 7, 8, 9, 10]),
                         "v", "g", "a", "b").first()
    assert row["u_stat"] == 0.0
    assert row["z"] == pytest.approx(-2.611165, abs=1e-6)
    assert row["method"] == "exact"
    assert row["p_value"] == pytest.approx(2.0 / 252.0, abs=1e-6)


def test_mann_whitney_tied_hand_values(spark):
    """a=[1,2,2,3], b=[2,3,3,4]: average ranks give Ra = 13, U = 3
    (ties split across groups — the integer 2*Ra path must average,
    not min- or max-rank)."""
    row = mann_whitney_u(
        _two_group_df(spark, [1, 2, 2, 3], [2, 3, 3, 4]),
        "v", "g", "a", "b").first()
    assert row["u_stat"] == 3.0


def test_mann_whitney_matches_numpy_bruteforce(spark):
    """Randomized cross-check of U, tie-corrected z, and p against an
    independent average-rank reimplementation (scipy's definition)."""
    rng = random.Random(11)
    a = [float(rng.randint(0, 20)) for _ in range(150)]
    b = [float(rng.randint(2, 22)) for _ in range(120)]
    row = mann_whitney_u(_two_group_df(spark, a, b),
                         "v", "g", "a", "b").first()
    allv = np.array(a + b)
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(len(allv))
    sorted_v = allv[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based average rank
        i = j
    ra = ranks[:len(a)].sum()
    u = ra - len(a) * (len(a) + 1) / 2
    n = len(allv)
    _, counts = np.unique(allv, return_counts=True)
    ties = float((counts ** 3 - counts).sum())
    var = len(a) * len(b) / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - len(a) * len(b) / 2.0) / math.sqrt(var)
    assert row["u_stat"] == pytest.approx(u, abs=1e-9)
    assert row["z"] == pytest.approx(z, abs=1e-6)  # output rounds to 6


def test_mann_whitney_degenerate_all_tied(spark):
    row = mann_whitney_u(_two_group_df(spark, [5, 5, 5], [5, 5]),
                         "v", "g", "a", "b").first()
    assert row["z"] is None and row["p_value"] is None


# ---------------------------------------------------------------------
# Welch's t
# ---------------------------------------------------------------------

def test_welch_hand_values(spark):
    """[1..5] vs [6..10]: equal variances 2.5, t = -5/sqrt(1) = -5,
    Welch-Satterthwaite df = 8 exactly."""
    row = welch_t_test(_two_group_df(spark, [1, 2, 3, 4, 5],
                                     [6, 7, 8, 9, 10]),
                       "v", "g", "a", "b").first()
    assert row["t_stat"] == -5.0
    assert row["dof"] == 8.0
    assert row["p_value"] < 0.01


def test_welch_unequal_variances(spark):
    """Unequal n and variance: df must fall strictly between
    min(n)-1 and n_a+n_b-2 (the Welch-Satterthwaite envelope)."""
    rng = random.Random(3)
    a = [rng.gauss(0, 1) for _ in range(40)]
    b = [rng.gauss(0, 5) for _ in range(10)]
    row = welch_t_test(_two_group_df(spark, a, b),
                       "v", "g", "a", "b").first()
    assert 9 <= row["dof"] <= 48
    wa = np.var(a, ddof=1) / 40
    wb = np.var(b, ddof=1) / 10
    t = (np.mean(a) - np.mean(b)) / math.sqrt(wa + wb)
    assert row["t_stat"] == pytest.approx(t, abs=1e-6)


def test_welch_degenerate_tiny_group(spark):
    row = welch_t_test(_two_group_df(spark, [1, 2, 3], [7]),
                       "v", "g", "a", "b").first()
    assert row["t_stat"] is None and row["p_value"] is None


# ---------------------------------------------------------------------
# Chi-square independence
# ---------------------------------------------------------------------

def test_chi2_textbook_2x2(spark):
    """[[10,20],[30,40]]: chi2 = n(ad-bc)^2/(r1 r2 c1 c2) =
    100*200^2/(30*70*40*60) = 0.793651, V = sqrt(chi2/n) = 0.089087."""
    rows = ([("x1", "y1")] * 10 + [("x1", "y2")] * 20
            + [("x2", "y1")] * 30 + [("x2", "y2")] * 40)
    row = chi_square_independence(
        spark.createDataFrame(rows, "x string, y string"),
        "x", "y").first()
    assert row["n"] == 100 and row["dof"] == 1
    assert row["chi2"] == pytest.approx(0.793651, abs=1e-6)
    assert row["cramers_v"] == pytest.approx(0.089087, abs=1e-6)


def test_chi2_zero_cell_contributes(spark):
    """(b,2) never observed but both marginals positive: the grid left
    join must supply the cell (e = 2.5 -> contributes 2.5).  Summing
    observed cells only would give 4.166667 instead of 6.666667."""
    rows = ([("a", "1")] * 5 + [("a", "2")] * 5 + [("b", "1")] * 10)
    row = chi_square_independence(
        spark.createDataFrame(rows, "x string, y string"),
        "x", "y").first()
    assert row["chi2"] == pytest.approx(6.666667, abs=1e-6)
    assert row["cramers_v"] == pytest.approx(math.sqrt(6.666667 / 20),
                                             abs=1e-6)


def test_chi2_single_category_degenerate(spark):
    row = chi_square_independence(
        spark.createDataFrame([("a", "1"), ("a", "2")],
                              "x string, y string"),
        "x", "y").first()
    assert row["dof"] == 0 and row["cramers_v"] is None


# ---------------------------------------------------------------------
# Poisson bootstrap
# ---------------------------------------------------------------------

def test_bootstrap_deterministic_and_brackets_mean(spark):
    df = spark.createDataFrame(
        [(i, float(i % 17)) for i in range(600)], "id long, v double")
    r1 = bootstrap_ci(df, "v", "id", n_boot=100, salt="s").first()
    r2 = bootstrap_ci(df, "v", "id", n_boot=100, salt="s").first()
    assert r1 == r2  # same salt -> bit-identical draws
    assert r1["ci_lo"] <= r1["mean"] <= r1["ci_hi"]
    # CI width for a 600-row uniform-ish sample: sd ~ 4.9 -> se ~ 0.2
    assert 0.3 < r1["ci_hi"] - r1["ci_lo"] < 1.5
    r3 = bootstrap_ci(df, "v", "id", n_boot=100, salt="other").first()
    assert (r3["ci_lo"], r3["ci_hi"]) != (r1["ci_lo"], r1["ci_hi"])


def test_bootstrap_constant_column_zero_width(spark):
    df = spark.createDataFrame([(i, 5.0) for i in range(50)],
                               "id long, v double")
    row = bootstrap_ci(df, "v", "id", n_boot=20).first()
    assert row["ci_lo"] == row["ci_hi"] == row["mean"] == 5.0


def test_bootstrap_validates_params(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError):
        bootstrap_ci(df, "v", "id", n_boot=1)
    with pytest.raises(ValueError):
        bootstrap_ci(df, "v", "id", conf=1.5)


# ---------------------------------------------------------------------
# Autocorrelation
# ---------------------------------------------------------------------

def test_acf_alternating_series(spark):
    """Perfect period-2 series: biased estimator gives
    r_k = (n-k)/n * (-1)^k."""
    df = spark.createDataFrame([(t, float(t % 2)) for t in range(100)],
                               "t long, v double")
    rows = {r["lag"]: r for r in autocorrelation(df, "t", "v", 4)
            .collect()}
    assert rows[1]["acf"] == pytest.approx(-0.99, abs=1e-6)
    assert rows[2]["acf"] == pytest.approx(0.98, abs=1e-6)
    assert rows[1]["n_pairs"] == 99


def test_acf_constant_series_null(spark):
    df = spark.createDataFrame([(t, 3.0) for t in range(20)],
                               "t long, v double")
    assert all(r["acf"] is None
               for r in autocorrelation(df, "t", "v", 2).collect())


def test_acf_gaps_drop_pairs(spark):
    """Indices {0,1,3,4}: lag-1 pairs (0,1),(3,4); lag-2 only (1,3) —
    pairwise-complete convention, gaps just drop out."""
    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (3, 4.0), (4, 1.0)], "t long, v double")
    rows = {r["lag"]: r["n_pairs"]
            for r in autocorrelation(df, "t", "v", 2).collect()}
    assert rows[1] == 2
    assert rows[2] == 1


def test_acf_validates_lag(spark):
    df = spark.createDataFrame([(0, 1.0)], "t long, v double")
    with pytest.raises(ValueError):
        autocorrelation(df, "t", "v", 0)


# ---------------------------------------------------------------------
# Jarque-Bera
# ---------------------------------------------------------------------

def test_jarque_bera_uniform_matches_numpy(spark):
    """Uniform sample: skew ~ 0, excess kurtosis ~ -1.2 -> JB fires.
    Exact-value cross-check against numpy central moments."""
    from tap_airbyte_wrapper_spark.operators import jarque_bera

    rng = np.random.RandomState(5)
    vals = rng.uniform(size=1000)
    row = jarque_bera(
        spark.createDataFrame([(float(v),) for v in vals], "v double"),
        "v").first()
    m = vals.mean()
    c = vals - m
    m2, m3, m4 = (c ** 2).mean(), (c ** 3).mean(), (c ** 4).mean()
    g1, g2 = m3 / m2 ** 1.5, m4 / m2 ** 2 - 3
    assert row["skewness"] == pytest.approx(g1, abs=1e-6)
    assert row["ex_kurtosis"] == pytest.approx(g2, abs=1e-6)
    assert row["jb"] == pytest.approx(1000 / 6 * (g1 * g1 + g2 * g2 / 4),
                                      abs=1e-4)
    assert row["p_value"] < 1e-6


def test_jarque_bera_normalish_accepts(spark):
    """Sum of 12 uniforms - 6 ~ N(0,1) (Irwin-Hall): JB small, p big."""
    from tap_airbyte_wrapper_spark.operators import jarque_bera

    rng = np.random.RandomState(9)
    vals = rng.uniform(size=(500, 12)).sum(axis=1) - 6
    row = jarque_bera(
        spark.createDataFrame([(float(v),) for v in vals], "v double"),
        "v").first()
    assert row["p_value"] > 0.05


def test_jarque_bera_degenerate(spark):
    from tap_airbyte_wrapper_spark.operators import jarque_bera

    row = jarque_bera(
        spark.createDataFrame([(3.0,), (3.0,), (3.0,)], "v double"),
        "v").first()
    assert row["jb"] is None and row["p_value"] is None


# ---------------------------------------------------------------------
# Two-proportion z
# ---------------------------------------------------------------------

def test_proportion_z_hand_values(spark):
    """45/100 vs 30/100: pooled p = 0.375, z = 0.15/sqrt(0.375*0.625*
    0.02) = 2.19089."""
    from tap_airbyte_wrapper_spark.operators import proportion_z_test

    rows = ([(1, "a")] * 45 + [(0, "a")] * 55
            + [(1, "b")] * 30 + [(0, "b")] * 70)
    row = proportion_z_test(
        spark.createDataFrame(rows, "s int, g string"),
        "s", "g", "a", "b").first()
    assert row["p_a"] == 0.45 and row["p_b"] == 0.3
    assert row["z"] == pytest.approx(2.19089, abs=1e-5)
    assert row["p_value"] == pytest.approx(0.028459, abs=1e-4)


def test_proportion_z_degenerate_all_failures(spark):
    from tap_airbyte_wrapper_spark.operators import proportion_z_test

    rows = [(0, "a")] * 5 + [(0, "b")] * 5
    row = proportion_z_test(
        spark.createDataFrame(rows, "s int, g string"),
        "s", "g", "a", "b").first()
    assert row["z"] is None and row["p_a"] == 0.0


# ---------------------------------------------------------------------
# Seasonal decomposition
# ---------------------------------------------------------------------

def test_seasonal_decompose_exact_recovery_odd_period(spark):
    """Linear trend + zero-mean period-3 pattern: the MA-3 trend is
    exactly the line, the phase means are exactly the pattern, and
    every interior residual is 0."""
    from tap_airbyte_wrapper_spark.operators import seasonal_decompose

    pat = [3.0, -1.0, -2.0]
    rows = [(t, 10 + 0.5 * t + pat[t % 3]) for t in range(30)]
    out = seasonal_decompose(
        spark.createDataFrame(rows, "t long, v double"),
        "t", "v", period=3).collect()
    assert len(out) == 30
    interior = [r for r in out if r["trend"] is not None]
    assert len(interior) == 28  # one edge row lost each side
    for r in interior:
        assert r["trend"] == pytest.approx(10 + 0.5 * r["t"], abs=1e-6)
        assert r["seasonal"] == pytest.approx(pat[r["t"] % 3], abs=1e-6)
        assert r["residual"] == pytest.approx(0.0, abs=1e-6)


def test_seasonal_decompose_even_period_2xma(spark):
    """Even period uses the half-weighted-ends 2xMA filter, which
    also cancels a zero-mean period-2 pattern on a line exactly."""
    from tap_airbyte_wrapper_spark.operators import seasonal_decompose

    pat = [1.0, -1.0]
    rows = [(t, 5 + 0.25 * t + pat[t % 2]) for t in range(20)]
    out = seasonal_decompose(
        spark.createDataFrame(rows, "t long, v double"),
        "t", "v", period=2).collect()
    interior = [r for r in out if r["trend"] is not None]
    assert len(interior) == 18
    for r in interior:
        assert r["residual"] == pytest.approx(0.0, abs=1e-6)
        assert r["seasonal"] == pytest.approx(pat[r["t"] % 2], abs=1e-6)


# ---------------------------------------------------------------------
# Benjamini-Hochberg FDR
# ---------------------------------------------------------------------

def test_bh_fdr_known_dataset(spark):
    """The classic 15-p-value example: at alpha=0.05 BH rejects
    exactly the 4 smallest (the naive per-test rule would reject 9)."""
    from tap_airbyte_wrapper_spark.operators import bh_fdr

    ps = [0.0001, 0.0004, 0.0019, 0.0095, 0.0201, 0.0278, 0.0298,
          0.0344, 0.0459, 0.324, 0.4262, 0.5719, 0.6528, 0.759, 1.0]
    out = bh_fdr(spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "id long, p double"),
        "p", "id", alpha=0.05).collect()
    assert sum(r["rejected"] for r in out) == 4
    assert [r["rejected"] for r in sorted(out, key=lambda r: r["rank"])
            ][:4] == [True] * 4


def test_bh_fdr_step_up_not_step_down(spark):
    """p = [0.01, 0.04, 0.049]: rank-2 fails (0.04 > 2/3*0.05) but
    rank-3 passes (0.049 <= 0.05) -> step-UP rejects ALL three."""
    from tap_airbyte_wrapper_spark.operators import bh_fdr

    out = bh_fdr(spark.createDataFrame(
        [(0, 0.01), (1, 0.04), (2, 0.049)], "id long, p double"),
        "p", "id", alpha=0.05).collect()
    assert all(r["rejected"] for r in out)


def test_bh_fdr_ties_reject_together(spark):
    """Tied p straddling the nominal cut: both tied rows get the same
    decision (the larger rank's easier threshold pulls its twin in)."""
    from tap_airbyte_wrapper_spark.operators import bh_fdr

    out = bh_fdr(spark.createDataFrame(
        [(0, 0.02), (1, 0.02), (2, 0.9), (3, 0.95)],
        "id long, p double"), "p", "id", alpha=0.05).collect()
    dec = {r["id"]: r["rejected"] for r in out}
    assert dec[0] == dec[1] is True


def test_bh_fdr_nothing_rejected_and_validation(spark):
    from tap_airbyte_wrapper_spark.operators import bh_fdr

    out = bh_fdr(spark.createDataFrame(
        [(0, 0.5), (1, 0.8)], "id long, p double"),
        "p", "id", alpha=0.05).collect()
    assert not any(r["rejected"] for r in out)
    with pytest.raises(ValueError):
        bh_fdr(spark.createDataFrame([(0, 0.5)], "id long, p double"),
               "p", "id", alpha=1.5)


# ---------------------------------------------------------------------
# Mutual information
# ---------------------------------------------------------------------

def test_mutual_information_perfect_dependence(spark):
    """y == x over 3 balanced categories: MI = H(X) = ln 3, NMI = 1."""
    from tap_airbyte_wrapper_spark.operators import mutual_information

    rows = [(str(i % 3), str(i % 3)) for i in range(90)]
    row = mutual_information(
        spark.createDataFrame(rows, "x string, y string"),
        "x", "y").first()
    assert row["mi"] == pytest.approx(math.log(3), abs=1e-6)
    assert row["nmi"] == 1.0


def test_mutual_information_independent(spark):
    """x and y cycle at coprime-structured phases over a full block:
    exactly independent -> MI = 0."""
    from tap_airbyte_wrapper_spark.operators import mutual_information

    rows = [(str(i % 3), str((i // 3) % 2)) for i in range(90)]
    row = mutual_information(
        spark.createDataFrame(rows, "x string, y string"),
        "x", "y").first()
    assert row["mi"] == 0.0
    assert row["h_x"] == pytest.approx(math.log(3), abs=1e-6)
    assert row["h_y"] == pytest.approx(math.log(2), abs=1e-6)


def test_mutual_information_constant_column(spark):
    from tap_airbyte_wrapper_spark.operators import mutual_information

    rows = [("a", str(i % 2)) for i in range(10)]
    row = mutual_information(
        spark.createDataFrame(rows, "x string, y string"),
        "x", "y").first()
    assert row["mi"] == 0.0 and row["nmi"] is None


# ---------------------------------------------------------------------
# Paired tests
# ---------------------------------------------------------------------

def test_wilcoxon_textbook_example(spark):
    """The classic 10-pair example: one zero difference drops (n=9),
    |d| ties at 5 get average ranks 1.5, W+ = 1.5+1.5+7+8+9 = 27."""
    from tap_airbyte_wrapper_spark.operators import wilcoxon_signed_rank

    a = [125, 115, 130, 140, 140, 115, 140, 125, 140, 135]
    b = [110, 122, 125, 120, 140, 124, 123, 137, 135, 145]
    row = wilcoxon_signed_rank(
        spark.createDataFrame(list(zip(map(float, a), map(float, b))),
                              "a double, b double"), "a", "b").first()
    assert row["n_pairs"] == 10 and row["n_nonzero"] == 9
    assert row["w_plus"] == 27.0
    # z = (W+ - n(n+1)/4)/sigma with tie-corrected sigma
    assert row["z"] == pytest.approx(0.533582, abs=1e-6)


def test_wilcoxon_one_sided_shift_detected(spark):
    """b = a + 1 everywhere: W+ = 0, z strongly negative."""
    from tap_airbyte_wrapper_spark.operators import wilcoxon_signed_rank

    rows = [(float(i), float(i + 1)) for i in range(40)]
    row = wilcoxon_signed_rank(
        spark.createDataFrame(rows, "a double, b double"),
        "a", "b").first()
    assert row["w_plus"] == 0.0
    assert row["p_value"] < 1e-6


def test_wilcoxon_all_zero_diffs(spark):
    from tap_airbyte_wrapper_spark.operators import wilcoxon_signed_rank

    rows = [(1.0, 1.0), (2.0, 2.0)]
    row = wilcoxon_signed_rank(
        spark.createDataFrame(rows, "a double, b double"),
        "a", "b").first()
    assert row["n_nonzero"] == 0 and row["z"] is None


def test_paired_t_matches_numpy(spark):
    from tap_airbyte_wrapper_spark.operators import paired_t_test

    a = [125, 115, 130, 140, 140, 115, 140, 125, 140, 135]
    b = [110, 122, 125, 120, 140, 124, 123, 137, 135, 145]
    row = paired_t_test(
        spark.createDataFrame(list(zip(map(float, a), map(float, b))),
                              "a double, b double"), "a", "b").first()
    d = np.array(a, dtype=float) - np.array(b, dtype=float)
    t = d.mean() / (d.std(ddof=1) / math.sqrt(len(d)))
    assert row["t_stat"] == pytest.approx(t, abs=1e-6)
    assert row["dof"] == 9.0
    assert row["mean_diff"] == pytest.approx(d.mean(), abs=1e-6)


def test_paired_t_degenerate_constant_diff(spark):
    from tap_airbyte_wrapper_spark.operators import paired_t_test

    rows = [(float(i), float(i) - 2.0) for i in range(10)]
    row = paired_t_test(
        spark.createDataFrame(rows, "a double, b double"),
        "a", "b").first()
    assert row["mean_diff"] == 2.0 and row["t_stat"] is None


def test_seasonal_decompose_guards(spark):
    from tap_airbyte_wrapper_spark.operators import seasonal_decompose

    df = spark.createDataFrame([(0, 1.0), (1, 2.0)], "t long, v double")
    with pytest.raises(ValueError):
        seasonal_decompose(df, "t", "v", period=1)
    with pytest.raises(ValueError, match="max_rows"):
        seasonal_decompose(df, "t", "v", period=2, max_rows=1)


# ---------------------------------------------------------------------
# Streaming drift gate (enforcement half of the drift module)
# ---------------------------------------------------------------------

def test_stream_drift_gate_quarantines_unit_switch(spark, tmp_path):
    """Reference = uniform 0..99.  Batch 1 draws from the same
    distribution and lands; batch 2 arrives with a silent unit switch
    (+500) and is quarantined WHOLE, with one report row per batch."""
    from tap_airbyte_wrapper_spark.streaming import (
        drift_reference_write,
        read_drift_gate_report,
        stream_drift_gate,
    )

    ref = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(2000)], "id long, v double")
    ref_path = str(tmp_path / "ref")
    drift_reference_write(ref, "v", ref_path, bins=16)
    art = spark.read.parquet(ref_path).collect()
    assert sum(r["p_ref"] for r in art) == pytest.approx(1.0, abs=1e-9)

    src = tmp_path / "landing"
    src.mkdir()
    out = str(tmp_path / "accepted")
    schema = "id long, v double"

    def drain(ckpt):
        q = stream_drift_gate(
            spark.readStream.schema(schema).parquet(str(src)),
            "v", ref_path, out,
            checkpoint=str(tmp_path / ckpt), max_psi=0.25)
        q.awaitTermination(120)

    good = spark.createDataFrame(
        [(1000 + j, float((j * 7) % 100)) for j in range(400)], schema)
    good.coalesce(1).write.mode("append").parquet(str(src))
    drain("ck")
    assert spark.read.parquet(out + "/batch=0").count() == 400

    shifted = spark.createDataFrame(
        [(2000 + j, float((j * 7) % 100 + 500)) for j in range(400)],
        schema)
    shifted.coalesce(1).write.mode("append").parquet(str(src))
    drain("ck")  # same checkpoint: only the new file arrives
    quarantined = spark.read.parquet(out + "/_quarantine/batch=1")
    assert quarantined.count() == 400
    assert quarantined.agg(F.min("v")).first()[0] >= 500

    report = {r["batch_id"]: r for r in
              read_drift_gate_report(spark, out).collect()}
    assert report[0]["landed"] is True and report[0]["psi"] < 0.25
    assert report[1]["landed"] is False and report[1]["psi"] > 0.25


def test_drift_reference_write_validates_empty(spark, tmp_path):
    from tap_airbyte_wrapper_spark.streaming import drift_reference_write

    empty = spark.createDataFrame([], "id long, v double")
    with pytest.raises(ValueError, match="no\\s+non-null"):
        drift_reference_write(empty, "v", str(tmp_path / "r"))


# ---------------------------------------------------------------------
# 1-D Wasserstein distance
# ---------------------------------------------------------------------

def test_wasserstein_pure_shift_equals_delta(spark):
    """b = a + 3 pointwise: W1 between the empirical distributions of
    two equal-size samples equals the shift exactly."""
    from tap_airbyte_wrapper_spark.operators import wasserstein_1d

    a = [float(i) for i in range(20)]
    row = wasserstein_1d(
        _two_group_df(spark, a, [v + 3 for v in a]),
        "v", "g", "a", "b").first()
    assert row["w1"] == 3.0


def test_wasserstein_matches_numpy_bruteforce(spark):
    """Equal sample sizes: W1 = mean |sorted_a - sorted_b| (the
    quantile-coupling closed form)."""
    from tap_airbyte_wrapper_spark.operators import wasserstein_1d

    rng = random.Random(13)
    a = [rng.gauss(0, 1) for _ in range(250)]
    b = [rng.gauss(0.4, 1.5) for _ in range(250)]
    row = wasserstein_1d(_two_group_df(spark, a, b),
                         "v", "g", "a", "b").first()
    expect = float(np.mean(np.abs(np.sort(a) - np.sort(b))))
    assert row["w1"] == pytest.approx(expect, abs=1e-6)


def test_wasserstein_identical_zero_and_empty(spark):
    from tap_airbyte_wrapper_spark.operators import wasserstein_1d

    a = [1.0, 2.0, 5.0]
    row = wasserstein_1d(_two_group_df(spark, a, a),
                         "v", "g", "a", "b").first()
    assert row["w1"] == 0.0
    row = wasserstein_1d(_two_group_df(spark, a, []),
                         "v", "g", "a", "b").first()
    assert row["w1"] is None


# ---------------------------------------------------------------------
# Kruskal-Wallis
# ---------------------------------------------------------------------

def test_kruskal_wallis_hand_example(spark):
    """Three groups with no overlap: [1,2,3], [4,5,6], [7,8,9].
    Rank sums 6, 15, 24 -> H = 12/(9*10)*(36+225+576)/3 - 3*10
    = 12/90*279 - 30 = 7.2; no ties so corrected == raw."""
    from tap_airbyte_wrapper_spark.operators import kruskal_wallis

    rows = ([(float(v), "g1") for v in [1, 2, 3]]
            + [(float(v), "g2") for v in [4, 5, 6]]
            + [(float(v), "g3") for v in [7, 8, 9]])
    row = kruskal_wallis(
        spark.createDataFrame(rows, "v double, g string"),
        "v", "g").first()
    assert row["n"] == 9 and row["k"] == 3 and row["dof"] == 2.0
    assert row["h"] == pytest.approx(7.2, abs=1e-6)
    assert row["h_tie_corrected"] == pytest.approx(7.2, abs=1e-6)
    assert row["p_value"] < 0.05  # chi2(2) upper tail at 7.2 ~ 0.027


def test_kruskal_wallis_two_groups_matches_mann_whitney_h(spark):
    """k=2 reduces to the Mann-Whitney setup: H = z^2 for the same
    data (the classical equivalence, tie-corrected both sides)."""
    from tap_airbyte_wrapper_spark.operators import (
        kruskal_wallis, mann_whitney_u)

    rng = random.Random(17)
    rows = ([(float(rng.randint(0, 30)), "a") for _ in range(80)]
            + [(float(rng.randint(5, 35)), "b") for _ in range(60)])
    df = spark.createDataFrame(rows, "v double, g string")
    h = kruskal_wallis(df, "v", "g").first()["h_tie_corrected"]
    z = mann_whitney_u(df, "v", "g", "a", "b").first()["z"]
    assert h == pytest.approx(z * z, abs=1e-4)


def test_kruskal_wallis_degenerate(spark):
    from tap_airbyte_wrapper_spark.operators import kruskal_wallis

    rows = [(5.0, "a"), (5.0, "a"), (5.0, "b")]
    row = kruskal_wallis(
        spark.createDataFrame(rows, "v double, g string"),
        "v", "g").first()
    assert row["h_tie_corrected"] is None  # all values tied
    single = kruskal_wallis(
        spark.createDataFrame([(1.0, "a"), (2.0, "a")],
                              "v double, g string"), "v", "g").first()
    assert single["h"] is None  # k < 2


# ---------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------

def test_pmi_collocations_hand_example(spark):
    """Corpus of 3 docs: only (new, york) clears min_count=2.
    PMI = ln((2/5) / ((2/8)*(3/8))) = ln(4.2667) = 1.450907."""
    from tap_airbyte_wrapper_spark.functions import pmi_collocations

    df = spark.createDataFrame(
        [(1, "new york city"), (2, "new york times"), (3, "old york")],
        "doc_id long, text string")
    out = pmi_collocations(df, min_count=2, k=10).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["w1"], row["w2"], row["pair_count"]) == ("new", "york", 2)
    assert row["pmi"] == pytest.approx(
        math.log((2 / 5) / ((2 / 8) * (3 / 8))), abs=1e-5)


def test_pmi_glued_pair_beats_frequent_pair(spark):
    """'machine learning' always co-occurs; 'of the' is frequent but
    both words appear everywhere — PMI must rank the glued pair
    first even though the frequent pair has more occurrences."""
    from tap_airbyte_wrapper_spark.functions import pmi_collocations

    rows = [(i, "machine learning rocks") for i in range(5)]
    rows += [(100 + i, "some of the stuff of the day of note")
             for i in range(10)]
    out = pmi_collocations(
        spark.createDataFrame(rows, "doc_id long, text string"),
        min_count=5, k=20).collect()
    pairs = [(r["w1"], r["w2"]) for r in out]
    assert pairs.index(("machine", "learning")) < pairs.index(("of", "the"))


def test_pmi_single_token_docs_no_bigrams(spark):
    from tap_airbyte_wrapper_spark.functions import pmi_collocations

    df = spark.createDataFrame([(1, "hello"), (2, "")],
                               "doc_id long, text string")
    assert pmi_collocations(df, min_count=1).count() == 0


# ---------------------------------------------------------------------
# BLEU / ROUGE
# ---------------------------------------------------------------------

def test_bleu_identity_and_clipping(spark):
    """Identical pairs score bleu=1 everywhere; the degenerate
    repeated-candidate case pins Papineni clipping (p1 = 2/7)."""
    from tap_airbyte_wrapper_spark.functions import bleu_rouge_corpus

    same = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog",
          "the quick brown fox jumps over the lazy dog")],
        "id long, cand string, ref string")
    row = bleu_rouge_corpus(same, "cand", "ref", "id").first()
    assert row["bleu"] == 1.0 and row["p4"] == 1.0
    assert row["rouge1_r"] == 1.0 and row["bp"] == 1.0

    clip = spark.createDataFrame(
        [(1, "the the the the the the the", "the cat is on the mat")],
        "id long, cand string, ref string")
    row = bleu_rouge_corpus(clip, "cand", "ref", "id", max_n=1).first()
    assert row["p1"] == pytest.approx(2 / 7, abs=1e-6)


def test_bleu_brevity_penalty(spark):
    """cand = exact 2-token prefix of a 5-token reference: every p_n
    = 1, bp = exp(1 - r/c) = exp(1 - 5/2) = exp(-1.5)."""
    from tap_airbyte_wrapper_spark.functions import bleu_rouge_corpus

    df = spark.createDataFrame(
        [(1, "the cat", "the cat is right here")],
        "id long, cand string, ref string")
    row = bleu_rouge_corpus(df, "cand", "ref", "id", max_n=2).first()
    assert row["p1"] == 1.0 and row["p2"] == 1.0
    assert row["bp"] == pytest.approx(math.exp(1 - 5 / 2), abs=1e-6)
    assert row["bleu"] == pytest.approx(math.exp(1 - 5 / 2), abs=1e-6)


def test_bleu_zero_overlap_and_corpus_pooling(spark):
    """Disjoint vocab -> bleu = 0; corpus pooling sums matches before
    the ratio (NOT a mean of per-sentence scores): one perfect pair +
    one disjoint pair of equal length -> p1 = 0.5, not 0.5 average of
    {1, 0} by construction equal here, but p4 pools to below 1."""
    from tap_airbyte_wrapper_spark.functions import bleu_rouge_corpus

    disjoint = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "one two three four")],
        "id long, cand string, ref string")
    row = bleu_rouge_corpus(disjoint, "cand", "ref", "id").first()
    assert row["bleu"] == 0.0 and row["rouge1_r"] == 0.0

    pooled = spark.createDataFrame(
        [(1, "a b c d e", "a b c d e"),
         (2, "v w x y z", "p q r s t")],
        "id long, cand string, ref string")
    row = bleu_rouge_corpus(pooled, "cand", "ref", "id").first()
    assert row["p1"] == 0.5
    assert row["p4"] == pytest.approx(2 / 4, abs=1e-6)  # 2 of 4 4-grams
    assert row["bleu"] == pytest.approx(0.5, abs=1e-6)


def test_bleu_empty_and_validation(spark):
    from tap_airbyte_wrapper_spark.functions import bleu_rouge_corpus

    empty = spark.createDataFrame([], "id long, cand string, ref string")
    assert bleu_rouge_corpus(empty, "cand", "ref", "id").first()[
        "n_pairs"] == 0
    df = spark.createDataFrame([(1, "a", "a")],
                               "id long, cand string, ref string")
    with pytest.raises(ValueError):
        bleu_rouge_corpus(df, "cand", "ref", "id", max_n=0)


# ---------------------------------------------------------------------
# Review-pass regression pins (round-10 code review)
# ---------------------------------------------------------------------

def test_chi2_empty_slice_keeps_one_row_contract(spark):
    """An all-null/empty slice returns ONE row with null statistics,
    like every sibling op — not an empty frame."""
    df = spark.createDataFrame([(None, "y"), ("x", None)],
                               "x string, y string")
    row = chi_square_independence(df, "x", "y").first()
    assert row is not None
    assert row["n"] == 0 and row["chi2"] is None


def test_welch_degenerate_keeps_computable_means(spark):
    """n_b = 1 kills the test but not the effect size: mean_a/mean_b
    still report."""
    row = welch_t_test(_two_group_df(spark, [1, 2, 3], [7]),
                       "v", "g", "a", "b").first()
    assert row["t_stat"] is None
    assert row["mean_a"] == 2.0 and row["mean_b"] == 7.0


def test_kruskal_guards_id_like_group_column(spark):
    from tap_airbyte_wrapper_spark.operators import kruskal_wallis

    rows = [(float(i % 7), str(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "v double, g string")
    with pytest.raises(ValueError, match="max_groups"):
        kruskal_wallis(df, "v", "g", max_groups=10)


def test_stream_drift_gate_lands_empty_batch(spark, tmp_path):
    """A batch whose value column is entirely null carries zero
    distributional evidence: it must LAND with psi = 0, not trip an
    eps-noise false alarm."""
    from tap_airbyte_wrapper_spark.streaming import (
        drift_reference_write,
        read_drift_gate_report,
        stream_drift_gate,
    )

    ref = spark.createDataFrame(
        [(i, float(i % 50)) for i in range(500)], "id long, v double")
    ref_path = str(tmp_path / "ref")
    drift_reference_write(ref, "v", ref_path, bins=8)
    src = tmp_path / "landing"
    src.mkdir()
    out = str(tmp_path / "accepted")
    schema = "id long, v double"
    spark.createDataFrame([(1, None), (2, None)], schema) \
        .coalesce(1).write.mode("append").parquet(str(src))
    q = stream_drift_gate(
        spark.readStream.schema(schema).parquet(str(src)),
        "v", ref_path, out, checkpoint=str(tmp_path / "ck"),
        max_psi=0.25)
    q.awaitTermination(120)
    rep = read_drift_gate_report(spark, out).first()
    assert rep["landed"] is True and rep["psi"] == 0.0
    assert spark.read.parquet(out + "/batch=0").count() == 2


# ---------------------------------------------------------------------
# ICC(2,1)
# ---------------------------------------------------------------------

def test_icc_shrout_fleiss_table(spark):
    """The Shrout & Fleiss 1979 worked example (6 items x 4 judges):
    ICC(2,1) = 0.29."""
    from tap_airbyte_wrapper_spark.operators import icc_2_1

    data = {1: [9, 2, 5, 8], 2: [6, 1, 3, 2], 3: [8, 4, 6, 8],
            4: [7, 1, 2, 6], 5: [10, 5, 6, 9], 6: [6, 2, 4, 7]}
    rows = [(i, j + 1, float(v))
            for i, vs in data.items() for j, v in enumerate(vs)]
    row = icc_2_1(spark.createDataFrame(
        rows, "item long, rater int, score double"),
        "item", "rater", "score").first()
    assert row["n_items"] == 6 and row["k_raters"] == 4
    assert row["icc"] == pytest.approx(0.289764, abs=1e-6)


def test_icc_perfect_and_incomplete(spark):
    """Identical judges -> icc = 1; an item missing a rater drops and
    is counted without changing the statistic."""
    from tap_airbyte_wrapper_spark.operators import icc_2_1

    rows = [(i, j, float(i * 3 % 11)) for i in range(10)
            for j in (1, 2, 3)]
    base = icc_2_1(spark.createDataFrame(
        rows, "item long, rater int, score double"),
        "item", "rater", "score").first()
    assert base["icc"] == 1.0
    rows2 = rows + [(99, 1, 4.0)]
    aug = icc_2_1(spark.createDataFrame(
        rows2, "item long, rater int, score double"),
        "item", "rater", "score").first()
    assert aug["n_dropped"] == 1 and aug["icc"] == 1.0


def test_icc_degenerate(spark):
    from tap_airbyte_wrapper_spark.operators import icc_2_1

    one_rater = [(i, 1, float(i)) for i in range(5)]
    row = icc_2_1(spark.createDataFrame(
        one_rater, "item long, rater int, score double"),
        "item", "rater", "score").first()
    assert row["icc"] is None and row["k_raters"] == 1

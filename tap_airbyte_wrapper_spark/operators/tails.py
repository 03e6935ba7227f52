"""Exact Student-t and F tails via the regularized incomplete beta —
one algorithm, three identical spellings.

Round 11 shipped the sliced sweeps (:func:`~.stats.welch_t_sliced`,
:func:`~.stats.pairwise_welch`) whose whole point is MANY SMALL
slices — exactly the regime where the module's stated normal
approximation diverges materially from the true t tail (n = 5 slice:
two-sided p at t = 2.5 is 0.067 under t(4) but 0.012 under the
normal).  This module closes that gap with the exact tail:

``P(|T_nu| > t) = I_x(nu/2, 1/2)`` with ``x = nu / (nu + t^2)`` and
``P(F_{d1,d2} > f) = I_x(d2/2, d1/2)`` with ``x = d2 / (d2 + d1 f)``,
where ``I_x(a, b)`` is the regularized incomplete beta evaluated by
the Lentz-form continued fraction (Numerical Recipes `betacf` shape;
Lentz 1976; DiDonato & Morrison convergence region via the standard
``x < (a+1)/(a+b+2)`` symmetry switch) with a FIXED ``M_ITER = 25``
iterations and no early exit, and ``ln Gamma`` by the Lanczos g = 7,
n = 9 approximation (Lanczos 1964; the coefficient set published in
Numerical Recipes / Boost).  Why fixed-depth: the oracle contract.
The same operation sequence is emitted three ways —

* :func:`ibeta` — a driver-side Python loop (libm doubles) for the
  one-row tests (`welch_t_test`, `paired_t_test`, `tost_equivalence`,
  `welch_anova`, `brown_forsythe`, `pairwise_welch`);
* :func:`ibeta_chain_sql` — a WITH-chain of ~56 tiny CTE projection
  layers, ONE per Lentz half-step, whose text parses identically in
  Spark SQL and DuckDB (layers, not lateral aliases or nested
  subqueries: engines inline lateral aliases by SUBSTITUTION, which
  is exponential in the recurrence depth, and 100-deep nested
  subqueries overflow DuckDB's parser stack — both measured);
* the sliced ops bind that same text over their per-slice aggregate
  with ``spark.sql(chain, inner=df)``, so the million-slice contract
  holds: the exact tail is a column computation, nothing reaches the
  driver.

Every +,-,*,/ in IEEE-754 double is exactly rounded, so a fixed
operation order makes Python (libm), DuckDB (libm) and the JVM agree
bit-for-bit on the rational part; ``exp``/``ln`` may differ in the
last ulp on the JVM (the reason the one-row ops stay driver-side on
libm), which perturbs the result ~1e-15 relative — six orders below
the 6-decimal output rounding every operator carries.

Accuracy, measured (tests pin it): fixed M_ITER = 25 agrees with a
400-iteration run to < 2e-10 absolute over dof in [0.5, 1e8] x |t| in
[0, 100] (F: < 3e-11 over df1 <= 199) and with closed forms exactly (dof 1/2; integer-dof
quadrature reference in tests) — the truncation floor is front-factor
rounding noise, not CF convergence, because the symmetry switch keeps
the fraction in its geometric-convergence region and b <= 50 here
(t: b = 1/2; F: b = (k-1)/2, validated to df1 = 199).  Where the normal
approximation is RETAINED, and why: `mann_whitney_u` and
`wilcoxon_signed_rank` for TIED data or n beyond RANK_EXACT_MAX_N
(the tie-corrected z IS the published large-sample test there; since
round 13 the NO-TIES small-n case — where the classical critical
tables live — uses the exact combinatorial null, :func:`mw_u_exact_p2`
/ :func:`wilcoxon_exact_p2`, with the switch stated in a `method`
column), the sliced rank sweeps (column-only contract),
`proportion_z_test` (the z formulation is the test's definition),
chi-square tails ABOVE dof = 1000 (Wilson-Hilferty, see
CHI2_EXACT_MAX_DOF — below it :func:`igamma_q`, the incomplete-GAMMA
twin of the beta kernel, makes `kruskal_wallis` and
`chi_square_independence` exact; `jarque_bera`'s dof-2 tail was
already the elementary exp(-x/2)), and `min_detectable_effect`'s z
quantiles (design-stage constants by the MDE formula's own
definition).

Reference parity: the reference engine (tap_airbyte/tap.py — Singer
subprocess plumbing) has no statistics at all; this is north-star
surface for the 100 TB curation use-case, built from the cited
public literature only.
"""

from __future__ import annotations

import math
import re

__all__ = ["M_ITER", "IG_ITER", "CHI2_EXACT_MAX_DOF",
           "lgamma_lanczos", "ibeta", "t_sf2", "t_sf1", "f_sf",
           "igamma_q", "chi2_sf", "lgamma_sql", "ibeta_layer_exprs",
           "ibeta_chain_sql", "apply_ibeta_layers",
           "igamma_chain_sql", "ptukey_sf", "ptukey_sql",
           "ptukey_node_columns", "norm_cdf_gl", "RANK_EXACT_MAX_N",
           "mw_u_exact_p2", "wilcoxon_exact_p2",
           "pack_projection_layers", "igamma_layer_exprs_multi",
           "apply_igamma_layers_multi",
           "binom_sf_direct", "binom_cdf_direct",
           "poisson_cdf_direct", "poisson_sf_direct",
           "BINOM_SCALAR_EXACT_MAX_N", "POISSON_SCALAR_EXACT_MAX_K"]

# Fixed Lentz iteration count — identical in all three spellings (no
# early exit anywhere, or the op ORDER would diverge between engines).
M_ITER = 25

_TINY = 1e-300

# Lanczos g = 7, n = 9 (public coefficient set).
_LANCZOS = (0.99999999999980993, 676.5203681218851,
            -1259.1392167224028, 771.32342877765313,
            -176.61502916214059, 12.507343278686905,
            -0.13857109526572012, 9.9843695780195716e-6,
            1.5056327351493116e-7)
_LN_SQRT_2PI = 0.9189385332046727  # ln(sqrt(2*pi)), exact to double


def lgamma_lanczos(z: float) -> float:
    """ln Gamma(z) for z > 0 by Lanczos g=7/n=9 — mirrored token-for-
    token by :func:`lgamma_sql`; agrees with libm ``lgamma`` to
    < 2e-15 relative over [0.5, 5e5] (pinned in tests).  No reflection
    branch: every caller passes a >= 1/2 (half-integer dof)."""
    z = z - 1.0
    x = _LANCZOS[0]
    for i in range(1, 9):
        x = x + _LANCZOS[i] / (z + i)
    t = z + 7.5
    return _LN_SQRT_2PI + (z + 0.5) * math.log(t) - t + math.log(x)


def ibeta(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta ``I_x(a, b)`` — fixed-depth Lentz
    continued fraction, the driver-side spelling of the shared
    algorithm (see module docstring).  Callers guarantee a, b > 0."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    lbeta = (lgamma_lanczos(a) + lgamma_lanczos(b)
             - lgamma_lanczos(a + b))
    bt = math.exp(a * math.log(x) + b * math.log(1.0 - x) - lbeta)
    swap = x >= (a + 1.0) / (a + b + 2.0)
    if swap:
        ca, cb, cx = b, a, 1.0 - x
    else:
        ca, cb, cx = a, b, x
    c = 1.0
    t0 = 1.0 - (ca + cb) * cx / (ca + 1.0)
    d = 1.0 / (_TINY if abs(t0) < _TINY else t0)
    h = d
    for m in range(1, M_ITER + 1):
        fm = float(m)
        m2 = float(2 * m)
        # even half-step
        aa = fm * (cb - fm) * cx / ((ca - 1.0 + m2) * (ca + m2))
        t1 = 1.0 + aa * d
        d = 1.0 / (_TINY if abs(t1) < _TINY else t1)
        t2 = 1.0 + aa / c
        c = _TINY if abs(t2) < _TINY else t2
        h = h * d * c
        # odd half-step
        aa = (-((ca + fm) * (ca + cb + fm) * cx)
              / ((ca + m2) * (ca + 1.0 + m2)))
        t1 = 1.0 + aa * d
        d = 1.0 / (_TINY if abs(t1) < _TINY else t1)
        t2 = 1.0 + aa / c
        c = _TINY if abs(t2) < _TINY else t2
        h = h * d * c
    if swap:
        return 1.0 - bt * h / b
    return bt * h / a


def t_sf2(t: float, dof: float) -> float:
    """Exact two-sided Student-t tail ``P(|T_dof| > t)``."""
    x = dof / (dof + t * t)
    return ibeta(0.5 * dof, 0.5, x)


def t_sf1(t: float, dof: float) -> float:
    """Exact one-sided upper tail ``P(T_dof > t)``."""
    p2 = t_sf2(t, dof)
    return p2 / 2.0 if t >= 0 else 1.0 - p2 / 2.0


def f_sf(f_stat: float, df1: float, df2: float) -> float:
    """Exact F upper tail ``P(F_{df1,df2} > f)``.

    The ``f_stat <= 0`` guard returns 1.0 (the whole mass is above a
    nonpositive F) — note the chain spelling has NO such guard and
    maps ``f < -df2/df1`` (x < 0) to 0.0 via the x0 <= 0 boundary
    CASE; see :func:`ibeta_layer_exprs`'s boundary-contract note.
    Divergence is unreachable for current callers (F >= 0 by
    construction) — clamp the statistic in the spec text if that ever
    changes."""
    if f_stat <= 0:
        return 1.0
    x = df2 / (df2 + df1 * f_stat)
    return ibeta(0.5 * df2, 0.5 * df1, x)


# Fixed iteration count for the incomplete-gamma kernel (series AND
# continued fraction) — chosen by the measured convergence study
# (pinned in tests): worst |Q_150 - Q_4000| = 6.1e-11 over dof <=
# 1000 on a fine x/dof grid (the slow point is the series at x ~ a,
# which needs ~3*sqrt(a) terms; both branches converge geometrically
# away from it).
IG_ITER = 150

# Sliced-sweep igamma depth/ceiling (round 13): the sliced chi-square
# sweep runs the SAME kernel at a reduced fixed depth so one kernel's
# projection-layer count (~75) stays under the JVM whole-stage-codegen
# ceiling (~112 layers, measured r12).  Convergence study (pinned in
# tests): worst |Q_70 - Q_4000| = 1.05e-13 over dof <= 150 on a fine
# x/dof grid; Wilson-Hilferty is RETAINED above CHI2_SLICED_EXACT_MAX
# (a 13x14-label grid before that engages — stated in the op).
IG_SLICED_ITER = 70
CHI2_SLICED_EXACT_MAX_DOF = 150.0

# Exact-Poisson-count ceilings (round 13): the Poisson tails are the
# SAME incomplete-gamma kernel at a = k / k+1, so the exact gates are
# the kernel-depth ceilings re-expressed in counts: scalar k <=
# CHI2_EXACT_MAX_DOF/2 - 1 (IG_ITER = 150), sliced k <=
# CHI2_SLICED_EXACT_MAX_DOF/2 - 1 (IG_SLICED_ITER = 70); the normal
# approximation (stated, method column) takes over above — large
# counts are exactly where it is excellent (~1/sqrt(mu) error).
# (Values spelled literally because CHI2_EXACT_MAX_DOF is defined
# further down; asserted equal at import.)
POISSON_EXACT_MAX_K = 499                 # CHI2_EXACT_MAX_DOF/2 - 1
POISSON_SLICED_EXACT_MAX_K = \
    int(CHI2_SLICED_EXACT_MAX_DOF / 2) - 1                # 74

# Exact-binomial ceiling (round 13): the binomial tails evaluate the
# ibeta kernel at a ~ k, b ~ n - k — far outside the b <= 50 region
# the t/F validation covered, and the M_ITER = 25 Lentz fraction
# DEGRADES near the distribution's center as n grows (measured, worst
# over p in [.05,.9] x k within +-3 sd of n*p: 2.8e-12 at n = 400,
# 6.3e-9 at 800, 1.6e-6 at 1500 — crossing the 1e-6 output grid —
# 1.5e-2 at 15000).  Exact for n <= 400; the plain normal
# z = (k - n p0)/sqrt(n p0 (1-p0)) takes over above (its ~1e-3-class
# error is honest and STATED via the method column, where the
# silently-unconverged kernel was not).
BINOM_EXACT_MAX_N = 400

# Round-14 SCALAR exact gates (verdict ask #5): the SCALAR binomial /
# Poisson ops compute their tails DRIVER-SIDE, where an O(n) (resp.
# O(k)) log-space direct summation (:func:`binom_cdf_direct` /
# :func:`poisson_cdf_direct`) is exact to ~1e-14 relative far beyond
# the fixed-depth kernels' validated regions, at microsecond cost —
# so the scalar ``method`` switch moves out to these boundaries
# (100k: ~30 ms of driver arithmetic at the gate, and the DuckDB
# oracle mirrors the identical ascending summation via
# ``list_sum(list_transform(generate_series(..)))`` — beyond it the
# oracle-side list materialization stops being "free", so the gate
# is an oracle-cost ceiling, not an accuracy one; the normal
# z takes over above with ~1/sqrt(n)-class error where it is
# excellent).  The SLICED gates (BINOM_EXACT_MAX_N /
# POISSON_SLICED_EXACT_MAX_K) are kernel-depth ceilings for the
# COLUMN chains and deliberately stay where the validity studies put
# them — a per-slice direct sum would be a per-row O(n) explode, not
# a column expression.  Cross-check pins (tests): direct sums agree
# with the ibeta/igamma kernels to < 5e-12 everywhere inside the OLD
# gates, with math.comb exact rational sums at moderate n, and with
# R's published binom.test/poisson.test examples.
BINOM_SCALAR_EXACT_MAX_N = 100_000
POISSON_SCALAR_EXACT_MAX_K = 100_000


def binom_cdf_direct(k: int, n: int, p: float) -> float:
    """``P(X <= k)``, X ~ Binomial(n, p): ascending log-space direct
    summation ``sum_{i=0..k} exp(lgamma(n+1) - lgamma(i+1) -
    lgamma(n-i+1) + i ln p + (n-i) ln(1-p))`` — plain sequential sum
    (NOT fsum) so the DuckDB oracle's ``list_sum`` over the same
    ascending ``generate_series`` replays the identical operation
    order; per-term exp/lgamma may differ in the last ulp between
    libm builds (same stated caveat as the module's kernels — six
    orders below the 6-decimal output rounding).  Terms whose
    exponent underflows contribute exact 0.0 in both engines."""
    if k < 0:
        return 0.0
    if k >= n:
        return 1.0
    # ln(1.0 - p), NOT log1p(-p): the DuckDB oracle spells
    # ``ln(1.0 - p0)`` and the shared-spelling discipline wants the
    # identical operation (p0 is never near 1 enough for the log1p
    # difference to matter at the 6-decimal output rounding anyway).
    lp, lq = math.log(p), math.log(1.0 - p)
    lgn = math.lgamma(n + 1.0)
    s = 0.0
    for i in range(0, k + 1):
        s += math.exp(lgn - math.lgamma(i + 1.0)
                      - math.lgamma(n - i + 1.0)
                      + i * lp + (n - i) * lq)
    return min(s, 1.0)


def binom_sf_direct(k: int, n: int, p: float) -> float:
    """``P(X >= k)`` = ``1 - P(X <= k-1)`` (exact at k = 0).  The
    complement spelling is shared with the oracle; when the upper
    tail is below ~1e-16 the subtraction returns exact 0.0 in both
    engines — invisible at the 6-decimal output rounding."""
    if k <= 0:
        return 1.0
    return max(0.0, 1.0 - binom_cdf_direct(k - 1, n, p))


def poisson_cdf_direct(k: int, mu: float) -> float:
    """``P(X <= k)``, X ~ Poisson(mu): ascending log-space direct
    summation ``sum_{i=0..k} exp(-mu + i ln mu - lgamma(i+1))`` —
    same sequential-order / oracle-mirror contract as
    :func:`binom_cdf_direct`."""
    if k < 0:
        return 0.0
    lmu = math.log(mu)
    s = 0.0
    for i in range(0, k + 1):
        s += math.exp(-mu + i * lmu - math.lgamma(i + 1.0))
    return min(s, 1.0)


def poisson_sf_direct(k: int, mu: float) -> float:
    """``P(X >= k)`` = ``1 - P(X <= k-1)`` (exact at k = 0)."""
    if k <= 0:
        return 1.0
    return max(0.0, 1.0 - poisson_cdf_direct(k - 1, mu))

# Exact-tail ceiling for chi-square dof: above this the
# Wilson-Hilferty cube-root normal approximation is RETAINED — a
# STATED approximation whose measured worst error (vs a 4000-term
# kernel, fine x grid) is 1.05e-5 at dof = 1000 and decays ~1/dof
# (3.5e-6 at 3000, 1.1e-6 at 10000), so it can perturb the 5th-6th
# output decimal; both engines spell the identical WH expression, so
# oracle parity is unaffected.  Why a ceiling at all: the SERIES
# branch of the kernel needs ~3*sqrt(a) terms near x ~ a (measured:
# a = 5000 truncates visibly at 150 terms), so a fixed depth honest
# for dof <= 1000 (worst 6.1e-11 at the ceiling) would silently
# degrade above it — the branch point makes the degradation a stated
# approximation instead.  Below the ceiling WH is materially wrong
# (dof = 4: 3e-3) and the exact kernel is cheap.
CHI2_EXACT_MAX_DOF = 1000.0
assert POISSON_EXACT_MAX_K == int(CHI2_EXACT_MAX_DOF / 2) - 1


def igamma_q(a: float, x: float) -> float:
    """Regularized upper incomplete gamma ``Q(a, x)`` — fixed-depth
    (IG_ITER, no early exit) series (x < a+1) / Lentz continued
    fraction (x >= a+1), Lanczos lgamma; the chi-square upper tail is
    ``Q(dof/2, chi2/2)``.  Same oracle contract as :func:`ibeta`: the
    identical operation sequence is emitted for DuckDB by
    :func:`igamma_chain_sql`."""
    if x <= 0.0:
        return 1.0
    front = math.exp(-x + a * math.log(x) - lgamma_lanczos(a))
    if x < a + 1.0:
        term = 1.0 / a
        s = term
        for n in range(1, IG_ITER + 1):
            term = term * x / (a + n)
            s = s + term
        return 1.0 - front * s
    b = x + 1.0 - a
    c = 1.0 / _TINY
    d = 1.0 / (_TINY if abs(b) < _TINY else b)
    h = d
    for i in range(1, IG_ITER + 1):
        an = -i * (i - a)
        b = b + 2.0
        t1 = an * d + b
        d = 1.0 / (_TINY if abs(t1) < _TINY else t1)
        t2 = b + an / c
        c = _TINY if abs(t2) < _TINY else t2
        h = h * d * c
    return front * h


def chi2_sf(x: float, dof: float) -> float:
    """Chi-square upper tail: EXACT ``Q(dof/2, x/2)`` for dof <=
    CHI2_EXACT_MAX_DOF, Wilson-Hilferty above (measured error bounds
    in the constant's comment; the practical users — Kruskal-Wallis
    with k groups, r x c independence grids, JB's dof 2 — live far
    below the ceiling)."""
    if x <= 0.0:
        return 1.0
    if dof <= CHI2_EXACT_MAX_DOF:
        return igamma_q(0.5 * dof, 0.5 * x)
    c = 2.0 / (9.0 * dof)
    z = ((x / dof) ** (1.0 / 3.0) - (1.0 - c)) / math.sqrt(c)
    # one-sided upper normal tail via the module-shared A&S erf shape
    xx = abs(z) / math.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * xx)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    sf2 = min(1.0, max(0.0, poly * math.exp(-xx * xx)))
    return sf2 / 2.0 if z >= 0 else 1.0 - sf2 / 2.0


def igamma_layer_exprs(a: str, x: str, keep: tuple,
                       out: str = "__q", iters: int = IG_ITER) -> list:
    """``Q(a, x)`` as projection LAYERS (the :func:`ibeta_layer_exprs`
    shape) — the single spec behind BOTH the DuckDB WITH chain
    (:func:`igamma_chain_sql`) and the Spark per-layer application
    (:func:`apply_igamma_layers`, round 13 — the sliced chi-square
    sweep made the Spark spelling necessary).  Both branches (series
    and Lentz CF) compute side by side as columns on CLAMPED
    arguments with the final CASE selecting by ``x < a + 1``; the
    unused branch's clamped-argument garbage never reaches the
    output.  ``iters`` parameterizes the fixed depth: IG_ITER (150)
    is the dof <= 1000 scalar/oracle contract; the sliced sweep runs
    IG_SLICED_ITER (70, exact to 1.1e-13 for dof <= 150, measured)
    to keep one kernel's layer count under the JVM codegen ceiling."""
    kp = list(keep)
    reserved = {"__ga", "__gx0", "__gx", "__fr", "__ser", "__xs",
                "__tm", "__s", "__b", "__c", "__d", "__h", out}
    clash = reserved.intersection(kp)
    if clash:
        raise ValueError(
            f"igamma_layer_exprs: keep columns {sorted(clash)} "
            "collide with the kernel's internal column names "
            f"({sorted(reserved)}); rename them upstream")
    lg = lgamma_sql("__ga")
    xg = f"(CASE WHEN ({x}) <= 0.0 THEN 1.0 ELSE ({x}) END)"
    # a is CLAMPED like x: a <= 0 rows (dof = 0 slices in the sliced
    # sweep) would hit 1.0/__ga — an ANSI-mode error in Spark even
    # for doubles — and their kernel value is discarded anyway
    # (callers CASE those rows to NULL; the x0 <= 0 boundary CASE
    # here returns 1.0).  No-op for every a > 0 caller.
    ag = f"(CASE WHEN ({a}) <= 0.0 THEN 1.0 ELSE ({a}) END)"
    layers = [
        kp + [f"{ag} AS __ga", f"({x}) AS __gx0", f"{xg} AS __gx"],
        kp + ["__ga", "__gx0", "__gx",
              f"exp(-__gx + __ga * ln(__gx) - {lg}) AS __fr",
              "(__gx < __ga + 1.0) AS __ser",
              "(CASE WHEN __gx < __ga + 1.0 THEN __gx ELSE 1.0 END) "
              "AS __xs"],
        kp + ["__ga", "__gx0", "__gx", "__fr", "__ser", "__xs",
              "(1.0 / __ga) AS __tm", "(1.0 / __ga) AS __s",
              "(__gx + 1.0 - __ga) AS __b", "(1.0 / 1e-300) AS __c",
              "(1.0 / (CASE WHEN abs(__gx + 1.0 - __ga) < 1e-300 "
              "THEN 1e-300 ELSE __gx + 1.0 - __ga END)) AS __d"],
        kp + ["__ga", "__gx0", "__fr", "__ser", "__xs", "__tm",
              "__s", "__b", "__c", "__d", "__d AS __h"],
    ]
    base = kp + ["__ga", "__gx0", "__fr", "__ser", "__xs"]
    for i in range(1, iters + 1):
        fi = f"{float(i)!r}"
        an = f"(-{fi} * ({fi} - __ga))"
        t1 = f"({an} * __d + (__b + 2.0))"
        t2 = f"((__b + 2.0) + {an} / __c)"
        de = (f"(1.0 / (CASE WHEN abs({t1}) < 1e-300 THEN 1e-300 "
              f"ELSE {t1} END))")
        ce = (f"(CASE WHEN abs({t2}) < 1e-300 THEN 1e-300 "
              f"ELSE {t2} END)")
        layers.append(base + [
            f"(__tm * __xs / (__ga + {fi})) AS __tm",
            f"(__s + __tm * __xs / (__ga + {fi})) AS __s",
            f"(__b + 2.0) AS __b", f"{ce} AS __c", f"{de} AS __d",
            f"(__h * {de} * {ce}) AS __h"])
    # __h is NOT lagged in this kernel (each layer folds its own d, c
    # via inline duplication — one state update per iteration keeps
    # the ibeta-style lag unnecessary), so the final value is __h
    # as-is.
    res = ("(CASE WHEN __gx0 <= 0.0 THEN 1.0 "
           "WHEN __ser THEN 1.0 - __fr * __s "
           "ELSE __fr * __h END)")
    layers.append(kp + [f"{res} AS {out}"])
    return layers


def igamma_chain_sql(inner: str, a: str, x: str, keep: tuple,
                     out: str = "__q", prefix: str = "__ig",
                     iters: int = IG_ITER) -> str:
    """:func:`igamma_layer_exprs` joined into ONE WITH-chain over
    relation text ``inner`` — the DuckDB-oracle spelling of
    :func:`igamma_q` (used by the chi-square-tail oracles: kruskal,
    chi2 independence, and since round 13 the sliced chi-square
    sweep at ``iters=IG_SLICED_ITER``)."""
    layers = igamma_layer_exprs(a, x, keep, out=out, iters=iters)
    ctes = []
    prev = inner
    for i, layer in enumerate(layers[:-1]):
        name = f"{prefix}{i:03d}"
        ctes.append(f"{name} AS (SELECT {', '.join(layer)} "
                    f"FROM {prev})")
        prev = name
    body = ",\n".join(ctes)
    return (f"WITH {body}\n"
            f"SELECT {', '.join(layers[-1])} FROM {prev}")


def igamma_layer_exprs_multi(specs, keep: tuple,
                             iters: int = IG_ITER) -> list:
    """SEVERAL ``Q(a, x)`` kernels riding the SAME projection layers
    side by side (round 14 — the Poisson sweep's two tails and the
    sweep-suite's fused members).  ``specs`` is a sequence of ``(a,
    x, out)`` expression-text tuples; internal state columns are
    prefixed per spec (``__g0…``, ``__g1…``), and the per-spec
    arithmetic TEXT is token-identical (modulo the name prefix) to
    :func:`igamma_layer_exprs` — column names never enter the
    floating-point values, so each spec's result is bit-identical to
    its own single-spec chain (pinned in tests).  The oracle side
    keeps the single-spec :func:`igamma_chain_sql` texts byte-frozen
    (two stacked WITH chains), which is fine: same values.  The layer
    COUNT stays 4 + iters + 1 regardless of spec count — the whole
    point: one analyzer pass carries every member (per-layer analysis
    cost is in depth, not width, until expressions pass ~2 KB)."""
    kp = list(keep)
    pres = [f"__g{i}" for i in range(len(specs))]
    reserved = {f"{p}{s}" for p in pres
                for s in ("a", "x0", "x", "fr", "ser", "xs",
                          "tm", "s", "b", "c", "d", "h")}
    reserved |= {out for _, _, out in specs}
    clash = reserved.intersection(kp)
    if clash:
        raise ValueError(
            f"igamma_layer_exprs_multi: keep columns {sorted(clash)} "
            "collide with kernel-internal column names; rename them "
            "upstream")
    l0, l1, l2, l3 = [], [], [], []
    finals = []
    base_cols = []
    for p, (a, x, out) in zip(pres, specs):
        lg = lgamma_sql(f"{p}a")
        xg = f"(CASE WHEN ({x}) <= 0.0 THEN 1.0 ELSE ({x}) END)"
        ag = f"(CASE WHEN ({a}) <= 0.0 THEN 1.0 ELSE ({a}) END)"
        l0 += [f"{ag} AS {p}a", f"({x}) AS {p}x0", f"{xg} AS {p}x"]
        l1 += [f"{p}a", f"{p}x0", f"{p}x",
               f"exp(-{p}x + {p}a * ln({p}x) - {lg}) AS {p}fr",
               f"({p}x < {p}a + 1.0) AS {p}ser",
               f"(CASE WHEN {p}x < {p}a + 1.0 THEN {p}x ELSE 1.0 "
               f"END) AS {p}xs"]
        l2 += [f"{p}a", f"{p}x0", f"{p}x", f"{p}fr", f"{p}ser",
               f"{p}xs",
               f"(1.0 / {p}a) AS {p}tm", f"(1.0 / {p}a) AS {p}s",
               f"({p}x + 1.0 - {p}a) AS {p}b",
               f"(1.0 / 1e-300) AS {p}c",
               f"(1.0 / (CASE WHEN abs({p}x + 1.0 - {p}a) < 1e-300 "
               f"THEN 1e-300 ELSE {p}x + 1.0 - {p}a END)) AS {p}d"]
        l3 += [f"{p}a", f"{p}x0", f"{p}fr", f"{p}ser", f"{p}xs",
               f"{p}tm", f"{p}s", f"{p}b", f"{p}c", f"{p}d",
               f"{p}d AS {p}h"]
        base_cols += [f"{p}a", f"{p}x0", f"{p}fr", f"{p}ser",
                      f"{p}xs"]
        finals.append(
            f"(CASE WHEN {p}x0 <= 0.0 THEN 1.0 "
            f"WHEN {p}ser THEN 1.0 - {p}fr * {p}s "
            f"ELSE {p}fr * {p}h END) AS {out}")
    layers = [kp + l0, kp + l1, kp + l2, kp + l3]
    base = kp + base_cols
    for i in range(1, iters + 1):
        fi = f"{float(i)!r}"
        step = []
        for p in pres:
            an = f"(-{fi} * ({fi} - {p}a))"
            t1 = f"({an} * {p}d + ({p}b + 2.0))"
            t2 = f"(({p}b + 2.0) + {an} / {p}c)"
            de = (f"(1.0 / (CASE WHEN abs({t1}) < 1e-300 THEN 1e-300 "
                  f"ELSE {t1} END))")
            ce = (f"(CASE WHEN abs({t2}) < 1e-300 THEN 1e-300 "
                  f"ELSE {t2} END)")
            step += [
                f"({p}tm * {p}xs / ({p}a + {fi})) AS {p}tm",
                f"({p}s + {p}tm * {p}xs / ({p}a + {fi})) AS {p}s",
                f"({p}b + 2.0) AS {p}b", f"{ce} AS {p}c",
                f"{de} AS {p}d",
                f"({p}h * {de} * {ce}) AS {p}h"]
        layers.append(base + step)
    layers.append(kp + finals)
    return layers


def apply_igamma_layers_multi(df, specs, keep: tuple,
                              iters: int = IG_ITER,
                              checkpoint_every: int | None = 15,
                              pack: int = 2):
    """:func:`igamma_layer_exprs_multi` applied as packed incremental
    ``selectExpr`` layers — the Spark spelling for several
    incomplete-gamma tails in ONE chain (same packing/checkpoint
    contract as :func:`apply_ibeta_layers`; caller guarantees the
    frame is bounded)."""
    layers = pack_projection_layers(
        igamma_layer_exprs_multi(specs, keep, iters=iters), pack)
    for i, layer in enumerate(layers):
        if checkpoint_every and i and i % checkpoint_every == 0:
            df = df.localCheckpoint(eager=True)
        df = df.selectExpr(*layer)
    return df


def apply_igamma_layers(df, a: str, x: str, keep: tuple,
                        out: str = "__q",
                        iters: int = IG_ITER,
                        checkpoint_every: int | None = None,
                        pack: int = 2):
    """:func:`igamma_layer_exprs` applied to a Spark DataFrame as
    incremental ``selectExpr`` layers — the Spark spelling the sliced
    chi-square sweep needs (same contract as
    :func:`apply_ibeta_layers`: the exact tail stays a COLUMN
    computation, nothing reaches the driver).  At the sweep's
    IG_SLICED_ITER=70 one kernel is ~75 layers — under the measured
    ~112-layer whole-stage-codegen ceiling.  ``checkpoint_every``
    inserts an eager localCheckpoint between chain chunks: the caller
    must guarantee the frame is BOUNDED (per-slice rows); splitting
    caps the optimizer's superlinear CollapseProject cost over one
    long Project stack (measured: ~2 s off the sweep's plan
    constant).

    Application strategy (round-13 plan-constant study, all measured
    on the 79-layer sweep): per-layer ``selectExpr`` costs ~35 ms of
    Py4J + analysis per layer (~2.8 s build) but keeps execution fast
    once the mid-chain checkpoint bounds CollapseProject; ONE giant
    ``spark.sql`` WITH chain trips the analyzer's 100-iteration
    Resolution cap at ~79 CTEs; CHUNKED WITH chains (26/8 CTEs per
    ``spark.sql``) re-pay the fixed-point pass per CTE per iteration
    and measured no better (5.5 s / 3.7 s build).  Per-layer +
    checkpoint is the winner and matches apply_ibeta_layers.

    Round 14 adds ``pack`` (:func:`pack_projection_layers`,
    bit-identical — default 2 halves the layer count; the oracle's
    :func:`igamma_chain_sql` text stays unpacked and byte-frozen)."""
    layers = pack_projection_layers(
        igamma_layer_exprs(a, x, keep, out=out, iters=iters), pack)
    for i, layer in enumerate(layers):
        if checkpoint_every and i and i % checkpoint_every == 0:
            df = df.localCheckpoint(eager=True)
        df = df.selectExpr(*layer)
    return df


def lgamma_sql(z: str) -> str:
    """The Lanczos lgamma as portable SQL expression text over
    expression ``z`` — token-for-token :func:`lgamma_lanczos`."""
    zz = f"(({z}) - 1.0)"
    x = f"{_LANCZOS[0]!r}"
    for i in range(1, 9):
        x = f"({x} + {_LANCZOS[i]!r} / ({zz} + {float(i)!r}))"
    t = f"({zz} + 7.5)"
    return (f"({_LN_SQRT_2PI!r} + ({zz} + 0.5) * ln({t}) - {t}"
            f" + ln({x}))")


def ibeta_layer_exprs(specs, keep: tuple) -> list:
    """The shared SQL spelling of :func:`ibeta` as a list of
    projection LAYERS — each layer a list of ``expr AS name`` strings
    referencing only the PREVIOUS layer's columns.  This single spec
    feeds both engines: :func:`ibeta_chain_sql` joins the layers into
    a DuckDB WITH chain; :func:`apply_ibeta_layers` applies them as
    incremental Spark ``selectExpr`` calls.  Layers, not lateral
    aliases or one giant query: engines inline lateral aliases by
    SUBSTITUTION (exponential in the recurrence depth), 100-deep
    nested subqueries overflow DuckDB's parser stack, and a 100-CTE
    chain exceeds Spark's fixed-point analyzer iteration cap — all
    three measured; per-layer application sidesteps every one.

    ``specs`` is a sequence of ``(a, b, x, out)`` tuples — expression
    texts over the inner relation plus the output column name.
    SEVERAL kernels ride the SAME layers side by side (TOST's two
    one-sided tails cost one pass, not two) because the per-layer
    analyzer cost is in the layer COUNT, not width.  ``keep`` columns
    thread through untouched; the final layer yields ``keep + (out_1,
    .., out_n)``.  NULL a/b/x propagate to a NULL result (every layer
    is strict arithmetic); the x <= 0 / >= 1 boundaries return exact
    0/1 through the final CASE while the kernel runs on an x clamped
    to 1/2 (Spark's ``ln`` returns NULL at 0 where libm returns -inf
    — the clamp keeps both engines on finite arithmetic; the boundary
    CASE discards the kernel value there).

    ONE layer per Lentz half-step, with the running product LAGGED
    one step: ``__h`` starts at 1.0 and each layer folds the PREVIOUS
    layer's (d, c) into it while computing this step's (d, c) — so no
    layer references a column born in the same layer (no lateral
    aliases) and no expression is duplicated beyond the small ``aa``
    term.  The lag is value-exact vs the Python loop: after layer k,
    ``__h = h0 * prod_{i<k}(d_i c_i)`` with the identical
    left-to-right multiplication order, and the seed ``(1.0 * d0) *
    c0`` with ``c0 = 1.0`` equals ``d0`` exactly (IEEE x * 1.0 = x);
    the final layer folds the last (d, c) in.

    BOUNDARY CONTRACT for x < 0 (round-12 ADVICE): the final CASE
    maps EVERY x0 <= 0 to 0.0 — i.e. it treats x < 0 as "CDF is 0",
    which for an F-statistic spelling ``x = df2/(df2 + df1*f)`` fires
    only when ``f < -df2/df1``, where the Python :func:`f_sf` guard
    instead returns the OPPOSITE tail (1.0 for any f <= 0).  This is
    unreachable for every current caller (F statistics are
    nonnegative sums of squares; t spellings produce x in [0, 1] by
    construction), but a spec whose statistic can go negative MUST
    clamp it nonnegative in the spec's ``x`` expression text (e.g.
    ``greatest(f, 0.0)`` / ``GREATEST(f, 0.0)`` — same text both
    engines) before riding these layers, or the chain and the Python
    scalar will diverge at the boundary."""
    kp = list(keep)
    ks = [f"__k{i}" for i in range(len(specs))]
    l0, l1, l2, l3 = [], [], [], []
    finals = []
    for k, (a, b, x, out) in zip(ks, specs):
        xg = (f"(CASE WHEN ({x}) <= 0.0 OR ({x}) >= 1.0 THEN 0.5 "
              f"ELSE ({x}) END)")
        lb = (f"({lgamma_sql(k + 'a')} + {lgamma_sql(k + 'b')}"
              f" - {lgamma_sql(f'({k}a + {k}b)')})")
        l0 += [f"({a}) AS {k}a", f"({b}) AS {k}b", f"({x}) AS {k}x0",
               f"{xg} AS {k}x"]
        l1 += [f"{k}a", f"{k}b", f"{k}x0", f"{k}x",
               f"exp({k}a * ln({k}x) + {k}b * ln(1.0 - {k}x) - {lb})"
               f" AS {k}bt",
               f"({k}x >= ({k}a + 1.0) / ({k}a + {k}b + 2.0))"
               f" AS {k}sw"]
        l2 += [f"{k}a", f"{k}b", f"{k}x0", f"{k}bt", f"{k}sw",
               f"(CASE WHEN {k}sw THEN {k}b ELSE {k}a END) AS {k}ca",
               f"(CASE WHEN {k}sw THEN {k}a ELSE {k}b END) AS {k}cb",
               f"(CASE WHEN {k}sw THEN 1.0 - {k}x ELSE {k}x END)"
               f" AS {k}cx"]
    base = kp + [n for k in ks
                 for n in (f"{k}a", f"{k}b", f"{k}x0", f"{k}bt",
                           f"{k}sw", f"{k}ca", f"{k}cb", f"{k}cx")]
    for k in ks:
        t0 = f"(1.0 - ({k}ca + {k}cb) * {k}cx / ({k}ca + 1.0))"
        l3 += [f"(1.0 / (CASE WHEN abs({t0}) < 1e-300 THEN 1e-300 "
               f"ELSE {t0} END)) AS {k}d",
               f"CAST(1.0 AS DOUBLE) AS {k}c",
               f"CAST(1.0 AS DOUBLE) AS {k}h"]
        finals.append(
            f"(CASE WHEN {k}x0 <= 0.0 THEN 0.0 "
            f"WHEN {k}x0 >= 1.0 THEN 1.0 "
            f"WHEN {k}sw THEN 1.0 - {k}bt * ({k}h * {k}d * {k}c)"
            f" / {k}b "
            f"ELSE {k}bt * ({k}h * {k}d * {k}c) / {k}a END)"
            f" AS {specs[ks.index(k)][3]}")
    layers = [kp + l0, kp + l1, kp + l2, base + l3]
    for m in range(1, M_ITER + 1):
        fm = f"{float(m)!r}"
        m2 = f"{float(2 * m)!r}"
        for half in (0, 1):
            step = []
            for k in ks:
                if half == 0:
                    aa = (f"({fm} * ({k}cb - {fm}) * {k}cx"
                          f" / (({k}ca - 1.0 + {m2})"
                          f" * ({k}ca + {m2})))")
                else:
                    aa = (f"(-(({k}ca + {fm}) * ({k}ca + {k}cb + {fm})"
                          f" * {k}cx)"
                          f" / (({k}ca + {m2})"
                          f" * ({k}ca + 1.0 + {m2})))")
                t1 = f"(1.0 + {aa} * {k}d)"
                t2 = f"(1.0 + {aa} / {k}c)"
                de = (f"(1.0 / (CASE WHEN abs({t1}) < 1e-300 THEN "
                      f"1e-300 ELSE {t1} END))")
                ce = (f"(CASE WHEN abs({t2}) < 1e-300 THEN 1e-300 "
                      f"ELSE {t2} END)")
                step += [f"{de} AS {k}d", f"{ce} AS {k}c",
                         f"({k}h * {k}d * {k}c) AS {k}h"]
            layers.append(base + step)
    layers.append(kp + finals)
    return layers


def ibeta_chain_sql(inner: str, specs, keep: tuple,
                    prefix: str = "__ib") -> str:
    """:func:`ibeta_layer_exprs` joined into ONE complete WITH-chain
    query over relation text ``inner`` (a table/view name or a
    ``(subquery)``) — the DuckDB-oracle spelling; ~56 tiny CTEs whose
    text is tens of KB: large for a human, trivial for a parser, and
    the plan is a linear projection chain the optimizer folds into
    one stage."""
    layers = ibeta_layer_exprs(specs, keep)
    ctes = []
    prev = inner
    for i, layer in enumerate(layers[:-1]):
        name = f"{prefix}{i:03d}"
        ctes.append(f"{name} AS (SELECT {', '.join(layer)} "
                    f"FROM {prev})")
        prev = name
    body = ",\n".join(ctes)
    return (f"WITH {body}\n"
            f"SELECT {', '.join(layers[-1])} FROM {prev}")


def _split_proj_item(item: str):
    """Split one projection item into ``(expr_text | None, name)`` —
    ``None`` expr means a bare passthrough column reference."""
    m = re.match(r"^(.*)\s+AS\s+(\w+)\s*$", item,
                 re.DOTALL | re.IGNORECASE)
    if m:
        return m.group(1).strip(), m.group(2)
    return None, item.strip()


def _merge_two_layers(l1: list, l2: list) -> list:
    """Merge projection layer ``l2`` OVER ``l1`` by textual
    substitution: every reference in l2 to a column l1 DEFINES (a
    non-passthrough item) is replaced by l1's parenthesized
    expression text.  The substituted reference roots the identical
    expression subtree where the column reference stood, so the
    merged single projection computes bit-for-bit the values the
    two-step pipeline did — parentheses only pin precedence, they
    never reorder the floating-point operation sequence."""
    defs = {}
    for item in l1:
        e, n = _split_proj_item(item)
        if e is not None and e != n:
            defs[n] = f"({e})"
    if not defs:
        return list(l2)
    pat = re.compile(r"\b(" + "|".join(map(re.escape, defs)) + r")\b")
    out = []
    for item in l2:
        e, n = _split_proj_item(item)
        src = e if e is not None else n
        src = pat.sub(lambda m: defs[m.group(1)], src)
        out.append(n if src == n else f"{src} AS {n}")
    return out


def pack_projection_layers(layers: list, factor: int = 2) -> list:
    """Pack consecutive projection layers ``factor`` at a time via
    :func:`_merge_two_layers` — the round-14 plan-constant cut.  The
    per-layer cost of the Spark chain application is ~35 ms of Py4J +
    incremental analysis PER LAYER (measured, round 13), so halving
    the layer count halves the plan constant; values stay
    BIT-IDENTICAL (pinned in tests).  factor=2 measured optimal on
    this box (55 -> 28 layers, binom sweep chain 4.3 -> 2.1 s);
    factor=4 LOSES (15 layers but ~6 KB expressions — analysis cost
    scales with text size past ~2 KB, measured 6.7 s).  The first
    layer is never merged into (it references the caller's input
    relation, which may be arbitrary expressions over raw columns).

    The DuckDB oracle chains (:func:`ibeta_chain_sql` /
    :func:`igamma_chain_sql`) deliberately do NOT pack — their CTE
    text stays byte-identical to rounds 12/13 (parser cost is
    trivial there and frozen text keeps oracle diffs empty)."""
    if factor <= 1:
        return layers
    packed = [layers[0]]
    i = 1
    while i < len(layers):
        cur = layers[i]
        j = i + 1
        used = 1
        while used < factor and j < len(layers):
            cur = _merge_two_layers(cur, layers[j])
            j += 1
            used += 1
        packed.append(cur)
        i = j
    return packed


def apply_ibeta_layers(df, specs, keep: tuple,
                       checkpoint_every: int | None = 15,
                       pack: int = 2):
    """:func:`ibeta_layer_exprs` applied to a Spark DataFrame as
    incremental ``selectExpr`` layers (each resolves against an
    already-analyzed child, so no analyzer fixed-point blowup) —
    the exact tail stays a COLUMN computation: per-slice sweeps keep
    the million-slice contract, nothing reaches the driver.  Cost is
    per-PLAN (~35 ms Py4J + analysis per layer, measured), not
    per-row — amortized to nothing over a million slices.

    Round 14: layers are PACKED (:func:`pack_projection_layers`,
    bit-identical, 55 -> 28 at the default factor 2) and
    ``checkpoint_every`` inserts an eager ``localCheckpoint`` between
    chain chunks — callers guarantee the frame is BOUNDED (the
    per-slice table).  The checkpoint serves two measured purposes:
    it caps the optimizer's superlinear CollapseProject cost over one
    long Project stack, and it keeps each whole-stage-codegen method
    under the JVM limit, which is what let MULTIPLE kernels ride ONE
    chain side by side (an UNPACKED un-checkpointed 2-spec chain
    fails Janino compilation and runs SLOWER than two staged chains;
    packed + checkpointed it is 2x faster — the r14 sweep
    consolidation: binom's two tails 4.3 -> 2.1 s, a welch + tost +
    binom + mcnemar 4-spec suite chain ~3.2 s where four separate
    chains cost ~8 s)."""
    layers = pack_projection_layers(ibeta_layer_exprs(specs, keep),
                                    pack)
    for i, layer in enumerate(layers):
        if checkpoint_every and i and i % checkpoint_every == 0:
            df = df.localCheckpoint(eager=True)
        df = df.selectExpr(*layer)
    return df


# =====================================================================
# Studentized range tail (round 13) — the Games-Howell exact p
# =====================================================================
# P(Q_{k,df} > q) for the studentized range Q = range(k std normals)
# / (chi_df / sqrt(df)), the null of Tukey HSD and (with per-pair
# Welch df) Games & Howell 1976.  Classical definition (Harter 1960;
# Hochberg & Tamhane 1987 eq. 3.3):
#
#   P(Q <= q) = INT_0^inf f_u(u) * k INT phi(z) [PHI(z) - PHI(z-qu)]^(k-1) dz du
#
# with u = s/sigma ~ sqrt(chi2_df / df), f_u(u) = 2 (df/2)^(df/2)
# / Gamma(df/2) * u^(df-1) e^(-df u^2 / 2).  Same exactness contract
# as ibeta/igamma_q above but via FIXED-NODE quadrature instead of a
# fixed-depth recurrence (the integrand is smooth/analytic, where
# Gauss-Legendre converges geometrically — a recurrence form does not
# exist): every node and weight is a hardcoded literal, no adaptivity,
# no early exit, so the identical operation sequence is emitted TWO
# ways — a Python loop (driver-side: pairwise_welch output is bounded
# by max_groups*(max_groups-1)/2 rows, so the tail never needs to be
# a column) and a DuckDB scalar expression (:func:`ptukey_sql`,
# nested list_sum/list_transform over the same literal nodes) for the
# oracle.  No Spark-SQL spelling is needed or emitted — stated.
#
# Node counts, chosen by measurement (pinned in tests):
# * PHI: GL-24 on [0, clamp(x, -9, 9)] — max |err| vs libm erf
#   6.7e-16 over x in [-9, 9]; the clamp costs < 1.2e-19 (PHI(-9)).
# * inner z: GL-64 on [-9, 9] (phi(z) < 1.1e-18 outside).
# * outer u: GL-64 on [max(0, 1 - 10*sd), 1 + 10*sd], sd =
#   1/sqrt(2 df) — +-10 sd of the asymptotically-normal chi scale;
#   the df-adaptive interval keeps 64 nodes accurate from df = 1
#   (half-line-wide density) to df = 1e6 (width ~0.001).
# Measured end-to-end: agrees with the EXACT k = 2 identity
# P(Q_{2,df} > q) == P(|T_df| > q/sqrt(2)) to < 2e-14 across
# q in [0.5, 6] x df in [2, 200], and reproduces the classical
# q_0.05(k, df) tables (Harter) to their 2-decimal rounding.
#
# GL nodes/weights: standard Gauss-Legendre abscissae (public math
# constants; numpy.polynomial.legendre.leggauss reproduces them),
# hardcoded so both spellings share the exact same doubles.

GL24_X = (
    -0.9951872199970213, -0.9747285559713095, -0.9382745520027328,
    -0.886415527004401, -0.820001985973903, -0.7401241915785544,
    -0.6480936519369755, -0.5454214713888396, -0.4337935076260451,
    -0.3150426796961634, -0.1911188674736163, -0.06405689286260563,
    0.06405689286260563, 0.1911188674736163, 0.3150426796961634,
    0.4337935076260451, 0.5454214713888396, 0.6480936519369755,
    0.7401241915785544, 0.820001985973903, 0.886415527004401,
    0.9382745520027328, 0.9747285559713095, 0.9951872199970213,
)
GL24_W = (
    0.012341229799987091, 0.028531388628933743, 0.04427743881741955,
    0.05929858491543674, 0.07334648141108041, 0.08619016153195329,
    0.09761865210411406, 0.1074442701159656, 0.11550566805372561,
    0.12167047292780342, 0.1258374563468283, 0.12793819534675221,
    0.12793819534675221, 0.1258374563468283, 0.12167047292780342,
    0.11550566805372561, 0.1074442701159656, 0.09761865210411406,
    0.08619016153195329, 0.07334648141108041, 0.05929858491543674,
    0.04427743881741955, 0.028531388628933743, 0.012341229799987091,
)
GL64_X = (
    -0.9993050417357722, -0.9963401167719552, -0.9910133714767443,
    -0.983336253884626, -0.973326827789911, -0.9610087996520538,
    -0.9464113748584028, -0.9295691721319396, -0.9105221370785028,
    -0.8893154459951141, -0.8659993981540928, -0.8406292962525803,
    -0.8132653151227975, -0.7839723589433414, -0.7528199072605319,
    -0.7198818501716108, -0.6852363130542333, -0.6489654712546573,
    -0.6111553551723933, -0.571895646202634, -0.5312794640198946,
    -0.48940314570705296, -0.4463660172534641, -0.4022701579639916,
    -0.3572201583376681, -0.31132287199021097, -0.2646871622087674,
    -0.21742364374000708, -0.1696444204239928, -0.12146281929612056,
    -0.07299312178779904, -0.02435029266342443, 0.02435029266342443,
    0.07299312178779904, 0.12146281929612056, 0.1696444204239928,
    0.21742364374000708, 0.2646871622087674, 0.31132287199021097,
    0.3572201583376681, 0.4022701579639916, 0.4463660172534641,
    0.48940314570705296, 0.5312794640198946, 0.571895646202634,
    0.6111553551723933, 0.6489654712546573, 0.6852363130542333,
    0.7198818501716108, 0.7528199072605319, 0.7839723589433414,
    0.8132653151227975, 0.8406292962525803, 0.8659993981540928,
    0.8893154459951141, 0.9105221370785028, 0.9295691721319396,
    0.9464113748584028, 0.9610087996520538, 0.973326827789911,
    0.983336253884626, 0.9910133714767443, 0.9963401167719552,
    0.9993050417357722,
)
GL64_W = (
    0.0017832807216942152, 0.004147033260562923, 0.006504457968979654,
    0.008846759826364391, 0.011168139460131466, 0.013463047896718231,
    0.015726030476025082, 0.0179517157756973, 0.020134823153530094,
    0.022270173808383007, 0.024352702568710853, 0.026377469715054627,
    0.028339672614259702, 0.030234657072402495, 0.03205792835485145,
    0.03380516183714179, 0.03547221325688232, 0.03705512854024015,
    0.03855015317861559, 0.03995374113272035, 0.041262563242623486,
    0.0424735151236536, 0.043583724529323464, 0.044590558163756545,
    0.045491627927418114, 0.046284796581314375, 0.04696818281621,
    0.0475401657148303, 0.04799938859645832, 0.048344762234802954,
    0.048575467441503456, 0.04869095700913975, 0.04869095700913975,
    0.048575467441503456, 0.048344762234802954, 0.04799938859645832,
    0.0475401657148303, 0.04696818281621, 0.046284796581314375,
    0.045491627927418114, 0.044590558163756545, 0.043583724529323464,
    0.0424735151236536, 0.041262563242623486, 0.03995374113272035,
    0.03855015317861559, 0.03705512854024015, 0.03547221325688232,
    0.03380516183714179, 0.03205792835485145, 0.030234657072402495,
    0.028339672614259702, 0.026377469715054627, 0.024352702568710853,
    0.022270173808383007, 0.020134823153530094, 0.0179517157756973,
    0.015726030476025082, 0.013463047896718231, 0.011168139460131466,
    0.008846759826364391, 0.006504457968979654, 0.004147033260562923,
    0.0017832807216942152,
)

_SQRT2PI = 2.5066282746310002   # repr(sqrt(2*pi)) — same literal in SQL
_LN2 = 0.6931471805599453       # repr(ln 2)


def norm_cdf_gl(x: float) -> float:
    """Standard normal CDF by GL-24 over [0, clamp(x, -9, 9)] — the
    PHI every :func:`ptukey_sf` evaluation uses, NOT libm erf, so the
    DuckDB spelling (which has no erf) replays the identical
    operation sequence.  Max |err| vs erf: 6.7e-16 on [-9, 9]
    (pinned); the clamp's tail loss is PHI(-9) = 1.1e-19."""
    xc = max(-9.0, min(9.0, x))
    h = xc * 0.5
    s = 0.0
    for xi, w in zip(GL24_X, GL24_W):
        t = h * (xi + 1.0)
        s += w * math.exp(-0.5 * (t * t))
    return 0.5 + h * s / _SQRT2PI


# PHI at the fixed inner z grid (z = 9 * GL64_X[j]) — a pure-function
# cache: ptukey_sf's inner loop needs PHI(z) at the SAME 64 abscissae
# for every (q, k, df), so precomputing at import changes nothing
# about the values (the SQL spelling evaluates the identical
# expression inline) and removes 64 of the 128 PHI evaluations per
# (u, z) node pair.
_PHI_Z = tuple(norm_cdf_gl(9.0 * x) for x in GL64_X)


def ptukey_sf(q: float, k: int, df: float) -> float:
    """Studentized range upper tail ``P(Q_{k, df} > q)`` — the
    Games-Howell per-pair p at ``q = |t| * sqrt(2)`` with the pair's
    Welch-Satterthwaite ``df``.  Fixed-node GL quadrature (see module
    section comment); mirrored bit-for-bit-in-ops by
    :func:`ptukey_sql` for the DuckDB oracle.  ``q <= 0`` returns 1.0
    (the whole mass is above a nonpositive range — same convention as
    :func:`f_sf`; the SQL spelling carries the same CASE guard)."""
    if q is None or df is None:
        return None
    if not q > 0.0:
        return 1.0
    sd = 1.0 / math.sqrt(2.0 * df)
    lo = max(0.0, 1.0 - 10.0 * sd)
    hi = 1.0 + 10.0 * sd
    lc = (0.5 * df * math.log(0.5 * df) + _LN2
          - lgamma_lanczos(0.5 * df))
    hu = (hi - lo) * 0.5
    mu = (hi + lo) * 0.5
    acc = 0.0
    for xu, wu in zip(GL64_X, GL64_W):
        u = mu + hu * xu
        fu = math.exp(lc + (df - 1.0) * math.log(u)
                      - 0.5 * df * (u * u))
        r = q * u
        s = 0.0
        for j in range(64):
            z = 9.0 * GL64_X[j]
            d = _PHI_Z[j] - norm_cdf_gl(z - r)
            if d < 0.0:
                d = 0.0
            s += (GL64_W[j] * math.exp(-0.5 * (z * z)) / _SQRT2PI
                  * d ** (float(k) - 1.0))
        acc += wu * fu * (float(k) * 9.0 * s)
    p = 1.0 - hu * acc
    return min(1.0, max(0.0, p))


# SQL-side node arrays: the emitted expression indexes these as row
# columns (a literal array inside a lambda would be re-built per
# element); ptukey_node_columns() adds them to the wrapped relation.
_PTUKEY_NODE_COLS = (
    ("__pt24x", GL24_X), ("__pt24w", GL24_W),
    ("__pt64x", GL64_X), ("__pt64w", GL64_W),
)


def ptukey_node_columns() -> str:
    """SELECT-list fragment adding the GL node/weight arrays as
    DOUBLE[] columns — prepend to the relation :func:`ptukey_sql`'s
    expression runs over (``SELECT p.*, <this> FROM (prep) p``)."""
    return ", ".join(
        "[" + ", ".join(repr(v) for v in vals) + f"]::DOUBLE[] AS {n}"
        for n, vals in _PTUKEY_NODE_COLS)


def _phi_sql(x: str) -> str:
    """DuckDB spelling of :func:`norm_cdf_gl` at expression ``x``."""
    h = f"(greatest(-9.0, least(9.0, {x})) * 0.5)"
    t = f"({h} * (__pt24x[__ip] + 1.0))"
    return (f"(0.5 + {h} * list_sum(list_transform("
            f"generate_series(1, 24), __ip -> "
            f"__pt24w[__ip] * exp(-0.5 * ({t} * {t})))) "
            f"/ 2.5066282746310002)")


def ptukey_sql(q: str, k: str, dof: str) -> str:
    """DuckDB spelling of :func:`ptukey_sf` over expression texts
    ``q``/``k``/``dof`` — the same literal GL nodes (via
    :func:`ptukey_node_columns`'s array columns), the same operation
    sequence, nested ``list_sum(list_transform(...))`` with the
    sequential list order standing in for the Python loop (the
    repo-wide precedent: the KS oracle's Kolmogorov series).  NULL
    ``q``/``dof`` propagate; ``q <= 0`` returns 1.0."""
    sd = f"(1.0 / sqrt(2.0 * {dof}))"
    lo = f"greatest(0.0, 1.0 - 10.0 * {sd})"
    hi = f"(1.0 + 10.0 * {sd})"
    lc = (f"(0.5 * {dof} * ln(0.5 * {dof}) + 0.6931471805599453"
          f" - {lgamma_sql(f'(0.5 * {dof})')})")
    hu = f"(({hi} - {lo}) * 0.5)"
    mu = f"(({hi} + {lo}) * 0.5)"
    u = f"({mu} + {hu} * __pt64x[__iu])"
    fu = (f"exp({lc} + ({dof} - 1.0) * ln({u})"
          f" - 0.5 * {dof} * ({u} * {u}))")
    r = f"(({q}) * {u})"
    z = "(9.0 * __pt64x[__iz])"
    d = f"greatest({_phi_sql(z)} - {_phi_sql(f'({z} - {r})')}, 0.0)"
    inner = (f"list_sum(list_transform(generate_series(1, 64), "
             f"__iz -> __pt64w[__iz] * exp(-0.5 * ({z} * {z})) "
             f"/ 2.5066282746310002 "
             f"* pow({d}, CAST({k} AS DOUBLE) - 1.0)))")
    outer = (f"list_sum(list_transform(generate_series(1, 64), "
             f"__iu -> __pt64w[__iu] * ({fu}) "
             f"* (CAST({k} AS DOUBLE) * 9.0 * ({inner}))))")
    return (f"(CASE WHEN ({q}) IS NULL OR ({dof}) IS NULL THEN NULL "
            f"WHEN NOT (({q}) > 0.0) THEN 1.0 "
            f"ELSE least(1.0, greatest(0.0, "
            f"1.0 - {hu} * ({outer}))) END)")


# =====================================================================
# Exact small-n rank-test nulls (round 13)
# =====================================================================
# The no-ties exact null distributions of Mann-Whitney U and the
# Wilcoxon signed-rank W+ via the classic partial-sum DP — integer
# counting, one float division at the end.  The r12 argument for the
# exact t tails applies verbatim: the sliced sweeps invite exactly
# the small-slice regime where the tie-corrected normal is materially
# off (n1 = n2 = 5: exact two-sided p at U = 2 is 0.0317; the normal
# reads 0.028 — and at the table boundary the DECISION flips).
# Driver-side only (one-row ops; the DP is a sequential recurrence
# with no fixed-depth column spelling — stated), gated by
# RANK_EXACT_MAX_N; the tie-corrected normal is RETAINED for ties or
# larger n (for ties it is the published test — see the module
# docstring's retained-approximations note, which this section
# narrows to "ties or n beyond the exact gate").

# Exact-null ceiling: both ops switch to the DP when every count is
# untied and the relevant sizes are all <= this.  25 covers the
# classical critical-value tables (n <= 20-25) and the annotator-
# study regime; the MW DP costs n * na * (na*nb) integer adds —
# ~1.5M at the cap, milliseconds — and grows too fast to raise the
# gate much further (stated).
RANK_EXACT_MAX_N = 25


def _rank_sum_ways(n: int, m: int) -> list:
    """ways[j][s] = number of j-subsets of ranks {1..n} with sum s —
    the bounded-subset partial-sum DP (items descending so each rank
    is used at most once)."""
    smax = n * (n + 1) // 2
    ways = [[0] * (smax + 1) for _ in range(m + 1)]
    ways[0][0] = 1
    for i in range(1, n + 1):
        for j in range(min(i, m), 0, -1):
            wj, wj1 = ways[j], ways[j - 1]
            for s in range(smax, i - 1, -1):
                c = wj1[s - i]
                if c:
                    wj[s] += c
    return ways


def mw_u_exact_p2(u_times2: int, na: int, nb: int) -> float:
    """Two-sided EXACT Mann-Whitney p under the no-ties null:
    P-weight of each U value = (number of na-subsets of ranks
    {1..na+nb} with rank sum W = U + na(na+1)/2) / C(na+nb, na);
    two-sided p = min(1, 2 * min(P(U <= u), P(U >= u))) — the R
    ``wilcox.test`` exact convention (U is symmetric about
    na*nb/2, so the doubling never hides an asymmetry).
    ``u_times2`` is the integer 2*U the op's exact core produces
    (even whenever there are no ties)."""
    u = u_times2 // 2
    off = na * (na + 1) // 2
    ways = _rank_sum_ways(na + nb, na)[na]
    lo = sum(ways[off + v] for v in range(0, u + 1))
    hi = sum(ways[off + v] for v in range(u, na * nb + 1))
    total = sum(ways[off:off + na * nb + 1])
    return min(1.0, 2.0 * min(lo, hi) / total)


def wilcoxon_exact_p2(w_times2: int, n: int) -> float:
    """Two-sided EXACT Wilcoxon signed-rank p under the
    no-ties/no-zeros null: ways[s] = number of subsets of {1..n}
    with sum s (the generating product (1+x)(1+x^2)..(1+x^n)),
    total 2^n; p = min(1, 2 * min(P(W+ <= w), P(W+ >= w)))."""
    w = w_times2 // 2
    smax = n * (n + 1) // 2
    ways = [0] * (smax + 1)
    ways[0] = 1
    for i in range(1, n + 1):
        for s in range(smax, i - 1, -1):
            c = ways[s - i]
            if c:
                ways[s] += c
    lo = sum(ways[: w + 1])
    hi = sum(ways[w:])
    return min(1.0, 2.0 * min(lo, hi) / (1 << n))

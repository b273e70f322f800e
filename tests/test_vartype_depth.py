"""VariableTypeDetector depth: continuous-GoF battery (uniform /
normal / beta1..beta5), KS p-values, CM statistic, sliding re-test
with binomial backtracking."""

import numpy as np
import pytest

from logdata_anomaly_miner_ray.stages.vartype import (
    GofBacktracker,
    VarType,
    _beta_cdf,
    cm_statistic,
    detect_continuous_shape,
    infer_var_type,
    ks_pvalue,
    s_gof_retest,
)


def test_ks_pvalue_known_values():
    # published asymptotic Kolmogorov values: Q(1.36) ≈ 0.0505,
    # Q(1.22) ≈ 0.1019 (lambda = adjusted sqrt(n)*D)
    n = 10_000  # large n → adjustment negligible
    for lam, want in [(1.36, 0.0505), (1.22, 0.1019), (1.63, 0.0100)]:
        d = lam / (np.sqrt(n) + 0.12 + 0.11 / np.sqrt(n))
        assert ks_pvalue(d, n) == pytest.approx(want, abs=2e-3)


def test_beta_cdf_closed_forms():
    x = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    # arcsine law
    assert _beta_cdf(x, 0.5, 0.5) == pytest.approx(
        2 / np.pi * np.arcsin(np.sqrt(x))
    )
    # Beta(1,5): 1 - (1-x)^5
    assert _beta_cdf(x, 1, 5) == pytest.approx(1 - (1 - x) ** 5)
    # Beta(5,1): x^5
    assert _beta_cdf(x, 5, 1) == pytest.approx(x**5)
    # symmetry: I_x(5,2) = 1 - I_{1-x}(2,5)
    assert _beta_cdf(x, 5, 2) == pytest.approx(1 - _beta_cdf(1 - x, 2, 5))


@pytest.mark.parametrize(
    "name,gen",
    [
        ("uniform", lambda r: r.uniform(2, 9, 500)),
        ("normal", lambda r: r.normal(10, 3, 500)),
        ("beta1", lambda r: r.beta(0.5, 0.5, 500) * 4 + 1),
        ("beta2", lambda r: r.beta(5, 2, 500) * 10),
        ("beta3", lambda r: r.beta(2, 5, 500) * 10),
        ("beta5", lambda r: r.beta(5, 1, 500)),
    ],
)
def test_detect_each_family(name, gen):
    vt = detect_continuous_shape(gen(np.random.default_rng(7)))
    assert vt is not None and vt.kind == "continuous"
    assert vt.detail["dist"] == name


def test_infer_var_type_routes_to_battery():
    rng = np.random.default_rng(3)
    vt = infer_var_type(rng.beta(5, 2, 400) * 7 + 1)
    assert vt.kind == "continuous" and vt.detail["dist"] == "beta2"


def test_cm_statistic_accepts_and_rejects():
    rng = np.random.default_rng(11)
    uni = np.sort(rng.uniform(0, 1, 400))
    w2_good = cm_statistic(uni, uni)  # exact CDF
    assert w2_good < 0.461
    shifted = np.sort(rng.beta(5, 1, 400))
    w2_bad = cm_statistic(shifted, shifted)  # uniform CDF on beta data
    assert w2_bad > 0.743
    vt = detect_continuous_shape(rng.normal(0, 1, 400), used_gof_test="CM")
    assert vt is not None and vt.detail["dist"] == "normal"


def test_s_gof_retest_and_backtracking():
    rng = np.random.default_rng(5)
    vt = detect_continuous_shape(rng.normal(10, 3, 500))
    assert vt.detail["dist"] == "normal"
    ok, _ = s_gof_retest(rng.normal(10, 3, 100), vt)
    assert ok
    bad, stat = s_gof_retest(rng.normal(20, 3, 100), vt)  # mean shifted
    assert not bad and stat > 0.5
    bt = GofBacktracker(num_bt=30, alpha_bt=0.1)  # tolerates ONE failure
    assert not bt.record("v", False)
    assert bt.record("v", False)  # second failure in window → discard
    assert not bt.record("v", False)  # window reset after discard


def test_non_fitting_sample_returns_none():
    # bimodal far-apart clusters fit none of the families
    rng = np.random.default_rng(9)
    vals = np.concatenate([rng.normal(0, 0.1, 250), rng.normal(100, 0.1, 250)])
    assert detect_continuous_shape(vals) is None
    vt = infer_var_type(vals)
    assert vt.kind == "range"

"""VariableCorrelationDetector recast: unit tests for the quantile
math, rule fitting, homogeneity/backtracking lifecycle, and
validation pruning (reference parity is in test_reference_parity)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from logdata_anomaly_miner_ray.stages.correlation_rules import (
    VarCorConfig,
    WRelTester,
    bt_min_successes,
    chi2_ppf,
    correlation_rules,
    fit_rel_rules,
    fit_w_rel_rules,
    homogeneity_test,
    pair_cooccurrence_counts,
    preselect_pairs,
    select_discrete_columns,
    validate_cover_vals,
    validate_distinct_distr,
)


def test_chi2_ppf_published_quantiles():
    """Standard chi-square table values (no scipy in this env — this
    anchors the stub used to drive the reference class)."""
    for p, k, want in [
        (0.95, 1, 3.841459),
        (0.95, 4, 9.487729),
        (0.99, 10, 23.209251),
        (0.90, 2, 4.605170),
        (0.95, 30, 43.772972),
    ]:
        assert chi2_ppf(p, k) == pytest.approx(want, abs=1e-4)


def test_rel_rules_deterministic_and_not():
    cooc = pd.DataFrame(
        {"a": ["x", "x", "y", "y", "z"], "b": ["1", "1", "2", "3", "1"],
         "n": [5, 3, 2, 2, 4]}
    )
    r = fit_rel_rules(cooc)
    assert r["fwd"] == {"x": ("1", 8), "z": ("1", 4)}  # y maps to 2 values
    assert r["rev"] == {"2": ("y", 2), "3": ("y", 2)}  # '1' has 2 left values


def test_w_rel_check_prunes_diverse_uniform():
    # left value mapping to MANY right values with near-uniform
    # counts is not a correlation (check_cor_w_rel)
    cfg = VarCorConfig(check_cor_thres=0.5, check_cor_num_thres=2)
    cooc = pd.DataFrame(
        {"a": ["u"] * 4 + ["v"], "b": ["1", "2", "3", "4", "1"],
         "n": [5, 5, 5, 5, 20]}
    )
    r = fit_w_rel_rules(cooc, n_a_vals=2, n_b_vals=4, cfg=cfg)
    assert "u" not in r["fwd"] and "v" in r["fwd"]


def test_homogeneity_chi_and_maxdist():
    cfg = VarCorConfig(used_homogeneity_test="Chi", alpha_chisquare_test=0.05)
    learned = {"1": 50, "2": 50}
    assert homogeneity_test(learned, {"1": 48, "2": 52}, cfg)
    assert not homogeneity_test(learned, {"1": 95, "2": 5}, cfg)
    cfg2 = VarCorConfig(used_homogeneity_test="MaxDist", max_dist_rule_distr=0.1)
    assert homogeneity_test(learned, {"1": 55, "2": 45}, cfg2)
    assert not homogeneity_test(learned, {"1": 80, "2": 20}, cfg2)


def test_wrel_tester_binomial_backtracking():
    """A single failing update must NOT kill a rule; persistent
    failure must (num_bt trailing window, alpha_bt)."""
    cfg = VarCorConfig()  # num_bt=30, alpha_bt=0.1 → tolerates ONE failure
    assert bt_min_successes(cfg.num_bt, 1 - cfg.alpha_bt, cfg.alpha_bt) == 29
    w_rel = {(("a", "b"), 0): {"x": {"1": 50, "2": 50}}}
    tester = WRelTester(w_rel, cfg)
    shifted = pd.DataFrame({"a": ["x", "x"], "b": ["1", "2"], "n": [95, 5]})
    ok_batch = pd.DataFrame({"a": ["x", "x"], "b": ["1", "2"], "n": [50, 50]})
    assert tester.test_batch({("a", "b"): ok_batch}) == []
    # one flaky batch is tolerated (29 successes of 30 ≥ threshold)
    assert tester.test_batch({("a", "b"): shifted}) == []
    # a second failure within the window kills (and resets) the rule
    assert tester.test_batch({("a", "b"): shifted}) == [(("a", "b"), 0, "x")]
    # after the reset a single failure is tolerated again
    assert tester.test_batch({("a", "b"): shifted}) == []


def test_validation_pruning():
    cfg = VarCorConfig(validate_cor_distinct_thres=0.05, min_values_cors_thres=1)
    # coverVals: rules covering 4 of 100 lines get dropped at 0.7
    rel = {0: {"x": ("1", 4)}, 1: {"1": ("x", 90)}}
    out = validate_cover_vals(rel, 100, 0.7, weighted=False)
    assert out[0] == {} and out[1] != {}
    # distinctDistr: conditional distributions identical across left
    # values → pruned; distinct → kept
    same = {0: {"x": {"1": 10, "2": 10}, "y": {"1": 10, "2": 10}}}
    dist = {0: {"x": {"1": 20}, "y": {"2": 20}}}
    rv = {0: ["1", "2"]}
    assert validate_distinct_distr(same, rv, cfg)[0] == {}
    assert validate_distinct_distr(dist, rv, cfg)[0] != {}


def test_correlation_rules_end_to_end():
    n = 400
    a = [f"a{i % 4}" for i in range(n)]
    b = [f"b{(i % 4) % 2}" for i in range(n)]  # deterministic in a
    c = [f"c{(i * 13) % 3}" for i in range(n)]  # independent
    t = pa.table({"a": a, "b": b, "c": c})
    out = correlation_rules(rd.from_arrow(t).repartition(4), ["a", "b", "c"])
    got = {(r.col_a, r.val_a, r.col_b, r.val_b) for r in out.itertuples()}
    for k in range(4):
        assert ("a", f"a{k}", "b", f"b{k % 2}") in got
    # b -> a is NOT deterministic (2 left values each)
    assert not any(r.col_a == "b" and r.col_b == "a" for r in out.itertuples())


def test_preselection_intersect_and_random():
    cfg = VarCorConfig(
        used_presel_meth=["matchDiscVals", "excludeDueDistr"],
        intersect_presel_meth=True,
    )
    col_stats = {
        "a": (["x", "y"], [0.5, 0.5]),
        "b": (["x", "z"], [0.9, 0.1]),  # dominated → excluded
        "c": (["x", "y", "q"], [0.4, 0.3, 0.3]),
    }
    pairs = preselect_pairs(col_stats, cfg)
    # matchDiscVals keeps (a,c) (overlap 2 > 0.7*2); excludeDueDistr
    # drops b entirely; intersection = {(a, c)}
    assert pairs == [("a", "c")]
    cfg_r = VarCorConfig(used_presel_meth=["random"], percentage_random_cors=0.5)
    pr = preselect_pairs(col_stats, cfg_r)
    assert len(pr) == round(0.5 * 3) and all(p[0] < p[1] for p in pr)

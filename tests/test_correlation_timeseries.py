"""Correlation, time-series and session stages vs hand oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _ds(rows, cols=("user", "ev", "ts")):
    arrs = list(zip(*rows))
    t = pa.table(
        {
            cols[0]: pa.array(list(arrs[0])),
            cols[1]: pa.array(list(arrs[1])),
            cols[2]: pa.array(list(arrs[2]), pa.int64()).cast(pa.timestamp("us")),
        }
    )
    return rd.from_arrow(t)


def test_interval_join_violations():
    from logdata_anomaly_miner_ray.stages.correlation import interval_join_violations

    S = 1_000_000
    rows = [
        ("u", "a", 0 * S), ("u", "b", 5 * S),        # matched (within 10s)
        ("u", "a", 100 * S),                          # unmatched
        ("v", "a", 0 * S), ("v", "b", 50 * S),        # b too late
    ]
    out = interval_join_violations(
        _ds(rows), ["user"], "ev", "ts", "a", "b", 0.0, 10.0
    ).to_pandas()
    got = sorted(zip(out["user"], out["ts"].astype(np.int64)))
    assert got == [("u", 100 * S), ("v", 0)]


def test_implication_support():
    from logdata_anomaly_miner_ray.stages.correlation import implication_support

    S = 1_000_000
    rows = [("u", "a", 0), ("u", "b", 1 * S), ("u", "a", 10 * S), ("u", "c", 100 * S)]
    out = (
        implication_support(_ds(rows), ["user"], "ev", "ts", max_delta=5.0)
        .to_pandas()
        .set_index(["a_event", "b_event"])
    )
    assert out.loc[("a", "b")]["n_a"] == 2 and out.loc[("a", "b")]["n_hit"] == 1
    assert out.loc[("a", "c")]["n_hit"] == 0


def test_contingency_chi2_independent_vs_dependent():
    from logdata_anomaly_miner_ray.stages.correlation import contingency_chi2

    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, 4000)
    b_dep = (a + rng.integers(0, 2, 4000) * (rng.random(4000) < 0.1)).clip(0, 1)
    b_ind = rng.integers(0, 2, 4000)
    ds_dep = rd.from_arrow(pa.table({"a": a.astype(str), "b": b_dep.astype(str)}))
    ds_ind = rd.from_arrow(pa.table({"a": a.astype(str), "b": b_ind.astype(str)}))
    chi_dep, dof, _ = contingency_chi2(ds_dep, "a", "b")
    chi_ind, _, _ = contingency_chi2(ds_ind, "a", "b")
    assert dof == 1
    assert chi_dep > 100 > chi_ind  # dependent huge, independent small


def test_mean_shift_detects_level_change():
    from logdata_anomaly_miner_ray.stages.timeseries import mean_shift_violations

    S = 1_000_000
    rows = []
    rng = np.random.default_rng(1)
    for w in range(6):
        base = 100.0 if w < 3 else 200.0  # level shift at window 3
        for i in range(50):
            rows.append(("k", float(base + rng.normal(0, 5)), w * 3600 * S + i * S))
    t = pa.table(
        {
            "key": [r[0] for r in rows],
            "value": [r[1] for r in rows],
            "ts": pa.array([r[2] for r in rows], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    out = mean_shift_violations(
        rd.from_arrow(t), ["key"], "value", "ts", window_seconds=3600
    ).to_pandas()
    assert out["window"].tolist() == [3]


def test_ar_forecast_outliers():
    from logdata_anomaly_miner_ray.stages.timeseries import ar_forecast_outliers

    wins = list(range(40))
    n = [100.0] * 40
    n[30] = 500.0  # spike
    df = pd.DataFrame({"key": "k", "window": wins, "n": n})
    out = ar_forecast_outliers(df, ["key"])
    assert 30 in out["window"].tolist()


def test_pca_outlier_windows():
    from logdata_anomaly_miner_ray.stages.timeseries import pca_outlier_windows

    S = 1_000_000
    rows = []
    rng = np.random.default_rng(2)
    for w in range(30):
        # correlated pattern: a≈b; window 25 breaks the correlation
        na = 50 + int(rng.integers(0, 10))
        nb = na if w != 25 else 5
        rows += [("x", "a", w * 600 * S + i * 1000) for i in range(na)]
        rows += [("x", "b", w * 600 * S + i * 1000 + 1) for i in range(nb)]
    ds = _ds(rows)
    out = pca_outlier_windows(ds, "ev", "ts", 600, n_components=1)
    flagged = out[out["anomaly"]]["window"].tolist()
    assert 25 in flagged


def test_time_of_period_outliers():
    from logdata_anomaly_miner_ray.stages.timeseries import time_of_period_outliers

    S = 1_000_000
    day = 86400 * S
    rows = [("job", "run", d * day + 3600 * S) for d in range(5)]  # daily at 01:00
    rows.append(("job", "run", 5 * day + 12 * 3600 * S))  # once at 12:00
    out = time_of_period_outliers(
        _ds(rows), ["user"], "ts", 86400, max_time_diff=600.0
    ).to_pandas()
    assert len(out) == 1
    assert int(out["ts"].astype(np.int64).iloc[0]) == 5 * day + 12 * 3600 * S


def test_sessionize_and_combos():
    from logdata_anomaly_miner_ray.stages.session import session_combos, sessionize

    S = 1_000_000
    rows = [
        ("u", "a", 0), ("u", "b", 10 * S),            # session 0
        ("u", "c", 5000 * S),                          # session 1 (gap > 1800s)
        ("v", "a", 0),
    ]
    s = sessionize(_ds(rows), ["user"], "ts", 1800.0).to_pandas()
    u = s[s["user"] == "u"].sort_values("ts")
    assert u["session_id"].tolist() == [0, 0, 1]
    combos = session_combos(_ds(rows), ["user"], ["ev"], "ts", 1800.0).to_pandas()
    u0 = combos[(combos["user"] == "u") & (combos["session_id"] == 0)]
    assert u0["ev_set"].iloc[0] == "a|b"
    assert u0["n_events"].iloc[0] == 2


def test_hypothesis_generation_and_rules():
    """EventCorrelationDetector generation path: A→B within 5s is
    seeded; hypotheses must include (A, B) forward, and the full
    lifecycle must accept it as a rule; the never-adjacent (A, C)
    implication must not be generated."""
    from logdata_anomaly_miner_ray.stages.correlation import (
        event_correlation_rules,
        generate_hypotheses,
    )

    S = 1_000_000
    rows = []
    for k in range(40):
        base = k * 1000 * S
        rows.append(("u", "A", base))
        rows.append(("u", "B", base + 2 * S))  # B always 2s after A
        rows.append(("u", "C", base + 500 * S))  # C far from A/B
    hyp = generate_hypotheses(
        _ds(rows), ["user"], "ev", "ts", max_delta=5.0, seed=1
    )
    got = set(zip(hyp["a_event"], hyp["b_event"], hyp["direction"]))
    assert ("A", "B", "forward") in got
    assert not any(a == "A" and b == "C" for a, b, _ in got)
    rules = event_correlation_rules(
        _ds(rows), ["user"], "ev", "ts",
        max_delta=5.0, hypothesis_max_delta_time=5.0, p0=0.9, alpha=0.05,
        min_support=20, seed=1,
    )
    accepted = set(zip(rules["a_event"], rules["b_event"]))
    assert ("A", "B") in accepted
    assert ("A", "C") not in accepted


def test_hypothesis_generation_sampling_caps():
    from logdata_anomaly_miner_ray.stages.correlation import generate_hypotheses

    S = 1_000_000
    rows = [("u", f"e{i % 20}", i * S) for i in range(400)]
    hyp_all = generate_hypotheses(
        _ds(rows), ["user"], "ev", "ts", max_delta=3.0, seed=2
    )
    hyp_sampled = generate_hypotheses(
        _ds(rows), ["user"], "ev", "ts", max_delta=3.0, seed=2,
        generation_probability=0.2, generation_factor=0.3,
    )
    assert 0 < len(hyp_sampled) < len(hyp_all)
    hyp_capped = generate_hypotheses(
        _ds(rows), ["user"], "ev", "ts", max_delta=3.0, seed=2, max_hypotheses=5
    )
    assert len(hyp_capped) == 5


def test_acf_auto_period_and_seasonal_ar():
    """Seasonal AR upgrade (TSAArima recast): the period is detected
    from the ACF and a season-breaking spike flags; the same spike
    size inside the seasonal pattern does not."""
    from logdata_anomaly_miner_ray.stages.timeseries import (
        auto_period,
        seasonal_ar_outliers,
    )

    base = [5.0, 20.0, 5.0, 5.0, 20.0, 5.0]  # period 3... repeated
    y = np.array(base * 10)
    assert auto_period(y) == 3
    rows = [("k", w, float(v)) for w, v in enumerate(y)]
    rows[25] = ("k", 25, 60.0)  # break the season at window 25
    counts = pd.DataFrame(rows, columns=["key", "window", "n"])
    out = seasonal_ar_outliers(counts, ["key"], band_factor=3.0)
    assert (out["period"] > 0).all()
    assert 25 in set(out["window"])
    # a clean periodic series yields no outliers
    clean = pd.DataFrame(
        [("k", w, float(v)) for w, v in enumerate(y)], columns=["key", "window", "n"]
    )
    assert len(seasonal_ar_outliers(clean, ["key"], band_factor=3.0)) == 0


def test_seasonal_ar_falls_back_without_period():
    from logdata_anomaly_miner_ray.stages.timeseries import seasonal_ar_outliers

    rng = np.random.default_rng(4)
    y = rng.poisson(10, 40).astype(float)
    y[30] = 200.0
    counts = pd.DataFrame(
        [("k", w, v) for w, v in enumerate(y)], columns=["key", "window", "n"]
    )
    out = seasonal_ar_outliers(counts, ["key"], band_factor=3.0)
    assert 30 in set(out["window"])


def test_time_correlation_report_and_features():
    """Dataset path of the TimeCorrelationDetector recast: windowed
    pair tables over a seeded A→B stream, plus deterministic seeded
    feature-rule sampling."""
    from logdata_anomaly_miner_ray.stages.correlation import (
        sample_feature_rules,
        tc_pair_tables,
        time_correlation_report,
    )

    S = 1_000_000
    rows = []
    for i in range(200):
        rows.append((i * 2, "A", (1000 + i * 20) * S))
        rows.append((i * 2 + 1, "B", (1000 + i * 20 + 3) * S))  # B 3s after A
    t = pa.table(
        {"rid": pa.array([r[0] for r in rows], pa.int64()),
         "ev": pa.array([r[1] for r in rows], pa.string()),
         "ts": pa.array([r[2] for r in rows], pa.int64())}
    )
    ds = rd.from_arrow(t).repartition(4)
    feats = [[("ev", "A")], [("ev", "B")]]
    rep = time_correlation_report(ds, "ts", "rid", feats, record_window=100, max_delta=10.0)
    # A(0)→B(1): every B is 3 s after an A → 50 per window of 100 rows
    ab = rep[(rep["a_idx"] == 0) & (rep["b_idx"] == 1)]
    assert len(ab) == 4 and (ab["n"] == 50).all()
    assert (ab["delta_us"] == 50 * 3 * S).all()
    # B→A gap is 17 s > 10 s: no (1,0) rows
    assert len(rep[(rep["a_idx"] == 1) & (rep["b_idx"] == 0)]) == 0
    assert (ab["trig_a"] == 50).all() and (ab["trig_b"] == 50).all()

    # seeded feature sampling: deterministic across calls, honors caps
    r1 = sample_feature_rules(ds, ["ev"], parallel_check_count=3, seed=5)
    r2 = sample_feature_rules(ds, ["ev"], parallel_check_count=3, seed=5)
    assert r1 == r2 and 0 < len(r1) <= 3
    for conj in r1:
        assert all(c == "ev" for c, _ in conj)

    # empty input keeps the typed schema
    empty = time_correlation_report(
        rd.from_arrow(t.slice(0, 0)), "ts", "rid", feats, record_window=100
    )
    assert list(empty.columns) == ["window", "a_idx", "b_idx", "n", "delta_us", "trig_a", "trig_b"]


def test_manhattan_cluster_score_modes():
    """Hand-computed reference check() values: plain, norm, idf,
    early abort, and the empty-model score-1 rule."""
    import math

    from logdata_anomaly_miner_ray.stages.correlation import manhattan_cluster_score

    # empty model → 1 (first window always anomalous)
    assert manhattan_cluster_score({"A": 2}, [], 0.4) == 1.0
    # identical vector → distance 0 → early abort (-1)
    assert manhattan_cluster_score({"A": 2}, [{"A": 2}], 0.4) == -1.0
    # plain: vec {A:3}, known {A:1,B:2}: manh=|3-1|+2=4, max=3+2=5
    assert manhattan_cluster_score({"A": 3}, [{"A": 1, "B": 2}], 0.1) == 4 / 5
    # norm: {A:1,B:1} vs {A:3,B:1}: a=(.5,.5), b=(.75,.25),
    # manh=.25+.25=.5, max=.75+.5=1.25 → 0.4
    assert manhattan_cluster_score(
        {"A": 1, "B": 1}, [{"A": 3, "B": 1}], 0.1, norm=True
    ) == pytest.approx(0.4)
    # idf: weight w halves B's contribution
    w = {"A": 1.0, "B": math.log10(2)}
    s = manhattan_cluster_score({"A": 3}, [{"A": 1, "B": 2}], 0.1, idf_weights=w)
    assert s == pytest.approx((2 + 2 * w["B"]) / (3 + 2 * w["B"]))
    # early abort: first model vector similar → -1 even though second is far
    assert manhattan_cluster_score({"A": 2}, [{"A": 2}, {"Z": 9}], 0.4) == -1.0


def test_replay_tiers_refuse_past_row_cap():
    """The EXACT-replay parity tiers are driver-bound folds; their
    row caps must make accidental corpus-scale invocation impossible
    — a cap of 0 raises a ValueError naming the distributed scale
    path (stages/_agg.bounded_collect)."""
    from logdata_anomaly_miner_ray.stages.correlation import (
        event_count_cluster_anomalies,
        time_correlation_report,
    )
    from logdata_anomaly_miner_ray.stages.timeseries import (
        average_change_exact,
        pca_detector_exact,
    )

    S = 1_000_000
    rows = [(i, "u1", "A" if i % 2 else "B", (1000 + i * 5) * S, float(i % 7))
            for i in range(120)]
    t = pa.table(
        {"rid": pa.array([r[0] for r in rows], pa.int64()),
         "user": pa.array([r[1] for r in rows], pa.string()),
         "ev": pa.array([r[2] for r in rows], pa.string()),
         "ts": pa.array([r[3] for r in rows], pa.int64()),
         "val": pa.array([r[4] for r in rows], pa.float64())}
    )
    ds = rd.from_arrow(t).repartition(3)
    feats = [[("ev", "A")], [("ev", "B")]]

    with pytest.raises(ValueError, match="sample_feature_rules"):
        time_correlation_report(ds, "ts", "rid", feats, record_window=30,
                                max_result_rows=0)
    with pytest.raises(ValueError, match="count_vector_outliers"):
        event_count_cluster_anomalies(
            ds, ["user"], "ev", "ts", window_size=20.0, max_result_rows=0)
    with pytest.raises(ValueError, match="pca_outlier_windows"):
        pca_detector_exact(ds, "ev", "ts", window_seconds=20.0,
                           max_replay_rows=0)
    with pytest.raises(ValueError, match="mean_shift_violations"):
        average_change_exact(ds, ["user"], "val", "rid",
                             min_bin_elements=10, max_result_rows=0)

    # and the normal caps leave results untouched
    rep = time_correlation_report(ds, "ts", "rid", feats, record_window=30)
    assert {"window", "a_idx", "b_idx", "n"} <= set(rep.columns)


def test_path_arima_exact_dataset_operator():
    """Dataset wrapper over PathArimaReplay: two keyed seasonal
    series, spikes flagged per key; matches a driver-side replay of
    the same sorted values exactly."""
    from logdata_anomaly_miner_ray.stages.timeseries import path_arima_exact
    from logdata_anomaly_miner_ray.stages.tsa import PathArimaReplay

    rng = np.random.RandomState(3)
    rows = []
    for key in ("p1", "p2"):
        base = 50 + 20 * np.sin(np.arange(140) * 2 * np.pi / 4)
        vals = (base + rng.randint(-3, 4, 140)).astype(float)
        vals[80] += 250
        for i, v in enumerate(vals):
            rows.append((key, i, float(v)))
    t = pa.table({
        "path": pa.array([r[0] for r in rows]),
        "rid": pa.array([r[1] for r in rows], pa.int64()),
        "val": pa.array([r[2] for r in rows], pa.float64()),
    })
    kw = dict(num_init=24, num_periods_tsa_ini=3, num_results_bt=5)
    got = path_arima_exact(
        rd.from_arrow(t).repartition(4), ["path"], "val", "rid", **kw)
    # driver-side oracle: replay each key's ordered values
    df = pd.DataFrame(rows, columns=["path", "rid", "val"])
    want = []
    for key, sub in df.groupby("path"):
        r = PathArimaReplay(**kw)
        for step, v in enumerate(sub.sort_values("rid")["val"]):
            verdict = r.step(float(v))
            if verdict["anomaly"]:
                want.append((key, step))
    assert list(map(tuple, got[["path", "step"]].to_numpy())) == sorted(want)
    assert (got["period"] > 0).all()
    assert any(s == 80 for _, s in want)  # the planted spike is flagged

"""Unit tests for the TSA replay kernels (stages/tsa.py); the
heavyweight evidence is the reference-driven lifecycle parity in
test_reference_parity.py."""

import math

import numpy as np

from logdata_anomaly_miner_ray.stages.tsa import (
    CssAr,
    TsaArimaReplay,
    acf_biased,
    bt_min_successes,
    norm_ppf,
    savgol1,
    tsa_time_steps,
)


def test_norm_ppf_known_values():
    assert abs(norm_ppf(0.975) - 1.959963984540054) < 1e-9
    assert abs(norm_ppf(0.5)) < 1e-12
    assert abs(norm_ppf(0.025) + 1.959963984540054) < 1e-9


def test_bt_min_successes_monotone():
    v = bt_min_successes(15, 0.05, 0.05)
    assert 0 <= v <= 15
    # stricter alpha_bt cannot require MORE successes (later exit)
    assert bt_min_successes(15, 0.05, 0.01) <= v


def test_acf_biased_perfect_period():
    y = np.tile([0.0, 10.0, 0.0, -10.0], 25)
    a = acf_biased(y, 20)
    assert a[0] == 1.0
    assert a[4] > 0.9 and a[8] > 0.8
    assert a[2] < -0.8


def test_savgol1_interior_is_moving_average():
    rng = np.random.RandomState(0)
    y = rng.rand(50)
    s = savgol1(y, 5)
    for i in range(2, 48):
        assert abs(s[i] - y[i - 2:i + 3].mean()) < 1e-12
    # linear input is reproduced exactly, edges included
    lin = np.arange(30, dtype=float) * 2.5 + 1
    assert np.allclose(savgol1(lin, 7), lin)


def test_cssar_recovers_ar_process():
    rng = np.random.RandomState(5)
    y = [0.0, 0.0]
    for _ in range(500):
        y.append(0.6 * y[-1] - 0.3 * y[-2] + rng.normal(0, 0.1))
    m = CssAr(y, 2)
    # coefficients ordered oldest-lag-first in the design matrix
    assert abs(m.coef[1] - 0.6) < 0.1 and abs(m.coef[0] + 0.3) < 0.1
    lo, hi = m.get_forecast(1).conf_int(0.05)[0]
    assert lo < m.predict_next() < hi


def test_replay_flags_spike_and_discards_on_run():
    rng = np.random.RandomState(2)
    base = 50 + 20 * np.sin(np.arange(100) * 2 * np.pi / 4)
    counts = (base + rng.randint(-2, 3, 100)).astype(float)
    counts[60:70] += 500
    r = TsaArimaReplay(num_periods_tsa_ini=3, num_division_time_step=4,
                       num_results_bt=5)
    verdicts = [r.step(c) for c in counts]
    anom_steps = [i for i, v in enumerate(verdicts) if v["anomaly"]]
    assert any(60 <= s < 70 for s in anom_steps)
    assert any(v["discarded"] for v in verdicts)
    # re-initializes after discard: active verdicts appear again
    last_discard = max(i for i, v in enumerate(verdicts) if v["discarded"])
    assert any(v["phase"] == "active" for v in verdicts[last_discard + 1:])


def test_tsa_time_steps_snap_to_assumed():
    # period 20 sections × waiting 2000s/100 sections = 400s period
    # → 40s per division step with num_division_time_step=10
    y = (1000 + 400 * np.sin(np.arange(100) * 2 * np.pi / 20)).tolist()
    out = tsa_time_steps([y], waiting_time=2000.0)
    assert len(out) == 1 and out[0] != -1
    flat = tsa_time_steps([[100.0] * 100])
    assert flat[0] == -1

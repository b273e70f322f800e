"""TSAArimaDetector exact streaming replay: CSS-AR(p) one-step
forecast bands, binomial-test model discard, ACF period detection.

Clean-room recast of the reference's TSA lifecycle (reference:
aminer/analysis/TSAArimaDetector.py:37-526). The reference leans on
statsmodels ARIMA / acf and scipy.signal.savgol_filter; none of those
exist in this environment, so the model math is hand-rolled numpy —
a conditional-sum-of-squares AR(p) with intercept (the AR(p,0,0)
no-seasonal-term special case the reference always requests: order
``(num_division_time_step, 0, 0)``, seasonal ``(0,0,0,m)`` has no
seasonal AR/MA/diff terms), a biased mean-centered ACF, and a
polyorder-1 Savitzky-Golay smoother (which for a symmetric window is
exactly a centered moving average, with linear-fit 'interp' edges).

Parity evidence (tests/test_reference_parity.py): the actual
reference detector is driven with these same numpy kernels shimmed in
for statsmodels/scipy, so the verdict lifecycle — initialization
cadence, band checks, result-list binomial discard, model append —
is compared step for step against :class:`TsaArimaReplay`, and the
period-detection pipeline against :func:`tsa_time_steps`. The
scale-path batch variants remain ``timeseries.ar_forecast_outliers``
/ ``seasonal_ar_outliers`` (documented recast).
"""

from __future__ import annotations

import math

import numpy as np


def norm_ppf(q: float) -> float:
    """Standard-normal quantile via bisection on math.erf (no scipy).
    Accurate to ~1e-12, plenty for confidence bands."""
    if not 0.0 < q < 1.0:
        raise ValueError("q must be in (0, 1)")
    lo, hi = -40.0, 40.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if 0.5 * (1.0 + math.erf(mid / math.sqrt(2.0))) < q:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def bt_min_successes(num_bt: int, p: float, alpha: float) -> int:
    """Minimal successes for the binomial test at significance alpha
    (reference TSAArimaDetector.bt_min_successes:512-526): smallest i
    with P[X <= i | X~Bin(num_bt, 1-p)] > alpha, via the same
    cumulative-sum loop."""
    tmp_sum = 0.0
    nfac = math.factorial(num_bt)
    i_fac = 1
    for i in range(num_bt + 1):
        i_fac = i_fac * max(i, 1)
        tmp_sum += nfac / (i_fac * math.factorial(num_bt - i)) * (
            (1 - p) ** i) * (p ** (num_bt - i))
        if tmp_sum > alpha:
            return i
    return num_bt


def acf_biased(data, nlags: int) -> np.ndarray:
    """Mean-centered, biased (denominator n) autocorrelation for lags
    0..min(nlags, n-1) — the statsmodels ``acf(fft=True)`` estimator
    the reference feeds to its period search."""
    y = np.asarray(data, dtype=np.float64)
    n = len(y)
    y = y - y.mean()
    denom = float((y * y).sum())
    k = min(nlags, n - 1)
    if denom == 0.0 or n < 2:
        out = np.zeros(k + 1)
        out[0] = 1.0
        return out
    out = np.empty(k + 1)
    for lag in range(k + 1):
        out[lag] = float((y[: n - lag] * y[lag:]).sum()) / denom
    return out


def savgol1(x, window: int) -> np.ndarray:
    """Savitzky-Golay filter, polyorder 1, 'interp' edge mode. For a
    symmetric window a linear LS fit evaluated at the center equals
    the window mean; edges take the linear fit over the first/last
    full window evaluated at the edge positions (scipy's default
    mode='interp' behavior for polyorder=1)."""
    y = np.asarray(x, dtype=np.float64)
    n = len(y)
    w = int(window)
    if w < 2 or n == 0:
        return y.copy()
    if w > n:
        w = n if n % 2 == 1 else n - 1
        if w < 2:
            return y.copy()
    half = w // 2
    out = np.empty(n)
    # interior: centered moving average
    csum = np.concatenate([[0.0], np.cumsum(y)])
    for i in range(half, n - half):
        out[i] = (csum[i + half + 1] - csum[i - half]) / w
    # edges: linear fit over the first/last window
    t = np.arange(w, dtype=np.float64)
    for seg, idxs in ((y[:w], range(half)), (y[-w:], range(n - half, n))):
        tm = t.mean()
        sm = seg.mean()
        vt = float(((t - tm) ** 2).sum())
        slope = float(((t - tm) * (seg - sm)).sum()) / vt if vt else 0.0
        for i in idxs:
            pos = i if i < half else i - (n - w)
            out[i] = sm + slope * (pos - tm)
    return out


class CssAr:
    """Conditional-sum-of-squares AR(p) with intercept; statsmodels-
    results-shaped surface (get_forecast(1).conf_int(alpha), append)
    so the reference detector can run on it through a module shim.

    Forecast interval: prediction ± z_{1-alpha/2}·sqrt(sigma2) with
    sigma2 = RSS / n_effective (the one-step-ahead CSS error
    variance)."""

    def __init__(self, history: list[float], p: int,
                 params: tuple | None = None):
        self.history = [float(v) for v in history]
        self.p = int(p)
        if params is not None:
            self.coef, self.const, self.sigma2 = params
            return
        y = np.asarray(self.history, dtype=np.float64)
        n = len(y)
        if n <= self.p + 1:
            raise ValueError("series too short for AR(p) fit")
        X = np.stack([y[i: n - self.p + i] for i in range(self.p)], axis=1)
        X = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        t = y[self.p:]
        sol, *_ = np.linalg.lstsq(X, t, rcond=None)
        self.coef = sol[:-1]
        self.const = float(sol[-1])
        resid = t - X @ sol
        self.sigma2 = float((resid * resid).sum() / max(1, len(t)))

    # --- statsmodels-results-shaped surface (used via the shim) ---
    def fit(self):
        return self

    def predict_next(self) -> float:
        lagged = np.asarray(self.history[-self.p:], dtype=np.float64)
        return float(lagged @ self.coef + self.const)

    def get_forecast(self, steps: int = 1):
        return _Forecast(self.predict_next(), math.sqrt(max(self.sigma2, 0.0)))

    def append(self, values):
        return CssAr(self.history + [float(v) for v in values], self.p,
                     params=(self.coef, self.const, self.sigma2))


class _Forecast:
    def __init__(self, mean: float, se: float):
        self.mean = mean
        self.se = se

    def conf_int(self, alpha: float = 0.05):
        z = norm_ppf(1.0 - alpha / 2.0)
        return [[self.mean - z * self.se, self.mean + z * self.se]]


class TsaArimaReplay:
    """Exact replay of the reference's per-event-type TSA lifecycle
    (TSAArimaDetector.test_num_appearance:362-502, default
    build_sum_over_values=False path): collect
    num_periods_tsa_ini·num_division_time_step counts, fit AR(p)
    with p=num_division_time_step, then per step emit the one-step
    band verdict, maintain the rolling result list and discard the
    model when successes in the last num_results_bt fall below the
    binomial minimum."""

    def __init__(self, num_periods_tsa_ini: int = 15,
                 num_division_time_step: int = 10, alpha: float = 0.05,
                 num_results_bt: int = 15, alpha_bt: float = 0.05,
                 learn_mode: bool = True):
        self.num_periods_tsa_ini = num_periods_tsa_ini
        self.num_division_time_step = num_division_time_step
        self.alpha = alpha
        self.num_results_bt = num_results_bt
        self.learn_mode = learn_mode
        self.bt_min_suc = bt_min_successes(num_results_bt, alpha, alpha_bt)
        self.history: list[float] = []
        self.model: CssAr | None = None
        self.result_list: list[int] = [1] * num_results_bt

    def step(self, count: float) -> dict:
        """Process one time-step count; returns the verdict record
        {phase, lower, upper, anomaly, confidence, discarded}."""
        ini_len = self.num_periods_tsa_ini * self.num_division_time_step
        if self.learn_mode and self.model is None:
            self.history.append(float(count))
            if len(self.history) > 2 * ini_len:
                self.history = self.history[-ini_len:]
            if len(self.history) >= ini_len:
                try:
                    self.model = CssAr(self.history[-ini_len:],
                                       self.num_division_time_step)
                except (ValueError, np.linalg.LinAlgError):
                    self.model = None
                if self.model is not None:
                    return {"phase": "initialized", "anomaly": False,
                            "discarded": False, "lower": None, "upper": None,
                            "confidence": None}
            return {"phase": "learning", "anomaly": False, "discarded": False,
                    "lower": None, "upper": None, "confidence": None}
        if self.model is None:
            return {"phase": "idle", "anomaly": False, "discarded": False,
                    "lower": None, "upper": None, "confidence": None}
        lower, upper = self.model.get_forecast(1).conf_int(alpha=self.alpha)[0]
        anomaly = count < lower or count > upper
        confidence = None
        if anomaly:
            if count < lower:
                confidence = (lower - count) / (upper - count)
            else:
                confidence = (count - upper) / (count - lower)
            self.result_list.append(0)
        else:
            self.result_list.append(1)
        if len(self.result_list) >= 2 * self.num_results_bt:
            self.result_list = self.result_list[-self.num_results_bt:]
        discarded = False
        if (self.learn_mode and
                sum(self.result_list[-self.num_results_bt:]) < self.bt_min_suc):
            # reference keeps time_window_history on discard (:466-467)
            # — the next learning step appends one count and refits on
            # the last ini_len values immediately.
            self.model = None
            self.result_list = [1] * self.num_results_bt
            discarded = True
        else:
            self.model = self.model.append([count])
        return {"phase": "active", "anomaly": anomaly, "discarded": discarded,
                "lower": float(lower), "upper": float(upper),
                "confidence": confidence}


def binom_test_greater(k: int, n: int, p: float) -> float:
    """One-sided binomial test p-value P[X >= k], X ~ Bin(n, p) —
    the float-returning scipy.stats.binom_test semantics the
    reference PathArimaDetector compares against alpha_bt
    (PathArimaDetector.py:26-32,351-354). Exact summation in log
    space (n is num_periods_tsa_ini·period — small)."""
    k = int(k)
    n = int(n)
    if k <= 0:
        return 1.0
    if k > n:
        return 0.0
    logs = []
    lp, lq = math.log(p), math.log1p(-p)
    for i in range(k, n + 1):
        logs.append(
            math.lgamma(n + 1) - math.lgamma(i + 1) - math.lgamma(n - i + 1)
            + i * lp + (n - i) * lq
        )
    m = max(logs)
    return float(min(1.0, math.exp(m) * sum(math.exp(x - m) for x in logs)))


def path_period_length(data) -> int | None:
    """PathArimaDetector.calculate_period_length per-path core
    (reference PathArimaDetector.py:186-211): |ACF| over all lags
    (RAW — unlike TSAArima there is NO Savitzky-Golay smoothing),
    first local minimum with the 3-wide window test
    ``corr[i] == min(corr[i-1:i+2])``, then the highest later peak;
    None when no local minimum exists (TSA disabled for the path)."""
    corr = np.abs(acf_biased(data, len(data)))
    min_lag = -1
    for i in range(1, len(corr) - 1):
        if corr[i] == min(corr[i - 1: i + 2]):
            min_lag = i
            break
    if min_lag == -1:
        return None
    return int(np.argmax(corr[min_lag:]) + min_lag)


class PathArimaReplay:
    """Exact replay of the reference PathArimaDetector per-path
    lifecycle (reference aminer/analysis/PathArimaDetector.py:144-377)
    for ONE (event type, target path) series of float values, kept
    verbatim including its quirks:

    - after ``num_init`` values the period comes from the RAW |ACF|
      first-local-min → argmax rule (``path_period_length``); a
      ``None`` period disables the path forever;
    - while learning, every value appends a (0, value, 0)
      prediction-history row; the AR(period) model fits on the last
      ``num_periods_tsa_ini·period`` values once enough accumulated
      (fit failure leaves the model unfitted — it retries next step);
    - active steps forecast one step with conf_int(alpha); when the
      prediction history exceeds ``num_max_time_history`` it truncates
      to ``num_min_time_history`` and the step SKIPS the
      bounds test entirely (the reference's if/else at :316-338 —
      no result-list entry either), but the discard check and model
      append still run;
    - anomaly confidence = (lower−count)/(upper−count) below, resp.
      (count−upper)/(count−lower) above;
    - the result list truncates at 2·max(num_results_bt,
      num_periods_tsa_ini·period) to the last max(...) entries;
    - discard (learn_mode) when successes in the last
      ``num_results_bt`` — counting MISSING entries as successes —
      fall below the binomial minimum, OR the one-sided binomial test
      of the last ``num_periods_tsa_ini·period`` successes against
      p = 1−alpha has p-value < alpha_bt (the reference quirk that
      discards even long-healthy models: P[X ≥ n] = (1−alpha)ⁿ is
      tiny for large n). Discard resets the result list to EMPTY
      (TSAArima pads differently) and drops the model; otherwise the
      model appends the new value.

    Replay assumption (documented): the backing EventTypeDetector
    never truncates its value list (min_num_vals/max_num_vals large
    enough), matching the constructor's own guard rails."""

    def __init__(self, num_init: int = 50, force_period_length: bool = False,
                 set_period_length: int = 10, alpha: float = 0.05,
                 alpha_bt: float = 0.05, num_results_bt: int = 15,
                 num_min_time_history: int = 20,
                 num_max_time_history: int = 30,
                 num_periods_tsa_ini: int = 20, learn_mode: bool = True):
        self.num_init = num_init
        self.force_period_length = force_period_length
        self.set_period_length = set_period_length
        self.alpha = alpha
        self.alpha_bt = alpha_bt
        self.num_results_bt = num_results_bt
        self.num_min_time_history = num_min_time_history
        self.num_max_time_history = num_max_time_history
        self.num_periods_tsa_ini = num_periods_tsa_ini
        self.learn_mode = learn_mode
        self.bt_min_suc = bt_min_successes(num_results_bt, alpha, alpha_bt)
        self.values: list[float] = []
        self.period: int | None = None
        self.period_computed = False
        self.model: CssAr | None = None
        self.result_list: list[int] = []
        self.pred_history: tuple[list, list, list] = ([], [], [])

    def _idle(self, phase: str) -> dict:
        return {"phase": phase, "anomaly": False, "discarded": False,
                "lower": None, "upper": None, "confidence": None,
                "period": self.period}

    def step(self, value: float) -> dict:
        self.values.append(float(value))
        if not self.period_computed:
            if len(self.values) < self.num_init:
                return self._idle("collecting")
            self.period = (
                self.set_period_length if self.force_period_length
                else path_period_length(self.values)
            )
            self.period_computed = True
        if self.period is None:
            return self._idle("disabled")
        return self._test_num_appearance()

    def _test_num_appearance(self) -> dict:
        if self.learn_mode and self.model is None:
            self.pred_history[0].append(0)
            self.pred_history[1].append(self.values[-1])
            self.pred_history[2].append(0)
            if len(self.values) >= self.num_periods_tsa_ini * self.period:
                try:
                    self.model = CssAr(
                        self.values[-self.num_periods_tsa_ini * self.period:],
                        self.period,
                    )
                except (ValueError, np.linalg.LinAlgError):
                    self.model = None
                if self.model is not None:
                    return self._idle("initialized")
            return self._idle("learning")
        if self.model is None:
            return self._idle("idle")
        count = self.values[-1]
        lower, upper = self.model.get_forecast(1).conf_int(alpha=self.alpha)[0]
        self.pred_history[0].append(lower)
        self.pred_history[1].append(count)
        self.pred_history[2].append(upper)
        anomaly = False
        confidence = None
        if len(self.pred_history[0]) > self.num_max_time_history:
            for h in self.pred_history:
                h[:] = h[-self.num_min_time_history:]
            # reference :316-324 — truncation step: NO bounds test,
            # NO result-list entry
        else:
            if count < lower or count > upper:
                anomaly = True
                if count < lower:
                    confidence = (lower - count) / (upper - count)
                else:
                    confidence = (count - upper) / (count - lower)
                self.result_list.append(0)
            else:
                self.result_list.append(1)
            cap = 2 * max(self.num_results_bt,
                          self.num_periods_tsa_ini * self.period)
            if len(self.result_list) >= cap:
                self.result_list = self.result_list[-cap // 2:]
        discarded = False
        if self.learn_mode and (
            sum(self.result_list[-self.num_results_bt:])
            + max(0, self.num_results_bt - len(self.result_list))
            < self.bt_min_suc
            or binom_test_greater(
                sum(self.result_list[
                    -self.num_periods_tsa_ini * self.period:]),
                self.num_periods_tsa_ini * self.period, 1 - self.alpha,
            ) < self.alpha_bt
        ):
            self.model = None
            self.result_list = []
            discarded = True
        else:
            self.model = self.model.append([count])
        return {"phase": "active", "anomaly": anomaly,
                "discarded": discarded, "lower": float(lower),
                "upper": float(upper), "confidence": confidence,
                "period": self.period}


def tsa_time_steps(
    counts: list[list[float]],
    waiting_time: float = 1000.0,
    num_sections_waiting_time: int = 100,
    num_division_time_step: int = 10,
    acf_pause_interval_percentage: float = 0.2,
    acf_auto_pause_interval: bool = True,
    acf_auto_pause_interval_num_min: int = 10,
    acf_threshold: float = 0.2,
    round_time_interval_threshold: float = 0.02,
    min_log_lines_per_time_step: float = 10,
    assumed_time_steps: tuple = (60, 3600, 43200, 86400, 604800),
) -> list[float]:
    """Period detection (reference calculate_time_steps:295-360):
    |ACF| → polyorder-1 Savitzky-Golay smooth → optional automatic
    pause interval at the first local minimum → highest peak above
    acf_threshold → snap to assumed human periods → minimum-traffic
    gate. Returns seconds per division step, -1 where no TSA."""
    out = []
    min_lag = max(int(acf_pause_interval_percentage
                      * num_sections_waiting_time), 1)
    for data in counts:
        corr = np.abs(acf_biased(data, len(data)))
        wlen = min(max(3, int(len(corr) / 100)
                       - int(int(len(corr) / 100) % 2 == 0)), 101)
        corrfit = savgol1(corr, wlen)
        lag = min_lag
        if acf_auto_pause_interval:
            m = acf_auto_pause_interval_num_min
            for i in range(m, len(corrfit) - m):
                if corrfit[i] == min(corrfit[i - m: i + m + 1]):
                    lag = i
                    break
        peak = int(np.argmax(corrfit[lag:]))
        if corrfit[lag + peak] > acf_threshold:
            out.append((peak + lag) / num_division_time_step
                       * waiting_time / num_sections_waiting_time)
        else:
            out.append(-1)
    for idx, step in enumerate(out):
        if step != -1:
            for assumed in assumed_time_steps:
                if (abs(assumed - step * num_division_time_step) / assumed
                        < round_time_interval_threshold):
                    out[idx] = assumed / num_division_time_step
                    break
    for idx, step in enumerate(out):
        if step != -1 and (sum(counts[idx]) / len(counts[idx]) * step
                           / waiting_time * num_sections_waiting_time
                           < min_log_lines_per_time_step):
            out[idx] = -1
    return out

"""Time-series style checks: mean-shift between windows, AR
forecast bands, PCA reconstruction scores, time-of-period
proximity.

Clean-room recasts:
- ``mean_shift_violations`` — MatchValueAverageChangeDetector
  (reference: aminer/analysis/MatchValueAverageChangeDetector.py:
  25-245): per key, compare each window's mean against the previous
  window (two-bin (n, sum, sum²) z-style test with ``avg_factor``).
- ``ar_forecast_outliers`` — TSAArimaDetector / PathArimaDetector
  (reference: aminer/analysis/TSAArimaDetector.py:32-560): no
  statsmodels in this environment, so a least-squares AR(p) model
  per key forecasts the next count; observations outside the
  residual-std band are anomalies. Same role (count forecasting),
  simpler model — documented deviation.
- ``pca_outlier_windows`` — PCADetector (reference:
  aminer/analysis/PCADetector.py:31-384): window × event-type count
  matrix, numpy eigendecomposition, anomaly score = reconstruction
  error outside the top-k eigenspace.
- ``time_of_period_outliers`` — PathValueTimeIntervalDetector
  (reference: aminer/analysis/PathValueTimeIntervalDetector.py:
  26-412): values must reappear near their learned times-of-period
  (± max_time_diff, circular distance).

All heavy input passes are pre-aggregated groupbys; model math runs
on the SMALL aggregate tables (driver or map_groups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.windows import window_id as _wid


def _window_stats(
    ds: "ray.data.Dataset", key_cols, value_col, ts_col, window_seconds
) -> "ray.data.Dataset":
    """(key..., window, n, sum, sum2) via pre-aggregated groupby —
    the mergeable two-bin state of the reference."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = _wid(batch[ts_col], window_seconds)
        v = batch[value_col]
        v2 = pc.multiply(v, v)
        t = (
            batch.select(key_cols)
            .append_column("window", w)
            .append_column("__v", v)
            .append_column("__v2", v2)
        )
        g = t.group_by(key_cols + ["window"]).aggregate(
            [("__v", "sum"), ("__v2", "sum"), ([], "count_all")]
        )
        return g.rename_columns(key_cols + ["window", "__s", "__s2", "__pn"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return partials.groupby(key_cols + ["window"]).aggregate(
        Sum("__s", alias_name="sum"),
        Sum("__s2", alias_name="sum2"),
        Sum("__pn", alias_name="n"),
    )


def mean_shift_violations(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    value_col: str,
    ts_col: str,
    window_seconds: int = 3600,
    avg_factor: float = 3.0,
    min_n: int = 10,
) -> "ray.data.Dataset":
    """Windows whose mean deviates from the previous window's mean
    by more than ``avg_factor`` × pooled std-error."""
    stats = _window_stats(ds, key_cols, value_col, ts_col, window_seconds)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("window", kind="mergesort")
        n = g["n"].to_numpy(np.float64)
        s = g["sum"].to_numpy(np.float64)
        s2 = g["sum2"].to_numpy(np.float64)
        mean = s / n
        var = np.maximum(s2 / n - mean**2, 0.0)
        prev_mean, prev_var, prev_n = mean[:-1], var[:-1], n[:-1]
        cur_mean, cur_var, cur_n = mean[1:], var[1:], n[1:]
        se = np.sqrt(prev_var / np.maximum(prev_n, 1) + cur_var / np.maximum(cur_n, 1))
        ok_n = (prev_n >= min_n) & (cur_n >= min_n)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(se > 0, np.abs(cur_mean - prev_mean) / se, 0.0)
        bad = ok_n & (z > avg_factor)
        idx = np.flatnonzero(bad) + 1
        out = g.iloc[idx][key_cols + ["window"]].copy()
        out["mean"] = cur_mean[idx - 1]
        out["prev_mean"] = prev_mean[idx - 1]
        out["z"] = z[idx - 1]
        return out

    return stats.groupby(key_cols).map_groups(per_key, batch_format="pandas")


def ar_forecast_outliers(
    counts: pd.DataFrame,
    key_cols: list[str],
    p: int = 3,
    band_factor: float = 3.0,
    count_name: str = "n",
    window_name: str = "window",
) -> pd.DataFrame:
    """Least-squares AR(p) per key over its zero-filled window count
    series; windows outside prediction ± band_factor·residual-std.
    Input is the SMALL (key, window, n) table."""
    out = []
    for key, g in counts.groupby(key_cols):
        g = g.sort_values(window_name)
        wmin, wmax = int(g[window_name].min()), int(g[window_name].max())
        full = np.arange(wmin, wmax + 1)
        y = np.zeros(len(full))
        y[(g[window_name].to_numpy() - wmin).astype(int)] = g[count_name].to_numpy()
        if len(y) <= p + 2:
            continue
        X = np.stack([y[i : len(y) - p + i] for i in range(p)], axis=1)
        X = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        t = y[p:]
        coef, *_ = np.linalg.lstsq(X, t, rcond=None)
        pred = X @ coef
        resid_std = float(np.std(t - pred))
        bad = np.abs(t - pred) > band_factor * max(resid_std, 1e-9)
        for j in np.flatnonzero(bad):
            rec = dict(zip(key_cols, key if isinstance(key, tuple) else (key,)))
            rec[window_name] = int(full[p + j])
            rec[count_name] = float(t[j])
            rec["pred"] = float(pred[j])
            rec["band"] = band_factor * resid_std
            out.append(rec)
    return pd.DataFrame(out, columns=key_cols + [window_name, count_name, "pred", "band"])


def ar1_outliers(
    counts: pd.DataFrame,
    key_cols: list[str],
    band_factor: float = 3.0,
    count_name: str = "n",
    window_name: str = "window",
) -> pd.DataFrame:
    """AR(1) via closed-form OLS (slope = cov_pop/var_pop, intercept
    = ȳ − slope·x̄) over the zero-filled per-key window series —
    numerically identical to SQL ``regr_slope``/``regr_intercept``
    over (lag(n), n) pairs, so the result is oracle-recomputable
    exactly (unlike the general least-squares AR(p) path). Windows
    with |resid| > band·stddev_pop(resid) are outliers."""
    out = []
    for key, g in counts.groupby(key_cols):
        g = g.sort_values(window_name)
        wmin, wmax = int(g[window_name].min()), int(g[window_name].max())
        full = np.arange(wmin, wmax + 1)
        y = np.zeros(len(full))
        y[(g[window_name].to_numpy() - wmin).astype(int)] = g[count_name].to_numpy()
        if len(y) < 2:
            continue
        x, t = y[:-1], y[1:]
        xm, tm = x.mean(), t.mean()
        vx = ((x - xm) ** 2).mean()
        if vx == 0:
            continue
        slope = ((x - xm) * (t - tm)).mean() / vx
        a = tm - slope * xm
        pred = slope * x + a
        resid = t - pred
        sd = float(np.std(resid))
        bad = np.abs(resid) > band_factor * max(sd, 1e-9)
        for j in np.flatnonzero(bad):
            rec = dict(zip(key_cols, key if isinstance(key, tuple) else (key,)))
            rec[window_name] = int(full[1 + j])
            rec[count_name] = int(t[j])
            out.append(rec)
    return pd.DataFrame(out, columns=key_cols + [window_name, count_name])


def acf(series: np.ndarray, max_lag: int) -> np.ndarray:
    """Normalized autocorrelation function up to ``max_lag`` (biased
    estimator, mean-centered) — the ACF the reference's TSA stage
    derives its seasonal period from (TSAArimaDetector.py:32-560 via
    statsmodels; hand-rolled numpy here, no statsmodels)."""
    y = np.asarray(series, dtype=np.float64)
    y = y - y.mean()
    n = len(y)
    denom = float((y * y).sum())
    if denom == 0 or n < 2:
        return np.zeros(max_lag + 1)
    out = np.empty(min(max_lag, n - 1) + 1)
    for k in range(len(out)):
        out[k] = float((y[: n - k] * y[k:]).sum()) / denom
    return out


def auto_period(series: np.ndarray, max_lag: int | None = None, min_corr: float = 0.3) -> int | None:
    """Dominant seasonal period: the lag ≥ 2 with the highest ACF
    LOCAL PEAK above ``min_corr`` (a peak requirement rejects slow
    trend decay masquerading as seasonality). None when aperiodic."""
    n = len(series)
    if n < 8:
        return None
    max_lag = max_lag or n // 2
    a = acf(series, max_lag)
    if len(a) < 4:
        return None
    best, best_corr = None, min_corr
    for k in range(2, len(a) - 1):
        if a[k] > a[k - 1] and a[k] >= a[k + 1] and a[k] > best_corr:
            best, best_corr = k, a[k]
    return best


def seasonal_ar_outliers(
    counts: pd.DataFrame,
    key_cols: list[str],
    band_factor: float = 3.0,
    period: int | None = None,
    count_name: str = "n",
    window_name: str = "window",
) -> pd.DataFrame:
    """Seasonal count forecasting (TSAArimaDetector recast, upgraded
    from plain AR(p)): per key, the period is auto-detected from the
    ACF (or given), the series is SEASONALLY DIFFERENCED
    (d_t = y_t − y_{t−P}) and an AR(1) prediction interval
    ±band·resid_std flags outliers on the differenced scale —
    equivalent to a (1,0,0)×(0,1,0)_P model, the documented
    statsmodels-free stand-in for the reference's auto-fit ARIMA.
    Keys with no detected period fall back to plain AR(1)
    (``ar1_outliers`` semantics). Input is the small (key, window, n)
    table; output includes the period used."""
    out = []
    for key, g in counts.groupby(key_cols):
        g = g.sort_values(window_name)
        wmin, wmax = int(g[window_name].min()), int(g[window_name].max())
        full = np.arange(wmin, wmax + 1)
        y = np.zeros(len(full))
        y[(g[window_name].to_numpy() - wmin).astype(int)] = g[count_name].to_numpy()
        p = period if period is not None else auto_period(y)
        if p is None or len(y) < p + 4:
            sub = ar1_outliers(
                g, key_cols, band_factor=band_factor,
                count_name=count_name, window_name=window_name,
            )
            for _, r in sub.iterrows():
                rec = dict(zip(key_cols, key if isinstance(key, tuple) else (key,)))
                rec[window_name] = int(r[window_name])
                rec[count_name] = int(r[count_name])
                rec["period"] = 0
                out.append(rec)
            continue
        d = y[p:] - y[:-p]
        if len(d) < 3:
            continue
        x, t = d[:-1], d[1:]
        vx = ((x - x.mean()) ** 2).mean()
        if vx == 0:
            pred = np.full_like(t, t.mean())
        else:
            slope = ((x - x.mean()) * (t - t.mean())).mean() / vx
            a = t.mean() - slope * x.mean()
            pred = slope * x + a
        resid = t - pred
        sd = float(np.std(resid))
        bad = np.abs(resid) > band_factor * max(sd, 1e-9)
        for j in np.flatnonzero(bad):
            rec = dict(zip(key_cols, key if isinstance(key, tuple) else (key,)))
            rec[window_name] = int(full[p + 1 + j])
            rec[count_name] = int(y[p + 1 + j])
            rec["period"] = int(p)
            out.append(rec)
    return pd.DataFrame(out, columns=key_cols + [window_name, count_name, "period"])


def pca_outlier_windows(
    ds: "ray.data.Dataset",
    event_col: str,
    ts_col: str,
    window_seconds: int = 600,
    n_components: int = 2,
    min_anomaly_score: float = 0.3,
) -> pd.DataFrame:
    """Window count vectors across event types → PCA reconstruction
    error (fraction of squared norm outside the top-k eigenspace) —
    windows scoring above ``min_anomaly_score`` are anomalies."""

    def partial(batch: pa.Table) -> pa.Table:
        w = _wid(batch[ts_col], window_seconds)
        t = pa.table({"window": w, event_col: batch[event_col]})
        g = t.group_by(["window", event_col]).aggregate([([], "count_all")])
        return g.rename_columns(["window", event_col, "__pn"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["window", event_col])
        .aggregate(Sum("__pn", alias_name="n"))
        .to_pandas()
    )
    pivot = counts.pivot_table(index="window", columns=event_col, values="n", fill_value=0)
    X = pivot.to_numpy(dtype=np.float64)
    # non-centered PCA over the raw count vectors (reference builds
    # the eigenspace from the raw event-count matrix,
    # PCADetector.py:79-153); the anomaly score is the squared-norm
    # fraction OUTSIDE the top-k eigenspace
    cov = X.T @ X / max(len(X), 1)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, np.argsort(vals)[::-1][:n_components]]
    proj = X @ top @ top.T
    err = ((X - proj) ** 2).sum(axis=1)
    norm = (X**2).sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        score = np.where(norm > 0, err / norm, 0.0)
    return pd.DataFrame(
        {
            "window": pivot.index.to_numpy(),
            "score": score,
            "anomaly": score > min_anomaly_score,
        }
    )


def time_of_period_outliers(
    ds: "ray.data.Dataset",
    value_cols: list[str],
    ts_col: str,
    period_seconds: int = 86400,
    max_time_diff: float = 3600.0,
    min_occurrences: int = 3,
) -> "ray.data.Dataset":
    """Occurrences whose time-of-period is farther than
    ``max_time_diff`` (circular) from EVERY other learned occurrence
    time of the same value."""

    def per_value(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        tod = (tsi // 1_000_000) % period_seconds
        if len(tod) < min_occurrences:
            return g.iloc[0:0][value_cols + [ts_col]]
        # exact circular NN distance to any OTHER occurrence, by row
        # identity: a duplicate time-of-period means distance 0; a
        # unique one takes the min gap to its circular neighbors
        # among the UNIQUE sorted tods (the circular NN is always an
        # adjacent unique value; any longer walk passes one).
        u, inv, cnt = np.unique(tod, return_inverse=True, return_counts=True)
        if len(u) == 1:
            nn_u = np.zeros(1)
        else:
            d_next = np.empty(len(u), dtype=np.float64)
            d_next[:-1] = u[1:] - u[:-1]
            d_next[-1] = (u[0] + period_seconds) - u[-1]
            nn_u = np.minimum(d_next, np.roll(d_next, 1))
        nearest_other = np.where(cnt[inv] >= 2, 0.0, nn_u[inv])
        bad = nearest_other > max_time_diff
        out = g.iloc[np.flatnonzero(bad)][value_cols + [ts_col]].copy()
        return out

    return ds.groupby(value_cols).map_groups(per_value, batch_format="pandas")


def pca_detector_exact(
    ds: "ray.data.Dataset",
    event_col: str,
    ts_col: str,
    window_seconds: float = 600.0,
    num_windows: int = 50,
    min_anomaly_score: float = 0.3,
    min_variance: float = 0.98,
    learn_mode: bool = True,
    max_replay_rows: int = 2_000_000,
) -> pd.DataFrame:
    """EXACT PCADetector replay (reference:
    aminer/analysis/PCADetector.py:95-290), including its quirks:

    - windows anchored at the stream's first timestamp; EVERY elapsed
      window (including empty ones — the reset vector keeps its keys
      with zero counts) is scored then learned; the trailing window
      never fires;
    - scoring requires ≥3 matrix vectors whose dicts all hold ≥2
      keys (keys accumulate: once seen, a value stays with count 0);
      learning recomputes PCA under the same `>1` condition after
      repair_dict back-fills missing keys;
    - normalization is by the SCALAR mean/std of the whole learned
      matrix; covariance via np.cov(·.T) (ddof=1); components from
      eigh ASCENDING order, n_comp = first index where cumulative
      DESCENDING explained variance > min_variance — and the
      reconstruction uses eigen_vectors[:n_comp, :] exactly as the
      reference writes it (row slice, not the transposed column
      slice);
    - the reconstruction error is min-max scaled by the training
      loss vector.

    Distributed part: ONE pre-aggregated (window, value) count
    shuffle; the replay loop runs over the tiny window×value matrix
    on the driver (sequential model evolution is inherent to the
    semantics). Driver-bound tier bound: the replay table (windows ×
    distinct values rows) caps at ``max_replay_rows`` (raises with
    the scale path named) — at corpus scale use
    ``pca_outlier_windows`` (simplified, fully distributed). Returns
    scored windows: (window, score, anomaly)."""
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            tsf = pc.cast(pc.cast(ts, pa.int64()), pa.float64())
            tsf = pc.divide(tsf, 1e6)
        else:
            tsf = pc.cast(ts, pa.float64())
        return pa.table({"__tsf": tsf, "ev": pc.cast(t[event_col], pa.string())})

    flat = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True).materialize()
    t0 = flat.min("__tsf")
    if t0 is None:
        return pd.DataFrame({"window": pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64),
                             "anomaly": pd.Series(dtype=bool)})

    def add_win(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = pc.cast(pc.floor(pc.divide(pc.subtract(t["__tsf"], t0), float(window_seconds))), pa.int64())
        return pa.table({"window": w, "ev": t["ev"], "__pn": pa.array(np.ones(len(t), np.int64))})

    from ._agg import bounded_collect

    wc = bounded_collect(
        flat.map_batches(add_win, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["window", "ev"])
        .aggregate(_Sum("__pn", alias_name="n")),
        max_replay_rows, "pca_detector_exact",
        "pca_outlier_windows (simplified, fully distributed)",
    )
    if len(wc) == 0:
        return pd.DataFrame({"window": pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64),
                             "anomaly": pd.Series(dtype=bool)})
    last_win = int(wc["window"].max())
    by_win: dict[int, dict] = {}
    for _, r in wc.sort_values(["window", "ev"]).iterrows():
        by_win.setdefault(int(r["window"]), {})[r["ev"]] = int(r["n"])

    # sequential replay (driver): the model is inherently online
    ecv: dict = {}
    matrix: list[dict] = []
    state = {"ecm": None, "eig": None, "n_comp": None, "loss": None}

    def compute_pca():
        feats = list(matrix[0].keys())
        m = np.array([[w.get(f, 0) for f in feats] for w in matrix], dtype=np.float64)
        norm = (m - m.mean()) / m.std()
        cov = np.cov(norm.T)
        ev, evec = np.linalg.eigh(cov)
        state["ecm"], state["eig"] = m, evec
        var_exp = [(i / ev.sum()) * 100 for i in ev[::-1]]
        cum = np.cumsum(var_exp)
        state["n_comp"] = next((n for n, c in enumerate(cum) if c > min_variance * 100), None)
        pca = norm @ evec
        inv = pca[:, : state["n_comp"]] @ evec[: state["n_comp"], :]
        state["loss"] = np.sum((norm - inv) ** 2, axis=1)

    def score_now(vec: dict) -> float:
        feats = list(matrix[0].keys())
        v = np.array([vec.get(f, 0) for f in feats], dtype=np.float64)
        norm = ((v - state["ecm"].mean()) / state["ecm"].std()).reshape(1, -1)
        pca = norm @ state["eig"]
        inv = pca[:, : state["n_comp"]] @ state["eig"][: state["n_comp"], :]
        loss = float(np.sum((norm - inv) ** 2, axis=1)[0])
        lo, hi = float(np.min(state["loss"])), float(np.max(state["loss"]))
        return (loss - lo) / (hi - lo)

    out = []
    for win in range(0, last_win):  # trailing window never fires
        for ev, c in by_win.get(win, {}).items():
            ecv[ev] = ecv.get(ev, 0) + c  # keys persist; counts reset below
        if len(matrix) >= 3 and all(len(x) >= 2 for x in matrix) and state["eig"] is not None:
            s = score_now(ecv)
            out.append((win, s, s > min_anomaly_score))
        if learn_mode:
            if len(matrix) >= num_windows:
                del matrix[0]
            matrix.append(dict(ecv))
            if len(matrix) >= 3 and all(len(x) > 1 for x in matrix):
                # repair_dict: back-fill current keys into old vectors
                for old in matrix:
                    for k in ecv:
                        old.setdefault(k, 0)
                compute_pca()
        for k in ecv:
            ecv[k] = 0
    return pd.DataFrame(out, columns=["window", "score", "anomaly"]).astype(
        {"window": np.int64, "score": np.float64, "anomaly": bool}
    )


def path_arima_exact(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    value_col: str,
    order_col: str,
    n_buckets: int = 64,
    max_result_rows: int = 2_000_000,
    **replay_kwargs,
) -> pd.DataFrame:
    """EXACT PathArimaDetector lifecycle per key path (reference:
    aminer/analysis/PathArimaDetector.py:144-377), recast over the
    dataset: each key group's order-sorted float values run through
    :class:`stages.tsa.PathArimaReplay` (RAW-|ACF| period detection,
    AR(period) one-step bands, history-truncation skip steps,
    binomial discard — parity-tested against the reference class in
    tests/test_reference_parity.py). One coarse-bucketed shuffle;
    per-key work is the sequential replay (inherent to the
    semantics). Driver-bound tier bound: the anomaly-row result caps
    at ``max_result_rows`` (raises with the scale path named) — at
    corpus scale use ``seasonal_ar_outliers`` (band recast, fully
    distributed). Returns one row per anomalous step:
    (key..., step, value, lower, upper, confidence, period)."""
    from ._agg import bounded_collect, coarse_grouped
    from .tsa import PathArimaReplay

    out_cols = key_cols + ["step", "value", "lower", "upper",
                           "confidence", "period"]

    def per_key(g: pd.DataFrame, out: list) -> None:
        g = g.sort_values(order_col, kind="mergesort")
        key = tuple(g[c].iloc[0] for c in key_cols)
        replay = PathArimaReplay(**replay_kwargs)
        for step, v in enumerate(g[value_col].to_numpy(np.float64)):
            verdict = replay.step(float(v))
            if verdict["anomaly"]:
                out.append(key + (step, float(v), verdict["lower"],
                                  verdict["upper"], verdict["confidence"],
                                  verdict["period"]))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows: list = []
        for _, sub in g.groupby(key_cols, sort=False):
            per_key(sub, rows)
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        return pd.DataFrame(rows, columns=out_cols)

    res = bounded_collect(
        coarse_grouped(ds, key_cols, per_bucket, n_buckets=n_buckets),
        max_result_rows, "path_arima_exact",
        "seasonal_ar_outliers (band recast, fully distributed)",
    )
    if len(res) == 0:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
    return res.sort_values(key_cols + ["step"]).reset_index(drop=True)


def average_change_exact(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    value_col: str,
    order_col: str,
    min_bin_elements: int,
    avg_factor: float = 1.0,
    var_factor: float = 2.0,
    learn_mode: bool = True,
    n_buckets: int = 64,
    max_result_rows: int = 2_000_000,
) -> pd.DataFrame:
    """EXACT MatchValueAverageChangeDetector replay (reference:
    aminer/analysis/MatchValueAverageChangeDetector.py:184-244,
    timestamp_path=None count-based bins): values are accumulated as
    DELTAS against the key's first value (the reference's k-value
    numerical-stability trick), cut into bins of exactly
    ``min_bin_elements``; the first full bin seeds the old-bin
    statistics, and each later full bin flags when

        cur_var > var_factor·old_var  OR
        |cur_avg − old_avg| > avg_factor·old_var

    (the avg deviation is compared against the VARIANCE — a
    reference quirk kept verbatim); sample variance uses n−1;
    ``learn_mode`` merges each analyzed bin into the old-bin totals.
    The trailing partial bin never fires. One coarse-bucketed
    shuffle; per-key work is a loop over bins (small). Driver-bound
    tier bound: the per-bin result gathers to the driver, capped at
    ``max_result_rows`` (raises with the scale path named) — at
    corpus scale use ``mean_shift_violations`` (band recast, fully
    distributed). Returns one row per analyzed bin ≥ 2: (key...,
    bin, new_avg, new_var, old_avg, old_var, flagged)."""
    from ._agg import coarse_grouped

    out_cols = key_cols + ["bin", "new_avg", "new_var", "old_avg", "old_var", "flagged"]

    def per_key(g: pd.DataFrame, out: list) -> None:
        # the detector is stream-ordered; the shuffle scrambles rows,
        # so the caller must provide the global order column
        g = g.sort_values(order_col, kind="mergesort")
        vals = g[value_col].to_numpy(np.float64)
        if len(vals) < 2 * min_bin_elements:
            return
        key = tuple(g[c].iloc[0] for c in key_cols)
        k = vals[0]
        deltas = vals - k
        deltas[0] = 0.0
        n_bins = len(vals) // min_bin_elements
        old = None
        for b in range(n_bins):
            seg = deltas[b * min_bin_elements : (b + 1) * min_bin_elements]
            n = len(seg)
            s = float(seg.sum())
            s2 = float((seg * seg).sum())
            avg = s / n
            var = (s2 - s * s / n) / (n - 1)
            if old is None:
                old = [n, s, s2, avg, var]
                continue
            flagged = (var > var_factor * old[4]) or (abs(avg - old[3]) > avg_factor * old[4])
            out.append(key + (b, avg + k, var, old[3] + k, old[4], bool(flagged)))
            if learn_mode:
                tn, ts_, ts2 = old[0] + n, old[1] + s, old[2] + s2
                old = [tn, ts_, ts2, ts_ / tn, (ts2 - ts_ * ts_ / tn) / (tn - 1)]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows: list = []
        for _, sub in g.groupby(key_cols, sort=False):
            per_key(sub, rows)
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        return pd.DataFrame(rows, columns=out_cols)

    from ._agg import bounded_collect

    res = bounded_collect(
        coarse_grouped(ds, key_cols, per_bucket, n_buckets=n_buckets),
        max_result_rows, "average_change_exact",
        "mean_shift_violations (band recast, fully distributed)",
    )
    if len(res) == 0:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
    return res.sort_values(key_cols + ["bin"]).reset_index(drop=True)

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

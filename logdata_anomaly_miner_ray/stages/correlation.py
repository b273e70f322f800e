"""Cross-event correlation checks: A→B interval joins, implication
rules, cross-column contingency tests, count-vector clustering.

Clean-room recasts:
- ``interval_join_violations`` — TimeCorrelationViolationDetector
  (reference: aminer/analysis/TimeCorrelationViolationDetector.py:
  150-363): every A event must be followed by a matching B within
  [min_delta, max_delta]; batch recast = per-key sort + vectorized
  searchsorted of B timestamps around each A (an as-of/interval
  join within key groups — SURVEY.md §2.5).
- ``implication_support`` — EventCorrelationDetector's A⇒B rules
  (reference: aminer/analysis/EventCorrelationDetector.py:37-846):
  support/confidence of "B within Δt after A" per (A,B) event-type
  pair, testable against a binomial-style threshold.
- ``contingency_chi2`` — VariableCorrelationDetector (reference:
  aminer/analysis/VariableCorrelationDetector.py:15-1642):
  chi-square independence statistic over a two-column contingency
  table built with ONE pre-aggregated groupby.
- ``count_vector_outliers`` — EventCountClusterDetector (reference:
  aminer/analysis/EventCountClusterDetector.py:26-390): per
  (window, id) count vectors over event types, cosine-scored
  against the learned cluster vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def interval_join_violations(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    event_col: str,
    ts_col: str,
    a_event: str,
    b_event: str,
    min_delta: float,
    max_delta: float,
) -> "ray.data.Dataset":
    """A events with no B partner in (ts+min_delta, ts+max_delta]
    within the same key group. One groupby(key) shuffle; inside each
    group a vectorized double-searchsorted."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        ev = g[event_col].to_numpy()
        a_ts = tsi[ev == a_event]
        b_ts = tsi[ev == b_event]
        lo = np.searchsorted(b_ts, a_ts + int(min_delta * 1e6), side="left")
        hi = np.searchsorted(b_ts, a_ts + int(max_delta * 1e6), side="right")
        unmatched = lo >= hi
        rows = g[ev == a_event].iloc[np.flatnonzero(unmatched)][key_cols + [ts_col]].copy()
        rows["a_event"] = a_event
        rows["b_event"] = b_event
        return rows

    return ds.groupby(key_cols).map_groups(per_key, batch_format="pandas")


def implication_support(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    event_col: str,
    ts_col: str,
    max_delta: float,
) -> "ray.data.Dataset":
    """For every ordered event-type pair (A,B): how many A events
    were followed by a B within max_delta (n_hit) out of n_a — the
    support counts behind EventCorrelationDetector's binomial rule
    testing. Pre-aggregated per key group, merged in one small
    groupby."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        ev = g[event_col].to_numpy()
        types = np.unique(ev)
        rows = []
        d = int(max_delta * 1e6)
        for a in types:
            a_ts = tsi[ev == a]
            for b in types:
                b_ts = tsi[ev == b]
                lo = np.searchsorted(b_ts, a_ts, side="right")
                hi = np.searchsorted(b_ts, a_ts + d, side="right")
                rows.append((a, b, len(a_ts), int((hi > lo).sum())))
        return pd.DataFrame(rows, columns=["a_event", "b_event", "__na", "__nh"])

    partials = ds.groupby(key_cols).map_groups(per_key, batch_format="pandas")
    return partials.groupby(["a_event", "b_event"]).aggregate(
        Sum("__na", alias_name="n_a"), Sum("__nh", alias_name="n_hit")
    )


def implication_rules(
    support: pd.DataFrame,
    p0: float = 0.9,
    alpha: float = 0.05,
    min_support: int = 20,
) -> pd.DataFrame:
    """Accept A⇒B rules whose hit rate is credibly ≥ p0 — the
    binomial rule test of EventCorrelationDetector (reference:
    aminer/analysis/EventCorrelationDetector.py:126-175
    ``get_min_eval_true``: smallest k with
    P[Binom(n, p0) ≤ k] ≥ alpha). scipy-free exact binomial CDF via
    log-space summation. Input: the (a_event, b_event, n_a, n_hit)
    table from ``implication_support``."""

    def min_eval_true(n: int, p: float, a: float) -> int:
        # smallest k such that sum_{i<=k} C(n,i) p^i (1-p)^(n-i) >= a
        logp, log1p = np.log(p), np.log1p(-p)
        # iterative log-pmf to avoid overflow
        lp = n * log1p  # i = 0
        cdf = np.exp(lp)
        k = 0
        while cdf < a and k < n:
            k += 1
            lp += np.log((n - k + 1) / k) + logp - log1p
            cdf += np.exp(lp)
        return k

    rows = []
    for _, r in support.iterrows():
        n, hit = int(r["n_a"]), int(r["n_hit"])
        if n < min_support or r["a_event"] == r["b_event"]:
            continue
        thresh = min_eval_true(n, p0, alpha)
        if hit >= thresh:
            rows.append(
                (r["a_event"], r["b_event"], n, hit, hit / n, thresh)
            )
    return pd.DataFrame(
        rows, columns=["a_event", "b_event", "n_a", "n_hit", "confidence", "min_hits"]
    )


def contingency_chi2(
    ds: "ray.data.Dataset", col_a: str, col_b: str
) -> tuple[float, int, pd.DataFrame]:
    """Chi-square independence statistic of two categorical columns.
    Returns (chi2, dof, contingency df). The counts come from ONE
    pre-aggregated groupby; the statistic is computed driver-side on
    the small table (no scipy: statistic + dof only, compare to a
    critical value chosen by the caller)."""
    from ._agg import grouped_counts

    counts = grouped_counts(ds, [col_a, col_b]).to_pandas()
    pivot = counts.pivot_table(index=col_a, columns=col_b, values="n", fill_value=0)
    obs = pivot.to_numpy(dtype=np.float64)
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    exp = row @ col / obs.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        chi2 = float(np.nansum((obs - exp) ** 2 / np.where(exp > 0, exp, np.nan)))
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    return chi2, dof, counts


def count_vector_outliers(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    event_col: str,
    ts_col: str,
    window_seconds: int = 600,
    confidence_factor: float = 0.5,
) -> pd.DataFrame:
    """Per (id, window) event-type count vector, cosine-scored
    against the learned mean vector of its id; windows whose best
    similarity < confidence_factor are outliers. The count matrix
    comes from one pre-aggregated groupby; scoring is a small
    driver-side numpy pass (the learned model is tiny)."""
    from ..functions.windows import window_id as _wid

    def partial(batch: pa.Table) -> pa.Table:
        w = _wid(batch[ts_col], window_seconds)
        t = batch.select(id_cols + [event_col]).append_column("window", w)
        g = t.group_by(id_cols + ["window", event_col]).aggregate([([], "count_all")])
        return g.rename_columns(id_cols + ["window", event_col, "__pn"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(id_cols + ["window", event_col])
        .aggregate(Sum("__pn", alias_name="n"))
        .to_pandas()
    )
    pivot = counts.pivot_table(
        index=id_cols + ["window"], columns=event_col, values="n", fill_value=0
    )
    X = pivot.to_numpy(dtype=np.float64)
    ids = pivot.index.to_frame(index=False)
    out_rows = []
    for key, grp in ids.groupby(id_cols):
        rows = grp.index.to_numpy()
        V = X[rows]
        mean = V.mean(axis=0)
        mn = np.linalg.norm(mean)
        vn = np.linalg.norm(V, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            sim = np.where((vn > 0) & (mn > 0), V @ mean / (vn * mn), 1.0)
        for r, s in zip(rows, sim):
            if s < confidence_factor:
                rec = ids.iloc[r].to_dict()
                rec["similarity"] = float(s)
                out_rows.append(rec)
    return pd.DataFrame(out_rows, columns=id_cols + ["window", "similarity"])

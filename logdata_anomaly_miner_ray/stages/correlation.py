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


def generate_hypotheses(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    event_col: str,
    ts_col: str,
    max_delta: float = 5.0,
    candidates_size: int = 10,
    generation_probability: float = 1.0,
    generation_factor: float = 1.0,
    max_hypotheses: int = 1000,
    seed: int = 42,
) -> pd.DataFrame:
    """Randomized A⇒B hypothesis GENERATION — the sampled temporal
    self-join of EventCorrelationDetector (reference:
    aminer/analysis/EventCorrelationDetector.py:42-125): each event
    joins the candidate set with probability ``generation_factor``
    (bounded deque of ``candidates_size``), and each new event forms
    forward/back hypotheses with the candidates within ``max_delta``
    seconds with probability ``generation_probability``. Batch
    recast: per key group (sorted), a vectorized trailing-window
    pairing with a SEEDED rng (deterministic across runs/workers —
    the seed is mixed with the key hash so groups draw independent
    streams). Output: distinct (a_event, b_event, direction) rows
    capped at ``max_hypotheses``. Evaluation of the generated
    hypotheses is ``implication_support`` + ``implication_rules``."""

    _EMPTY = pd.DataFrame(
        {"a_event": pd.Series(dtype=object), "b_event": pd.Series(dtype=object),
         "direction": pd.Series(dtype=object)}
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        empty = _EMPTY
        if len(g) < 2:
            return empty
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        ev = g[event_col].to_numpy()
        import zlib

        key_str = "\x1f".join(str(g[c].iloc[0]) for c in key_cols)
        key_mix = zlib.crc32(key_str.encode())  # stable across processes
        rng = np.random.default_rng(seed ^ key_mix)
        is_candidate = rng.random(len(ev)) <= generation_factor
        d = int(max_delta * 1e6)
        lo = np.searchsorted(tsi, tsi - d, side="left")
        rows = []
        cand_queue: list[int] = []  # indices, bounded deque semantics
        for i in range(len(ev)):
            # pair the new event with live candidates in the window
            live = [j for j in cand_queue if j >= lo[i] and j < i]
            if live and rng.random() <= generation_probability:
                for j in live:
                    if ev[j] != ev[i]:
                        rows.append((ev[j], ev[i], "forward"))
                        rows.append((ev[i], ev[j], "back"))
            if is_candidate[i]:
                cand_queue.append(i)
                if len(cand_queue) > candidates_size:
                    cand_queue.pop(0)
        if not rows:
            return empty
        out = pd.DataFrame(rows, columns=["a_event", "b_event", "direction"])
        return out.drop_duplicates().reset_index(drop=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = [per_key(sub) for _, sub in g.groupby(key_cols, sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return _EMPTY
        return pd.concat(outs).drop_duplicates().reset_index(drop=True)

    from ._agg import coarse_grouped

    hyps = (
        coarse_grouped(ds, key_cols, per_bucket, n_buckets=64)
        .to_pandas()
        .drop_duplicates()
        .reset_index(drop=True)
    )
    return hyps.head(max_hypotheses)


def event_correlation_rules(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    event_col: str,
    ts_col: str,
    max_delta: float = 600.0,
    hypothesis_max_delta_time: float = 5.0,
    p0: float = 0.9,
    alpha: float = 0.05,
    min_support: int = 20,
    **gen_kwargs,
) -> pd.DataFrame:
    """Full EventCorrelationDetector lifecycle: GENERATE candidate
    implications from temporally-close samples (window
    ``hypothesis_max_delta_time``), EVALUATE their support over the
    whole data at ``max_delta`` (one pre-aggregated pass), ACCEPT by
    the binomial test — generation + get_min_eval_true evaluation
    (reference EventCorrelationDetector.py:42-175)."""
    hyps = generate_hypotheses(
        ds, key_cols, event_col, ts_col,
        max_delta=hypothesis_max_delta_time, **gen_kwargs,
    )
    support = implication_support(ds, key_cols, event_col, ts_col, max_delta).to_pandas()
    fwd = set(zip(hyps[hyps["direction"] == "forward"]["a_event"], hyps[hyps["direction"] == "forward"]["b_event"]))
    keep = support[[(a, b) in fwd for a, b in zip(support["a_event"], support["b_event"])]]
    return implication_rules(keep, p0=p0, alpha=alpha, min_support=min_support)


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

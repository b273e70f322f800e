"""Windowed event-frequency constraints (EventFrequencyDetector &
SlidingEventFrequencyDetector recast).

Reference semantics:
- tumbling counts per event key with anomaly band
  ``mean ± std/confidence_factor`` over the trailing windows, std
  population-style via np.std (reference:
  aminer/analysis/EventFrequencyDetector.py:361-400);
- skipped/empty windows count as zero and warn (reference:
  aminer/analysis/EventFrequencyDetector.py:190-200);
- sliding variant: count of events in a trailing time window above a
  fixed limit, with local-maximum suppression (reference:
  aminer/analysis/SlidingEventFrequencyDetector.py:22-271).

Batch recast: derive ``window = floor(ts_us / W·10^6)`` per batch,
pre-aggregate counts per (key, window) per block, one groupby
shuffle of the partials; the per-key band math then runs over the
SMALL counts table (``map_groups`` per key with zero-filled
windows). The sliding variant sorts within key groups only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.windows import window_id


def window_counts(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    ts_col: str,
    window_seconds: int = 600,
    count_name: str = "n",
    window_name: str = "window",
) -> "ray.data.Dataset":
    """Counts per (key, tumbling window) with per-block combining."""

    def partial(batch: pa.Table) -> pa.Table:
        w = window_id(batch[ts_col], window_seconds)
        t = batch.select(key_cols).append_column(window_name, w)
        t = t.group_by(key_cols + [window_name]).aggregate([([], "count_all")])
        return t.rename_columns(key_cols + [window_name, "__pn"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return partials.groupby(key_cols + [window_name]).aggregate(
        Sum("__pn", alias_name=count_name)
    )


def frequency_anomalies(
    counts: "ray.data.Dataset",
    key_cols: list[str],
    confidence_factor: float = 0.33,
    count_name: str = "n",
    window_name: str = "window",
) -> "ray.data.Dataset":
    """Windows whose count leaves the per-key band
    ``mean ± std/confidence_factor`` computed over ALL of that key's
    windows zero-filled between its first and last window
    (population std, matching np.std in the reference). Emits
    (key..., window, n, mean, std, lower, upper) rows for flagged
    windows, including zero-filled (empty/skipped) windows."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        wmin, wmax = int(g[window_name].min()), int(g[window_name].max())
        full = np.arange(wmin, wmax + 1, dtype=np.int64)
        cnt = np.zeros(len(full), dtype=np.float64)
        cnt[(g[window_name].to_numpy() - wmin).astype(np.int64)] = g[count_name].to_numpy()
        mean, std = float(cnt.mean()), float(cnt.std())
        lower = mean - std / confidence_factor
        upper = mean + std / confidence_factor
        bad = (cnt < lower) | (cnt > upper)
        if not bad.any():
            return pd.DataFrame(
                {c: pd.Series(dtype=g[c].dtype) for c in key_cols}
                | {window_name: pd.Series(dtype=np.int64),
                   count_name: pd.Series(dtype=np.int64),
                   "mean": pd.Series(dtype=np.float64),
                   "std": pd.Series(dtype=np.float64),
                   "lower": pd.Series(dtype=np.float64),
                   "upper": pd.Series(dtype=np.float64)}
            )
        idx = np.flatnonzero(bad)
        out = {c: [g[c].iloc[0]] * len(idx) for c in key_cols}
        out[window_name] = full[idx]
        out[count_name] = cnt[idx].astype(np.int64)
        out["mean"] = mean
        out["std"] = std
        out["lower"] = lower
        out["upper"] = upper
        return pd.DataFrame(out)

    return counts.groupby(key_cols).map_groups(per_key, batch_format="pandas")


def frequency_report(
    counts: "ray.data.Dataset",
    key_cols: list[str],
    confidence_factor: float = 0.33,
    count_name: str = "n",
    window_name: str = "window",
) -> "ray.data.Dataset":
    """One pass over the counts table producing BOTH the band
    anomalies and the empty windows, tagged by a ``kind`` column —
    two separate map_groups over the same shuffle would double the
    fixed stage cost for no reason."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        wmin, wmax = int(g[window_name].min()), int(g[window_name].max())
        full = np.arange(wmin, wmax + 1, dtype=np.int64)
        cnt = np.zeros(len(full), dtype=np.float64)
        cnt[(g[window_name].to_numpy() - wmin).astype(np.int64)] = g[count_name].to_numpy()
        mean, std = float(cnt.mean()), float(cnt.std())
        lower = mean - std / confidence_factor
        upper = mean + std / confidence_factor
        anom = (cnt < lower) | (cnt > upper)
        empty = cnt == 0
        idx = np.flatnonzero(anom | empty)
        kinds = np.where(anom[idx], "anomaly", "empty")
        # a zero-count window can be both; anomaly wins the tag,
        # the empty flag column keeps the information
        out = {c: [g[c].iloc[0]] * len(idx) for c in key_cols}
        out[window_name] = full[idx]
        out[count_name] = cnt[idx].astype(np.int64)
        out["kind"] = kinds
        out["is_empty"] = empty[idx]
        out["lower"] = lower
        out["upper"] = upper
        return pd.DataFrame(out)

    return counts.groupby(key_cols).map_groups(per_key, batch_format="pandas")


def frequency_anomalies_streaming(
    counts: pd.DataFrame,
    key_cols: list[str],
    num_windows: int = 50,
    confidence_factor: float = 0.33,
    count_name: str = "n",
    window_name: str = "window",
    season_windows: int | None = None,
) -> tuple[pd.DataFrame, int]:
    """EXACT streaming recast of the reference's window lifecycle
    (EventFrequencyDetector.py:183-260, 340-399) over the small
    (key, window, n) table:

    - a window completes when the first atom of a LATER active window
      arrives; the last active window never completes;
    - at completion, EVERY key seen so far is checked (a key absent
      from the window is checked at count 0) against
      ``mean ± std/confidence_factor`` over its trailing ≤num_windows
      history EXCLUDING the completed count; with a single history
      point, std falls back to mean·(1−confidence_factor);
    - a key with <2 stored windows is skipped (and its counter is
      reset ONCE, not skipped+1 times — faithful to the reference's
      early ``continue``);
    - fully-empty (skipped) windows emit ONE empty-window warning per
      completion and are never band-checked themselves;
    - with ``season_windows`` (= reference season // window_size,
      the ``lookback``), the band comes from SEASONALLY DIFFERENCED
      history (counts[i] − counts[i−lookback]) recentered by the
      mean of same-phase windows (reference calculate_range seasonal
      branch, :366-389) once ≥ lookback+3 windows are stored.

    Returns (anomaly rows (key..., window, n, lower, upper),
    n_empty_warnings). The batch band over all windows is
    ``frequency_anomalies``; this variant exists for 1:1 verdict
    parity with the streaming reference."""
    kc = key_cols[0] if len(key_cols) == 1 else None
    df = counts.copy()
    if kc is None:
        df["__k"] = list(zip(*[df[c] for c in key_cols]))
        kc = "__k"
    pivot = df.pivot_table(index=window_name, columns=kc, values=count_name,
                           aggfunc="sum", fill_value=0).sort_index()
    active = pivot.index.to_numpy()
    state: dict = {}  # key -> counts list (reference self.counts)
    rows: list[tuple] = []
    n_empty_warnings = 0

    def _ingest(widx: int) -> None:
        for k in pivot.columns:
            c = int(pivot.loc[widx, k])
            if k in state:
                state[k][-1] += c
            elif c > 0:
                state[k] = [c]

    _ingest(int(active[0]))
    for j in range(1, len(active)):
        w_prev, w_cur = int(active[j - 1]), int(active[j])
        skipped = w_cur - w_prev - 1
        if skipped > 0:
            n_empty_warnings += 1
        def _reset(lst: list) -> None:
            # reference reset_counter, learn_mode=True branch
            if len(lst) <= num_windows + 1:
                lst.append(0)
            else:
                del lst[0]
                lst.append(0)

        for k in list(state):
            lst = state[k]
            if len(lst) < 2:
                _reset(lst)  # reset ONCE, no band check
                continue
            season_offset = 0.0
            if season_windows is not None and len(lst) > season_windows + 2:
                # seasonal branch (reference calculate_range:366-389):
                # counts_tmp = lag-lookback differences (current count
                # excluded), season_offset = mean of SAME-PHASE stored
                # counts; stored slot of lst[i] = (w_prev−(len−1−i))
                # mod lookback, current slot = w_prev mod lookback.
                lb = season_windows
                cur_slot = w_prev % lb
                counts_tmp = [lst[i] - lst[i - lb] for i in range(lb, len(lst) - 1)]
                phase = [
                    lst[i]
                    for i in range(len(lst) - 1)
                    if (w_prev - (len(lst) - 1 - i)) % lb == cur_slot
                ]
                season_offset = float(np.mean(phase)) if phase else 0.0
            else:
                counts_tmp = lst  # full list; the slice strips current
            hist = counts_tmp[-num_windows - 1 : -1]
            if not hist:
                _reset(lst)
                continue
            mean = float(np.mean(hist))
            std = (
                float(np.std(hist))
                if len(hist) > 1
                else float(np.mean(lst[-num_windows - 1 : -1])) * (1 - confidence_factor)
            )
            lower = mean + season_offset - std / confidence_factor
            upper = mean + season_offset + std / confidence_factor
            if lst[-1] < lower or lst[-1] > upper:
                key = k if isinstance(k, tuple) else (k,)
                rows.append(key + (w_prev, int(lst[-1]), lower, upper))
            for _ in range(skipped + 1):
                _reset(lst)
        _ingest(w_cur)
    out = pd.DataFrame(
        rows, columns=key_cols + [window_name, count_name, "lower", "upper"]
    )
    return out, n_empty_warnings


def empty_windows(
    counts: "ray.data.Dataset",
    key_cols: list[str],
    count_name: str = "n",
    window_name: str = "window",
) -> "ray.data.Dataset":
    """Per key, the windows between its first and last that saw no
    events — the reference's skipped-window warning (reference:
    aminer/analysis/EventFrequencyDetector.py:190-200)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        wmin, wmax = int(g[window_name].min()), int(g[window_name].max())
        full = np.arange(wmin, wmax + 1, dtype=np.int64)
        have = np.isin(full, g[window_name].to_numpy())
        miss = full[~have]
        out = {c: [g[c].iloc[0]] * len(miss) for c in key_cols}
        out[window_name] = miss
        return pd.DataFrame(out)

    return counts.groupby(key_cols).map_groups(per_key, batch_format="pandas")


def sliding_count_exceed(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    ts_col: str,
    window_seconds: float,
    upper_limit: int,
    count_name: str = "n_in_window",
) -> "ray.data.Dataset":
    """Sliding variant: for each event, the count of the key's events
    in ``[t - window, t]`` — CLOSED at both ends and including ALL
    events with the same timestamp (the SQL ``RANGE BETWEEN w
    PRECEDING AND CURRENT ROW`` frame, so the oracle equivalence
    holds under equal-timestamp and exact-boundary pairs too —
    ADVICE r1). Sort happens WITHIN key groups (vectorized double
    searchsorted), never globally. Local-maximum suppression: of a
    run of consecutive exceeding events, the first is reported
    (reference keeps a suppression flag until count drops below the
    limit, SlidingEventFrequencyDetector.py:22-271)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        w = int(window_seconds * 1_000_000)
        left = np.searchsorted(tsi, tsi - w, side="left")
        right = np.searchsorted(tsi, tsi, side="right")
        cnt = right - left
        exceed = cnt > upper_limit
        first = exceed & ~np.concatenate([[False], exceed[:-1]])
        idx = np.flatnonzero(first)
        out = g.iloc[idx][key_cols + [ts_col]].copy()
        out[count_name] = cnt[idx]
        return out

    return ds.groupby(key_cols).map_groups(per_key, batch_format="pandas")


def sliding_frequency_lifecycle(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    ts_col: str,
    window_seconds: float,
    set_upper_limit: int,
    local_maximum_threshold: float = 0.2,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """EXACT SlidingEventFrequencyDetector event lifecycle
    (reference: aminer/analysis/SlidingEventFrequencyDetector.py:
    135-259): per event key, the trailing-window frequency at each
    atom is #same-key atoms in [t−W, t] among stream predecessors
    (ties: only earlier atoms count — this is the reference's deque
    semantics, deliberately different from a SQL RANGE frame that
    includes later same-ts peers); the state machine emits

    - ``first_exceeded``: frequency first crosses ABOVE the limit,
      rate-limited to one per window;
    - ``local_maximum``: the tracked maximum is reported when it ages
      one window, the frequency returns into range, or drops more
      than threshold·limit below the maximum;

    exactly as receive_atom sequences them (max tracked only at
    frequency ≥ limit ∧ ≥ running max). Batch recast: atoms are
    pre-sorted per key by (ts, stream order) — the reference scans
    its deque so unsorted input degrades to the same counts only
    when sorted; the engine's canonical order is the sort. One
    coarse-bucketed shuffle; the per-key pass is a vectorized
    searchsorted for frequencies + a small state loop over atoms.

    Returns (key..., ts, kind, frequency)."""
    from ._agg import coarse_grouped

    W = window_seconds
    out_cols = key_cols + ["ts", "kind", "frequency"]

    def per_key(g: pd.DataFrame, out: list) -> None:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        tsf = (
            ts.astype("datetime64[us]").astype(np.int64) / 1e6
            if ts.dtype.kind == "M"
            else ts.astype(np.float64)
        )
        key = tuple(g[c].iloc[0] for c in key_cols)
        lo = np.searchsorted(tsf, tsf - W, side="left")
        freq = np.arange(len(tsf)) - lo + 1  # predecessors (incl. self) in [t-W, t]
        max_f, max_t = 0, 0.0
        exceeded, exceeded_t = False, 0.0
        for i in range(len(tsf)):
            f, t = int(freq[i]), float(tsf[i])
            if f >= set_upper_limit and f >= max_f:
                max_f, max_t = f, t
            if not exceeded and f > set_upper_limit:
                if exceeded_t + W < t:
                    out.append(key + (t, "first_exceeded", f))
                    exceeded_t = t
                exceeded = True
            elif exceeded and (
                max_t + W < t
                or f <= set_upper_limit
                or f < max_f - local_maximum_threshold * set_upper_limit
            ):
                out.append(key + (t, "local_maximum", max_f))
                max_f, max_t = 0, 0.0
                if f <= set_upper_limit:
                    exceeded = False

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows: list = []
        for _, sub in g.groupby(key_cols, sort=False):
            per_key(sub, rows)
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        return pd.DataFrame(rows, columns=out_cols)

    res = coarse_grouped(ds, key_cols, per_bucket, n_buckets=n_buckets).to_pandas()
    if len(res) == 0:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
    return res.sort_values(key_cols + ["ts"]).reset_index(drop=True)

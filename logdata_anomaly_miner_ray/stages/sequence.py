"""Event-sequence n-gram constraints (EventSequenceDetector and
MinimalTransitionTimeDetector recast).

Reference semantics:
- per id-track, the sequence of event types forms length-n grams; a
  never-seen gram is an anomaly (reference:
  aminer/analysis/EventSequenceDetector.py:105-178);
- per (stateA, stateB) the minimal observed transition time; a
  faster transition is an anomaly (reference:
  aminer/analysis/MinimalTransitionTimeDetector.py:75-186).

Batch recast: one groupby(id) shuffle, sort WITHIN the id group by
(ts, seq), vectorized shifted-array n-gram / lag-delta extraction.
The learned gram set / min-time matrix is a small aggregate,
broadcast for the validate pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data
from ray.data.aggregate import Min, Sum


def ngram_counts(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    event_col: str,
    order_cols: list[str],
    n: int = 2,
    count_name: str = "n",
) -> "ray.data.Dataset":
    """Global counts of event-type n-grams (columns g0..g{n-1}),
    where grams are built per id-track in ``order_cols`` order."""

    gram_cols = [f"g{i}" for i in range(n)]

    def per_id(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        ev = g[event_col].to_numpy()
        if len(ev) < n:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in gram_cols}
                                | {"__pn": pd.Series(dtype=np.int64)})
        cols = {f"g{i}": ev[i : len(ev) - n + 1 + i] for i in range(n)}
        df = pd.DataFrame(cols)
        return df.groupby(gram_cols, as_index=False).size().rename(columns={"size": "__pn"})

    partials = ds.groupby(id_cols).map_groups(per_id, batch_format="pandas")
    return partials.groupby(gram_cols).aggregate(Sum("__pn", alias_name=count_name))


def new_ngrams(
    ngrams: "ray.data.Dataset", known: set[tuple], n: int = 2
) -> "ray.data.Dataset":
    """Grams absent from the learned set (validate phase; ``known``
    is small — the reference caps its sequence sets the same way)."""
    gram_cols = [f"g{i}" for i in range(n)]

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        grams = list(zip(*[df[c] for c in gram_cols]))
        mask = np.array([g not in known for g in grams], dtype=bool)
        return df[mask]

    return ngrams.map_batches(flag, batch_format="pandas", batch_size=None)


def min_transition_times(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    event_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
    out_name: str = "min_seconds",
) -> "ray.data.Dataset":
    """Minimal observed seconds between consecutive events per
    (from_event, to_event) — the learned time matrix."""

    order_cols = order_cols or [ts_col]

    def per_id(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        ev = g[event_col].to_numpy()
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        if len(ev) < 2:
            return pd.DataFrame({"from_event": pd.Series(dtype=object),
                                 "to_event": pd.Series(dtype=object),
                                 "__mn": pd.Series(dtype=np.float64)})
        df = pd.DataFrame({
            "from_event": ev[:-1],
            "to_event": ev[1:],
            "__mn": np.diff(tsi) / 1_000_000.0,
        })
        return df.groupby(["from_event", "to_event"], as_index=False)["__mn"].min()

    partials = ds.groupby(id_cols).map_groups(per_id, batch_format="pandas")
    return partials.groupby(["from_event", "to_event"]).aggregate(
        Min("__mn", alias_name=out_name)
    )

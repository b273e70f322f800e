"""Event-sequence n-gram constraints (EventSequenceDetector and
MinimalTransitionTimeDetector recast).

Reference semantics:
- per id-track, the sequence of event types forms length-n grams; a
  never-seen gram is an anomaly (reference:
  aminer/analysis/EventSequenceDetector.py:105-178);
- per (stateA, stateB) the minimal observed transition time; a
  faster transition is an anomaly (reference:
  aminer/analysis/MinimalTransitionTimeDetector.py:75-186).

Batch recast: ONE shuffle keyed by ``hash(id) mod n_buckets`` (the
coarse-key pattern — per-id groups are naturally tiny and millions of
tiny ``map_groups`` calls are pure Ray overhead); inside each bucket
the rows sort by (id, order) once and n-grams / lag-deltas come from
shifted arrays masked by a same-id adjacency vector — no per-id
Python loop at any group size. The learned gram set / min-time matrix
is a small aggregate, broadcast for the validate pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data
from ray.data.aggregate import Min, Sum

from ._agg import coarse_grouped


def _same_adjacent(g: pd.DataFrame, id_cols: list[str]) -> np.ndarray:
    """Boolean mask over consecutive sorted rows: True where row i+1
    belongs to the same id-track as row i."""
    m = len(g)
    same = np.ones(max(m - 1, 0), dtype=bool)
    for c in id_cols:
        v = g[c].to_numpy()
        same &= v[1:] == v[:-1]
    return same


def ngram_counts(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    event_col: str,
    order_cols: list[str],
    n: int = 2,
    count_name: str = "n",
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Global counts of event-type n-grams (columns g0..g{n-1}),
    where grams are built per id-track in ``order_cols`` order."""

    gram_cols = [f"g{i}" for i in range(n)]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {c: pd.Series(dtype=object) for c in gram_cols}
            | {"__pn": pd.Series(dtype=np.int64)}
        )
        m = len(g)
        if m < n:
            return empty
        g = g.sort_values(id_cols + order_cols, kind="mergesort")
        ev = g[event_col].to_numpy()
        same = _same_adjacent(g, id_cols)
        # gram starting at i is valid iff rows i..i+n-1 share an id:
        # windowed AND of the adjacency mask via prefix sums
        cs = np.concatenate([[0], np.cumsum(same)])
        ok = (cs[n - 1 :] - cs[: m - n + 1]) == (n - 1)
        if not ok.any():
            return empty
        cols = {f"g{i}": ev[i : m - n + 1 + i][ok] for i in range(n)}
        df = pd.DataFrame(cols)
        return df.groupby(gram_cols, as_index=False).size().rename(columns={"size": "__pn"})

    partials = coarse_grouped(ds, id_cols, per_bucket, n_buckets=n_buckets)
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
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Minimal observed seconds between consecutive events per
    (from_event, to_event) — the learned time matrix."""

    order_cols = order_cols or [ts_col]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"from_event": pd.Series(dtype=object),
             "to_event": pd.Series(dtype=object),
             "__mn": pd.Series(dtype=np.float64)}
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(id_cols + order_cols, kind="mergesort")
        ev = g[event_col].to_numpy()
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        same = _same_adjacent(g, id_cols)
        if not same.any():
            return empty
        df = pd.DataFrame(
            {
                "from_event": ev[:-1][same],
                "to_event": ev[1:][same],
                "__mn": (np.diff(tsi) / 1_000_000.0)[same],
            }
        )
        return df.groupby(["from_event", "to_event"], as_index=False)["__mn"].min()

    partials = coarse_grouped(ds, id_cols, per_bucket, n_buckets=n_buckets)
    return partials.groupby(["from_event", "to_event"]).aggregate(
        Min("__mn", alias_name=out_name)
    )

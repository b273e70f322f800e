"""Sessionization and per-id combo assembly.

Clean-room recast of NewMatchIdValueComboDetector (reference:
aminer/analysis/NewMatchIdValueComboDetector.py:30-273): AMiner
accumulates value combos across multiple atoms sharing an id path,
closing a combo when ``min_allowed_time_diff`` passes. Batch recast:
ONE shuffle keyed by ``hash(id) mod n_buckets`` (coarse-key pattern —
per-id groups are tiny; bounded bucket count amortizes Ray's
per-group overhead), session indices assigned VECTORIZED across the
whole bucket: sort by (id, ts), flag id starts + over-gap steps,
cumulative-sum segment ids, re-base per id with a running maximum —
no per-id Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ._agg import coarse_grouped


def _session_ids(
    g: pd.DataFrame, id_cols: list[str], ts_col: str, gap_seconds: float
) -> tuple[pd.DataFrame, np.ndarray]:
    """(sorted frame, per-id session index) for one bucket."""
    g = g.sort_values(id_cols + [ts_col], kind="mergesort")
    ts = g[ts_col].to_numpy()
    tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
    m = len(g)
    new_id = np.zeros(m, dtype=bool)
    if m:
        new_id[0] = True
    for c in id_cols:
        v = g[c].to_numpy()
        new_id[1:] |= v[1:] != v[:-1]
    gap = np.zeros(m, dtype=bool)
    gap[1:] = np.diff(tsi) > int(gap_seconds * 1e6)
    brk = new_id | gap
    abs_sid = np.cumsum(brk) - 1  # global segment index (nondecreasing)
    # per-id base = abs_sid at the id's first row, forward-filled
    base = np.maximum.accumulate(np.where(new_id, abs_sid, -1))
    return g, (abs_sid - base).astype(np.int64)


def sessionize(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    ts_col: str,
    gap_seconds: float,
    session_name: str = "session_id",
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Append a per-id session index: a new session starts whenever
    the time since the previous event of that id exceeds
    ``gap_seconds``."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g, sid = _session_ids(g, id_cols, ts_col, gap_seconds)
        g = g.copy()
        g[session_name] = sid
        return g

    return coarse_grouped(ds, id_cols, per_bucket, n_buckets=n_buckets)


def session_combos(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    value_cols: list[str],
    ts_col: str,
    gap_seconds: float,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per (id, session): the distinct value combos assembled across
    the session's events + first/last ts + event count — the
    'combo accumulated across atoms sharing an id' semantics."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g, sid = _session_ids(g, id_cols, ts_col, gap_seconds)
        g = g.copy()
        g["session_id"] = sid
        aggs = {
            **{
                f"{c}_set": (c, lambda s: "|".join(sorted(set(str(v) for v in s.dropna()))))
                for c in value_cols
            },
            "first_ts": (ts_col, "first"),
            "last_ts": (ts_col, "last"),
            "n_events": (ts_col, "size"),
        }
        out = (
            g.groupby(id_cols + ["session_id"], sort=False)
            .agg(**aggs)
            .reset_index()
        )
        out["session_id"] = out["session_id"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out[id_cols + ["session_id"] + [f"{c}_set" for c in value_cols] + ["first_ts", "last_ts", "n_events"]]

    return coarse_grouped(ds, id_cols, per_bucket, n_buckets=n_buckets)

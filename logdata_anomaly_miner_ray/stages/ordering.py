"""Timestamp-ordering constraints (TimestampsUnsortedDetector and
SimpleMonotonicTimestampAdjust recast).

Reference semantics:
- an atom whose time is lower than its predecessor's is an anomaly
  (reference: aminer/analysis/TimestampsUnsortedDetector.py:23-76);
- the monotonic filter clamps decreasing timestamps to the running
  maximum (reference:
  aminer/analysis/TimestampCorrectionFilters.py:18-52).

Batch recast: "predecessor" needs an explicit order — a sequence
column (ingest order / event id). Both checks run per key group,
sorted within the group only (vectorized diff / cummax), never a
global sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def inversion_counts(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    seq_col: str,
    ts_col: str,
    out_name: str = "n_inversions",
) -> "ray.data.Dataset":
    """Per key: how many adjacent pairs (ordered by ``seq_col``)
    have a decreasing ``ts_col``. Keys with zero inversions are
    omitted (they pass)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(seq_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        if ts.dtype.kind == "M":
            ts = ts.astype("datetime64[us]").astype(np.int64)
        inv = int((np.diff(ts) < 0).sum())
        if inv == 0:
            return pd.DataFrame({c: pd.Series(dtype=g[c].dtype) for c in key_cols}
                                | {out_name: pd.Series(dtype=np.int64)})
        out = {c: [g[c].iloc[0]] for c in key_cols}
        out[out_name] = [inv]
        return pd.DataFrame(out)

    return ds.groupby(key_cols).map_groups(per_key, batch_format="pandas")


def monotonic_adjust(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    seq_col: str,
    ts_col: str,
    adjusted_name: str = "ts_adjusted",
) -> "ray.data.Dataset":
    """Append a clamped-to-running-max timestamp per key (cummax in
    seq order) — SimpleMonotonicTimestampAdjust semantics."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(seq_col, kind="mergesort").copy()
        g[adjusted_name] = g[ts_col].cummax()
        return g

    return ds.groupby(key_cols).map_groups(per_key, batch_format="pandas")

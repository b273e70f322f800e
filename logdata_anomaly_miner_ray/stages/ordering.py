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


def inversion_counts_sorted(
    ds: "ray.data.Dataset",
    key_col: str,
    seq_col: str,
    ts_col: str,
    out_name: str = "n_inversions",
) -> pd.DataFrame:
    """Fast single-key variant: range-sort by (key, seq), count
    inversions vectorized per sorted block, fix up the #blocks-1
    block junctions on the driver. Avoids Ray's per-group
    ``map_groups`` walk — the sort is the only shuffle. Returns the
    small per-key table (keys with ≥1 inversion)."""
    import pyarrow as pa

    s = ds.sort([key_col, seq_col])

    def block_partial(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), dtype=object)
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        if ts.dtype.kind == "M":
            ts = ts.astype("datetime64[us]").astype(np.int64)
        n = len(k)
        if n == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             "__inv": pa.array([], pa.int64()),
                             "__edge": pa.array([], pa.bool_()),
                             "__ts": pa.array([], pa.int64())})
        same = k[1:] == k[:-1]
        inv = same & (np.diff(ts) < 0)
        # per-key inversion counts within the block
        starts = np.flatnonzero(np.concatenate([[True], ~same]))
        ends = np.concatenate([starts[1:], [n]])
        cs = np.concatenate([[0], np.cumsum(inv)])
        # inversions for group [a, b): pairs at positions a..b-2 → cs[b-1]-cs[a]
        counts = cs[np.maximum(ends - 1, starts)] - cs[starts]
        keep = counts > 0
        out_k = [str(x) for x in k[starts[keep]]]
        out_c = counts[keep].tolist()
        # edge rows: first and last row of the block for junction fixup
        edge_k = [str(k[0]), str(k[-1])]
        edge_ts = [int(ts[0]), int(ts[-1])]
        return pa.table(
            {
                key_col: pa.array(out_k + edge_k, pa.string()),
                "__inv": pa.array(out_c + [0, 0], pa.int64()),
                "__edge": pa.array([False] * len(out_k) + [True, True]),
                "__ts": pa.array([0] * len(out_k) + edge_ts, pa.int64()),
            }
        )

    md = s.map_batches(
        block_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).to_pandas()
    if md.empty or "__edge" not in md.columns:  # 0-row input
        return pd.DataFrame({key_col: [], out_name: []}).astype({out_name: "int64"})
    per_key = (
        md[~md["__edge"]].groupby(key_col, as_index=False)["__inv"].sum()
        if len(md)
        else pd.DataFrame({key_col: [], "__inv": []})
    )
    # junctions: edge rows arrive in pairs per block, in sorted block
    # order within the materialized table order; pair last-of-block i
    # with first-of-block i+1
    edges = md[md["__edge"]]
    junction_counts: dict[str, int] = {}
    er = edges.reset_index(drop=True)
    for i in range(1, len(er) - 1, 2):  # er rows: [first0, last0, first1, last1, ...]
        last_prev, first_next = er.iloc[i], er.iloc[i + 1]
        if last_prev[key_col] == first_next[key_col] and first_next["__ts"] < last_prev["__ts"]:
            junction_counts[last_prev[key_col]] = junction_counts.get(last_prev[key_col], 0) + 1
    out = per_key.set_index(key_col)["__inv"].to_dict()
    for kk, c in junction_counts.items():
        out[kk] = out.get(kk, 0) + c
    res = pd.DataFrame(
        {key_col: list(out.keys()), out_name: [int(v) for v in out.values()]}
    )
    return res[res[out_name] > 0].reset_index(drop=True)


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

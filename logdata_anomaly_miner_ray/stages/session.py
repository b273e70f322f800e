"""Sessionization and per-id combo assembly.

Clean-room recast of NewMatchIdValueComboDetector (reference:
aminer/analysis/NewMatchIdValueComboDetector.py:30-273): AMiner
accumulates value combos across multiple atoms sharing an id path,
closing a combo when ``min_allowed_time_diff`` passes. Batch recast:
one groupby(id) shuffle, time-gap sessionization inside the sorted
group (vectorized cumsum over gap flags), then the per-session value
combos become first-seen domain rows (feedable to the combo-domain
check in stages/domain.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def sessionize(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    ts_col: str,
    gap_seconds: float,
    session_name: str = "session_id",
) -> "ray.data.Dataset":
    """Append a per-id session index: a new session starts whenever
    the time since the previous event of that id exceeds
    ``gap_seconds``."""

    def per_id(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort").copy()
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        gap = np.concatenate([[False], np.diff(tsi) > int(gap_seconds * 1e6)])
        g[session_name] = np.cumsum(gap).astype(np.int64)
        return g

    return ds.groupby(id_cols).map_groups(per_id, batch_format="pandas")


def session_combos(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    value_cols: list[str],
    ts_col: str,
    gap_seconds: float,
) -> "ray.data.Dataset":
    """Per (id, session): the distinct value combos assembled across
    the session's events + first/last ts + event count — the
    'combo accumulated across atoms sharing an id' semantics."""

    def per_id(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        gap = np.concatenate([[False], np.diff(tsi) > int(gap_seconds * 1e6)])
        sid = np.cumsum(gap)
        out = []
        for s in np.unique(sid):
            sel = g[sid == s]
            rec = {c: sel[c].iloc[0] for c in id_cols}
            rec["session_id"] = int(s)
            for c in value_cols:
                vals = sorted(set(str(v) for v in sel[c].dropna()))
                rec[f"{c}_set"] = "|".join(vals)
            rec["first_ts"] = sel[ts_col].iloc[0]
            rec["last_ts"] = sel[ts_col].iloc[-1]
            rec["n_events"] = len(sel)
            out.append(rec)
        return pd.DataFrame(out)

    return ds.groupby(id_cols).map_groups(per_id, batch_format="pandas")

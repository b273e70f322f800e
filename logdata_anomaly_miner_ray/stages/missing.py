"""Missing-value / heartbeat-interval constraints
(MissingMatchPathValueDetector recast).

Reference semantics (aminer/analysis/MissingMatchPathValueDetector.py:
82-160): each known value must reappear within its learned interval;
silence beyond the interval raises a missing-value alert. Batch
recast: per value, sort its timestamps within the key group, flag
gaps (including the tail gap up to the dataset's max timestamp)
exceeding the interval. One groupby shuffle keyed on the value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def gap_violations(
    ds: "ray.data.Dataset",
    value_cols: list[str],
    ts_col: str,
    interval_seconds: float,
    end_ts=None,
    gap_name: str = "gap_seconds",
) -> "ray.data.Dataset":
    """Per value tuple, occurrences separated by more than
    ``interval_seconds`` (and the final silence up to ``end_ts`` if
    given). Returns one row per violation: the value tuple, the
    timestamp of the last sighting before the gap, and the gap."""

    end_us = None
    if end_ts is not None:
        end_us = int(pd.Timestamp(end_ts).value // 1000)

    def per_value(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        w = int(interval_seconds * 1_000_000)
        gaps = np.diff(tsi)
        idx = np.flatnonzero(gaps > w)
        rows = g.iloc[idx][value_cols + [ts_col]].copy()
        rows[gap_name] = gaps[idx] / 1_000_000.0
        if end_us is not None and len(tsi) and (end_us - tsi[-1]) > w:
            tail = g.iloc[[-1]][value_cols + [ts_col]].copy()
            tail[gap_name] = (end_us - tsi[-1]) / 1_000_000.0
            rows = pd.concat([rows, tail], ignore_index=True)
        return rows

    return ds.groupby(value_cols).map_groups(per_value, batch_format="pandas")

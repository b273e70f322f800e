"""Per-id numeric range constraints (ValueRangeDetector recast).

Reference semantics (aminer/analysis/ValueRangeDetector.py:74-165):
per id-tuple a learned [min, max]; a value outside it is an anomaly
(and in learn mode then extends the range). Batch recast: the fit
pass is one pre-aggregated groupby min/max (``_agg.grouped_min_max``),
the validate pass broadcasts the small ranges table and flags rows
outside their id's range — streaming, no second shuffle.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..schema import violations_table
from ._agg import grouped_min_max
from ._taskcache import cached_task_fn


def fit_ranges(
    ds: "ray.data.Dataset", id_cols: list[str], value_col: str
) -> "ray.data.Dataset":
    return grouped_min_max(ds, id_cols, value_col)


def ranges_to_dict(ranges_table: pa.Table, id_cols: list[str]) -> dict:
    """{id_tuple: (min, max)} broadcastable lookup."""
    keys = list(zip(*[ranges_table[c].to_pylist() for c in id_cols]))
    mins = ranges_table["min_value"].to_pylist()
    maxs = ranges_table["max_value"].to_pylist()
    return {k: (mn, mx) for k, mn, mx in zip(keys, mins, maxs)}


def range_violations(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    value_col: str,
    ranges_ref: "ray.ObjectRef",
    check_name: str = "ValueRangeDetector",
) -> "ray.data.Dataset":
    """Validate pass: vectorized per-batch compare against the
    broadcast ranges — id→(lo,hi) resolved via a sorted key table +
    searchsorted, not a per-row dict lookup."""

    class RangeCheck:
        def __init__(self):
            ranges = ray.get(ranges_ref)
            items = sorted(ranges.items(), key=lambda kv: kv[0])
            self.keys = np.array(["\x1f".join(map(str, k)) for k, _ in items])
            self.lo = np.array([v[0] for _, v in items], dtype=np.float64)
            self.hi = np.array([v[1] for _, v in items], dtype=np.float64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = None
            for c in id_cols:
                part = pc.cast(batch[c], pa.string())
                ids = part if ids is None else pc.binary_join_element_wise(ids, part, "\x1f")
            idn = np.asarray(ids.to_numpy(zero_copy_only=False), dtype=object).astype(str)
            pos = np.searchsorted(self.keys, idn)
            pos_c = np.clip(pos, 0, len(self.keys) - 1)
            known = self.keys[pos_c] == idn
            vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            lo, hi = self.lo[pos_c], self.hi[pos_c]
            bad = known & ((vals < lo) | (vals > hi))
            if not bad.any():
                return violations_table(check_name, "", [], [], [], "")
            idx = np.flatnonzero(bad)
            return violations_table(
                check=check_name,
                message="value outside learned range",
                keys=idn[idx],
                affected_paths=id_cols + [value_col],
                affected_values=[[f"{v}"] for v in vals[idx]],
                expected=[
                    json.dumps({"min": float(l), "max": float(h)})
                    for l, h in zip(lo[idx], hi[idx])
                ],
            )

    return ds.map_batches(
        cached_task_fn(RangeCheck, cache_on=(ranges_ref, tuple(id_cols), value_col, check_name)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )

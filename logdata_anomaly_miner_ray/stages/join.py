"""Relational joins.

AMiner has no relational join operator (SURVEY.md §2.5) — join-like
semantics appear as correlation rules, sessionization and broadcast
dict dispatch. A complete engine needs the real thing:

- ``hash_join``      — both sides large: Ray's native
  hash-partitioned ``Dataset.join`` (Ray ≥2.46), partition count
  sized by the caller; this IS the bucketed shuffle join.
- ``broadcast_join`` — small right side: ``ray.put`` the lookup
  arrays once, vectorized searchsorted per batch (AMiner's
  MatchValueFilter dict dispatch, aminer/analysis/AtomFilters.py:91).
- as-of / interval joins: stages/correlation.interval_join_violations.
- semi/anti joins: stages/referential.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ._taskcache import cached_task_fn


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Hash-partitioned large×large join (native Ray shuffle join)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
        left_suffix="_l",
        right_suffix="_r",
    )


def broadcast_join(
    ds: "ray.data.Dataset",
    key: str,
    lookup_ref: "ray.ObjectRef",
    out_col: str,
    drop_unmatched: bool = True,
) -> "ray.data.Dataset":
    """Map-side join against a broadcast (keys_sorted, values)
    pair shipped once via ``ray.put``."""

    class Lookup:
        def __init__(self):
            keys, vals = ray.get(lookup_ref)
            order = np.argsort(keys)
            self.keys, self.vals = keys[order], vals[order]

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = batch[key].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.keys, k), 0, len(self.keys) - 1)
            hit = self.keys[pos] == k
            vals = np.where(hit, self.vals[pos], None)
            out = batch.append_column(out_col, pa.array(vals.tolist()))
            if drop_unmatched:
                out = out.filter(pa.array(hit))
            return out

    return ds.map_batches(
        cached_task_fn(Lookup, cache_on=(lookup_ref, key, out_col, drop_unmatched)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )

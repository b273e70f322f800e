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


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Backward as-of LEFT join: each left row gains the right row
    with the greatest ``on`` <= left ``on`` among equal ``by`` keys
    (unmatched -> nulls). DuckDB ``ASOF LEFT JOIN`` semantics with
    ``allow_exact_matches``.

    Shape: both sides are tagged into ONE unified narrow schema and
    shuffled ONCE by a bounded composite key ``crc32(by) %
    n_buckets`` (a key's rows always co-locate; each bucket holds
    ~1/n_buckets of the data — the coarse-key pattern, never one
    group per key and never one group holding everything). Inside a
    bucket a single sorted ``pd.merge_asof(by=...)`` resolves every
    key at once. ``on`` must be a timestamp or numeric column.

    Tie note: among right rows sharing the exact same ``on`` value
    for a key, the LAST in sorted input order wins (pandas
    semantics); pre-deduplicate the right side for full
    determinism.
    """
    import pandas as pd
    import zlib

    l_sch = left.schema()
    if l_sch is None:
        raise ValueError("asof_join: left dataset has no schema (empty with unknown types)")
    r_sch = right.schema()
    if r_sch is None and right_cols is None:
        raise ValueError("asof_join: right_cols required when the right schema is unknown")
    rc = right_cols or [c for c in r_sch.base_schema.names if c not in (on, by)]
    left_names = l_sch.base_schema.names
    # an empty right side with unknown schema degrades right columns
    # to null-typed (documented); callers wanting stable types pass a
    # schema-bearing (possibly empty) right dataset
    r_types = {
        c: (r_sch.base_schema.field(c).type if r_sch is not None else pa.null()) for c in rc
    }

    def _bucket(keys: np.ndarray) -> np.ndarray:
        if keys.dtype.kind in "iu":
            k = keys.astype(np.int64)
            return (k % n_buckets + n_buckets) % n_buckets
        return np.array(
            [zlib.crc32(str(x).encode()) % n_buckets for x in keys], dtype=np.int32
        )

    def _drop_null_keys(t: pa.Table) -> pa.Table:
        # null join/on keys are dropped from BOTH sides (callers
        # needing LEFT-preserve semantics union a filter-is-null pass)
        return t.filter(pc.and_(pc.is_valid(t[by]), pc.is_valid(t[on])))

    def tag_left(t: pa.Table) -> pa.Table:
        t = _drop_null_keys(t)
        cols = {
            "__b": pa.array(_bucket(t[by].to_numpy(zero_copy_only=False)), pa.int32()),
            "__side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            by: t[by],
            "__on": pc.cast(t[on], pa.int64()),
        }
        for c in left_names:
            if c not in (by,):
                cols[f"l.{c}"] = t[c]
        for c in rc:
            cols[f"r.{c}"] = pa.nulls(t.num_rows, r_types[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        t = _drop_null_keys(t)
        cols = {
            "__b": pa.array(_bucket(t[by].to_numpy(zero_copy_only=False)), pa.int32()),
            "__side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            by: t[by],
            "__on": pc.cast(t[on], pa.int64()),
        }
        for c in left_names:
            if c not in (by,):
                cols[f"l.{c}"] = pa.nulls(t.num_rows, l_sch.base_schema.field(c).type)
        for c in rc:
            cols[f"r.{c}"] = t[c]
        return pa.table(cols)

    tagged = left.map_batches(
        tag_left, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).union(
        right.map_batches(
            tag_right, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    )

    out_fields = []
    for c in left_names:
        out_fields.append((c, l_sch.base_schema.field(c).type))
    for c in rc:
        out_fields.append((f"{c}{suffix}", r_types[c]))
    out_schema = pa.schema(out_fields)

    def fold(g: pd.DataFrame) -> pa.Table:
        lf = g[g["__side"] == 0]
        rf = g[g["__side"] == 1]
        if len(lf) == 0:
            return out_schema.empty_table()
        lf = lf.sort_values("__on", kind="mergesort")
        # keep the by-key's native dtype (int or string both merge)
        l_in = pd.DataFrame({by: lf[by].to_numpy(), "__on": lf["__on"].to_numpy(np.int64)})
        for c in left_names:
            if c not in (by, on):
                l_in[f"l.{c}"] = lf[f"l.{c}"].to_numpy()
        if len(rf) == 0:
            m = l_in.copy()
            for c in rc:
                m[f"r.{c}"] = None
        else:
            rf = rf.sort_values("__on", kind="mergesort")
            r_in = pd.DataFrame({by: rf[by].to_numpy(), "__on": rf["__on"].to_numpy(np.int64)})
            for c in rc:
                r_in[f"r.{c}"] = rf[f"r.{c}"].to_numpy()
            m = pd.merge_asof(
                l_in, r_in, on="__on", by=by, direction="backward", suffixes=("", "__rr")
            )
        cols = {}
        for c in left_names:
            if c == by:
                cols[c] = pa.array(m[by], out_schema.field(c).type, from_pandas=True)
            elif c == on:
                cols[c] = pc.cast(pa.array(m["__on"].to_numpy(np.int64)), out_schema.field(c).type)
            else:
                cols[c] = pa.array(m[f"l.{c}"], out_schema.field(c).type, from_pandas=True)
        for c in rc:
            cols[f"{c}{suffix}"] = pa.array(m[f"r.{c}"], out_schema.field(f"{c}{suffix}").type, from_pandas=True)
        return pa.table(cols, schema=out_schema)

    return tagged.groupby("__b").map_groups(fold, batch_format="pandas")

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
    # the shuffled on-key: int64 for ints/timestamps, float64 for
    # floating on-columns (an int64 cast would raise on fractions)
    _on_type = (
        pa.float64()
        if pa.types.is_floating(l_sch.base_schema.field(on).type)
        else pa.int64()
    )

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
            "__on": pc.cast(t[on], _on_type),
        }
        for c in left_names:
            if c not in (by, on):  # __on already carries the on-key
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
            "__on": pc.cast(t[on], _on_type),
        }
        for c in left_names:
            if c not in (by, on):
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

    def fold(g: pa.Table) -> pa.Table:
        # POSITION-ONLY merge: pandas sees just (by, __on, position)
        # — payload columns never leave Arrow, so int64 payloads with
        # magnitudes > 2^53 survive bit-exact (a pandas round-trip of
        # null-bearing int columns promotes to float64 and silently
        # rounds them)
        side = g["__side"]
        lf = g.filter(pc.equal(side, 0))
        rf = g.filter(pc.equal(side, 1))
        if lf.num_rows == 0:
            return out_schema.empty_table()
        l_on = lf["__on"].to_numpy(zero_copy_only=False)
        l_by = lf[by].to_numpy(zero_copy_only=False)
        l_ord = np.argsort(l_on, kind="stable")
        if rf.num_rows:
            r_on = rf["__on"].to_numpy(zero_copy_only=False)
            r_by = rf[by].to_numpy(zero_copy_only=False)
            r_ord = np.argsort(r_on, kind="stable")
            lidx = pd.DataFrame(
                {by: l_by[l_ord], "__on": l_on[l_ord], "__lp": l_ord.astype(np.int64)}
            )
            ridx = pd.DataFrame(
                {by: r_by[r_ord], "__on": r_on[r_ord], "__rp": r_ord.astype(np.int64)}
            )
            m = pd.merge_asof(lidx, ridx, on="__on", by=by, direction="backward")
            rp = m["__rp"].to_numpy()  # float64 with NaN; POSITIONS are < 2^53
            nan = np.isnan(rp)
            take_r = pa.array(
                np.where(nan, 0, rp).astype(np.int64), pa.int64(), mask=nan
            )
        else:
            take_r = pa.nulls(lf.num_rows, pa.int64())
        take_l = pa.array(l_ord.astype(np.int64))
        cols = {}
        for c in left_names:
            if c == by:
                cols[c] = lf[by].take(take_l)
            elif c == on:
                cols[c] = pc.cast(lf["__on"].take(take_l), out_schema.field(c).type)
            else:
                cols[c] = lf[f"l.{c}"].take(take_l)
        for c in rc:
            # null take-indices yield null rows (unmatched lefts)
            cols[f"{c}{suffix}"] = rf[f"r.{c}"].take(take_r) if rf.num_rows else pa.nulls(
                lf.num_rows, r_types[c]
            )
        return pa.table(cols, schema=out_schema)

    return tagged.groupby("__b").map_groups(fold, batch_format="pyarrow")

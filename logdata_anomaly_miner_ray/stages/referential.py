"""Referential-integrity checks (north rule: url -> warc_ts).

AMiner expresses "A must have a matching B" as correlation rules
awaiting partner events within a time window (reference:
aminer/analysis/TimeCorrelationViolationDetector.py:150-363) and as
missing-value alerts (reference:
aminer/analysis/MissingMatchPathValueDetector.py:82-160). The batch
recasts:

- ``anti_join_keys``  — fully distributed: project BOTH sides to
  distinct keys per block, tag the side, union, one groupby(key)
  shuffle; a key present on the left with zero right-side hits is a
  dangling reference. No driver-side set, works large×large.
- ``filter_not_in``   — broadcast variant for a small reference side:
  the key set is ``ray.put`` once and read per task (AMiner's
  dict-dispatch lookup, reference aminer/analysis/AtomFilters.py:91-118).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ._taskcache import cached_task_fn
from ray.data.aggregate import Sum


def anti_join_keys(
    left: "ray.data.Dataset",
    left_key: str,
    right: "ray.data.Dataset",
    right_key: str,
    out_name: str | None = None,
) -> "ray.data.Dataset":
    """Distinct left keys with no matching right key.

    Shuffle volume = distinct keys per block on each side (one int
    flag each), never whole rows.
    """
    out_name = out_name or left_key

    def side(tag: int, key: str):
        def partial(batch: pa.Table) -> pa.Table:
            t = batch.select([key]).group_by([key]).aggregate([])
            t = t.rename_columns(["__key"])
            n = t.num_rows
            return t.append_column("__left", pa.array([1 - tag] * n, pa.int64())) \
                    .append_column("__right", pa.array([tag] * n, pa.int64()))

        return partial

    l = left.map_batches(side(0, left_key), batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    r = right.map_batches(side(1, right_key), batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    both = l.union(r)
    agg = both.groupby("__key").aggregate(
        Sum("__left", alias_name="__nl"), Sum("__right", alias_name="__nr")
    )
    missing = agg.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater(t["__nl"], 0), pc.equal(t["__nr"], 0))
        ).select(["__key"]).rename_columns([out_name]),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    return missing


def filter_not_in(
    ds: "ray.data.Dataset", key: str, valid_keys_ref: "ray.ObjectRef"
) -> "ray.data.Dataset":
    """Rows whose key is NOT in the broadcast key set (small side
    shipped once via ``ray.put``, fetched from the local object
    store per task — never re-shipped per batch)."""

    class NotInFilter:
        def __init__(self):
            import pyarrow as _pa

            keys = ray.get(valid_keys_ref)
            self.valid = _pa.array(sorted(keys), pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch[key], value_set=self.valid))
            return batch.filter(mask)

    return ds.map_batches(
        cached_task_fn(NotInFilter, cache_on=(valid_keys_ref, key)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


def referential_violations(
    child: "ray.data.Dataset",
    child_key: str,
    parent: "ray.data.Dataset",
    parent_key: str,
    check_name: str = "ReferentialIntegrityDetector",
) -> "ray.data.Dataset":
    """Violation rows for child keys missing from the parent table."""
    from ..schema import violations_table

    missing = anti_join_keys(child, child_key, parent, parent_key)

    def render(t: pa.Table) -> pa.Table:
        ks = t[child_key].to_pylist()
        return violations_table(
            check=check_name,
            message=f"dangling reference: {child_key} has no match in {parent_key}",
            keys=ks,
            affected_paths=[child_key, parent_key],
            affected_values=[[str(k)] for k in ks],
            expected='{"exists_in_parent": true}',
        )

    return missing.map_batches(render, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

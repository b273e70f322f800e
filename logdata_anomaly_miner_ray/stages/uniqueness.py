"""Uniqueness / duplicate-key checks (north-rule uniqueness on url).

AMiner tracks first-seen values with exact in-process sets
(reference: aminer/analysis/NewMatchPathValueDetector.py:68-120);
the batch recast of "this key must be unique" is a pre-aggregated
count shuffle: duplicates are exactly the keys whose global count
exceeds 1. Per-block combining bounds the shuffle (see _agg.py);
hot keys (Zipf domains) therefore fan in at most #blocks partial
rows each.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ._agg import grouped_counts


def duplicate_keys(
    ds: "ray.data.Dataset", keys: list[str], count_name: str = "n"
) -> "ray.data.Dataset":
    """Key tuples occurring more than once, with their counts."""
    counts = grouped_counts(ds, keys, out_name=count_name)
    return counts.map_batches(
        lambda t: t.filter(pc.greater(t[count_name], 1)),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )


def duplicate_keys_hashed(
    ds: "ray.data.Dataset", key: str, count_name: str = "n"
) -> "ray.data.Dataset":
    """duplicate_keys for a high-cardinality STRING key.

    Shuffles a 64-bit hash of the key instead of the string, via
    SORT + run-length counting rather than ``groupby().aggregate``
    (Ray's aggregate walks per-group state — 5-8x slower than its
    range sort for millions of mostly-unique groups). After the
    range sort, equal hashes are contiguous: each block counts its
    interior runs vectorized and forwards only its two EDGE groups
    (first/last hash) to the driver, which merges the ≤2·#blocks
    edge entries. Collision odds at 10^12 keys ≈ 3e-5 per run, and
    a collision only risks one false duplicate pair."""
    import numpy as np

    import ray
    import ray.data as rd

    from ..functions.text import flat_utf8, token_hashes

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        data, off = flat_utf8(col)
        h = token_hashes(data, off[:-1], off[1:]).view(np.int64)
        uniq, first_idx, counts = np.unique(h, return_index=True, return_counts=True)
        return pa.table(
            {
                "__h": pa.array(uniq),
                key: col.take(pa.array(first_idx)),
                "__pn": pa.array(counts),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    sorted_parts = partials.sort("__h")

    def block_dups(batch: pa.Table) -> pa.Table:
        h = batch["__h"].to_numpy(zero_copy_only=False)
        n = batch["__pn"].to_numpy(zero_copy_only=False)
        if len(h) == 0:
            return pa.table(
                {key: pa.array([], pa.string()), count_name: pa.array([], pa.int64()),
                 "__edge": pa.array([], pa.bool_()), "__h": pa.array([], pa.int64())}
            )
        starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
        ends = np.concatenate([starts[1:], [len(h)]])
        cs = np.concatenate([[0], np.cumsum(n)])
        sums = cs[ends] - cs[starts]
        is_edge = np.zeros(len(starts), dtype=bool)
        is_edge[0] = True
        is_edge[-1] = True
        keep = is_edge | (sums > 1)
        idx = np.flatnonzero(keep)
        return pa.table(
            {
                key: batch[key].take(pa.array(starts[idx])),
                count_name: pa.array(sums[idx], pa.int64()),
                "__edge": pa.array(is_edge[idx]),
                "__h": pa.array(h[starts[idx]], pa.int64()),
            }
        )

    # After the range sort equal hashes are contiguous, so interior
    # dup groups are globally exact — they STAY in the Dataset (the
    # result can itself be huge on a duplicate-heavy input). Only
    # the ≤2 EDGE groups per block route through the driver (O(#
    # blocks), no rare-duplicates assumption), get count-merged
    # across block boundaries, and re-enter via union.
    marked = sorted_parts.map_batches(
        block_dups, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    interior = marked.map_batches(
        lambda t: t.filter(
            pc.and_(pc.invert(t["__edge"]), pc.greater(t[count_name], 1))
        ).select([key, count_name]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    edges = marked.map_batches(
        lambda t: t.filter(t["__edge"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).to_pandas()
    if len(edges):
        eg = edges.groupby("__h", as_index=False).agg(
            **{key: (key, "first"), count_name: (count_name, "sum")}
        )
        eg = eg[eg[count_name] > 1][[key, count_name]]
    else:
        import pandas as pd

        eg = pd.DataFrame({key: [], count_name: []})
    edge_tab = pa.table(
        {
            key: pa.array(eg[key].tolist(), pa.string()),
            count_name: pa.array([int(x) for x in eg[count_name].tolist()], pa.int64()),
        }
    )
    return interior.union(rd.from_arrow(edge_tab))


def uniqueness_violations(
    ds: "ray.data.Dataset", key: str, check_name: str = "UniqueKeyDetector"
) -> "ray.data.Dataset":
    """Duplicate keys rendered as violation rows (FIXTURES.md F4).
    Uses the hashed shuffle (int sort keys) — the suite's url check."""
    from ..schema import violations_table

    dups = duplicate_keys_hashed(ds, key)

    def render(t: pa.Table) -> pa.Table:
        return violations_table(
            check=check_name,
            message=f"duplicate value for unique key '{key}'",
            keys=t[key].to_pylist(),
            affected_paths=[key],
            affected_values=[[str(k), str(n)] for k, n in zip(t[key].to_pylist(), t["n"].to_pylist())],
            expected='{"count": 1}',
        )

    return dups.map_batches(render, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

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
    """Key tuples occurring more than once, with their counts.

    Single INTEGER key: per-block ``np.unique`` partials + ONE
    bounded ``groupby(key % n_buckets)`` pandas fold — Ray's
    ``groupby().aggregate()`` is 5-8× slower than a keyed map_groups
    for mostly-unique keys (CLAUDE.md). Multi-column / non-int keys
    keep the generic pre-aggregated count shuffle."""
    sch = ds.schema()
    if len(keys) == 1 and sch is not None and pa.types.is_integer(
        sch.base_schema.field(keys[0]).type
    ):
        return _duplicate_int_keys(ds, keys[0], count_name)
    counts = grouped_counts(ds, keys, out_name=count_name)
    return counts.map_batches(
        lambda t: t.filter(pc.greater(t[count_name], 1)),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )


def _duplicate_int_keys(
    ds: "ray.data.Dataset", key: str, count_name: str, n_buckets: int | None = None
) -> "ray.data.Dataset":
    import numpy as np
    import pandas as pd

    if n_buckets is None:
        try:
            n_buckets = max(64, ds.num_blocks() // 4)
        except Exception:
            n_buckets = 256

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        null_n = col.null_count
        nn = col.drop_null().cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(nn, return_counts=True)
        bk = (uniq % n_buckets + n_buckets) % n_buckets
        isnull = np.zeros(len(uniq), dtype=bool)
        if null_n:
            # NULL is one key group (SQL GROUP BY semantics). It
            # rides as (key=0, __isnull=True) — a real null in the
            # int64 column would float-promote every key > 2^53 in
            # the pandas fold (CLAUDE.md exactness trap).
            uniq = np.concatenate([uniq, [0]])
            counts = np.concatenate([counts, [null_n]])
            bk = np.concatenate([bk, [0]])
            isnull = np.concatenate([isnull, [True]])
        return pa.table(
            {key: pa.array(uniq, pa.int64()),
             "__pn": pa.array(counts.astype(np.int64)),
             "__isnull": pa.array(isnull),
             "__b": pa.array(bk.astype(np.int32))}
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        agg = (
            g.groupby([key, "__isnull"], sort=False)["__pn"].sum().reset_index()
        )
        agg = agg[agg["__pn"] > 1]
        nulls = agg["__isnull"].to_numpy(bool)
        return pa.table(
            {key: pa.array(agg[key].to_numpy(np.int64), pa.int64(),
                           mask=nulls),
             count_name: pa.array(agg["__pn"].to_numpy(np.int64))}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("__b")
        .map_groups(fold, batch_format="pandas")
    )


def duplicate_keys_hashed(
    ds: "ray.data.Dataset", key: str, count_name: str = "n", n_buckets: int | None = None
) -> "ray.data.Dataset":
    """duplicate_keys for a high-cardinality STRING key.

    Shuffles a 64-bit hash of the key instead of the string: one
    per-block ``np.unique`` partial (hash, first-string, count),
    then ONE bounded-key shuffle — ``groupby(hash % n_buckets)``
    with a vectorized pandas fold per bucket. Each bucket holds
    ~1/n_buckets of the distinct keys, so duplicate groups stay
    distributed (no driver merge, no rare-duplicates assumption);
    size ``n_buckets`` ≳ dataset_bytes / target_partition_bytes at
    scale. Measured vs the previous range-sort + edge-merge design
    on the 400k-row bench input: 4.2 s vs 7.5 s, identical output.
    Collision odds at 10^12 keys ≈ 3e-5 per run, and a collision
    only risks one false duplicate pair."""
    import numpy as np
    import pandas as pd

    from ..functions.text import flat_utf8, token_hashes

    if n_buckets is None:
        # size buckets so one bucket's distinct-key partials ≈ a few
        # input blocks — per-task memory stays block-sized at any
        # dataset size (a fixed count would concentrate 1/N of a
        # 10^12-key table in one pandas frame)
        try:
            n_buckets = max(64, ds.num_blocks() // 4)
        except Exception:
            n_buckets = 256

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
                "__b": pa.array((uniq % n_buckets + n_buckets) % n_buckets, pa.int32()),
            }
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        agg = (
            g.groupby("__h", sort=False)
            .agg(**{key: (key, "first"), count_name: ("__pn", "sum")})
            .reset_index()
        )
        agg = agg[agg[count_name] > 1]
        return pa.table(
            {
                # from_pandas keeps null sample keys null (astype(str)
                # would coin the literal "None")
                key: pa.array(agg[key], pa.string(), from_pandas=True),
                count_name: pa.array(agg[count_name].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("__b")
        .map_groups(fold, batch_format="pandas")
    )


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

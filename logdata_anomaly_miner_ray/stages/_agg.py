"""Shared pre-aggregated groupby helpers.

Every keyed check funnels through this pattern: combine inside each
Arrow block with ``pyarrow.Table.group_by`` (a C++ hash aggregate),
then shuffle only the per-block partials through
``Dataset.groupby(...).aggregate(...)``. For a uniqueness check on
``url`` over 10^12 rows this moves (#blocks × #distinct-per-block)
partial rows instead of every row — the hot-key problem AMiner never
has (single process, reference aminer/AnalysisChild.py:300-326)
becomes a bounded shuffle: a key occurs at most once per block in the
partials, so the reduce fan-in per key is ≤ #blocks and no explicit
salting is required for counts/min/max/sum (the combiner IS the salt).
Explicit salting remains necessary only for holistic per-key work
(``map_groups`` over raw rows), noted where used.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def grouped_counts(
    ds: "ray.data.Dataset", keys: list[str], out_name: str = "n"
) -> "ray.data.Dataset":
    """groupby(keys).count() with per-block combining."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return t.rename_columns(keys + ["__pn"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    out = partials.groupby(keys).aggregate(Sum("__pn", alias_name=out_name))
    return out


def grouped_min_max(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    min_name: str = "min_value",
    max_name: str = "max_value",
    count_name: str | None = None,
) -> "ray.data.Dataset":
    """groupby(keys) → min/max(value) with per-block combining —
    the learn phase of ValueRangeDetector (reference:
    aminer/analysis/ValueRangeDetector.py:151-161) for all keys at
    once."""

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select(keys + [value_col])
            .group_by(keys)
            .aggregate([(value_col, "min"), (value_col, "max"), ([], "count_all")])
        )
        return t.rename_columns(keys + ["__mn", "__mx", "__pn"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    aggs = [Min("__mn", alias_name=min_name), Max("__mx", alias_name=max_name)]
    if count_name:
        aggs.append(Sum("__pn", alias_name=count_name))
    return partials.groupby(keys).aggregate(*aggs)


def grouped_span_count(
    ds: "ray.data.Dataset",
    keys: list[str],
    ts_col: str,
    first_name: str = "first_ts",
    last_name: str = "last_ts",
    count_name: str = "n",
) -> "ray.data.Dataset":
    """groupby(keys) → (min ts, max ts, count) — the
    EnhancedNewMatchPathValueComboDetector occurrence metadata
    (reference:
    aminer/analysis/EnhancedNewMatchPathValueComboDetector.py:27-228)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select(keys + [ts_col])
            .group_by(keys)
            .aggregate([(ts_col, "min"), (ts_col, "max"), ([], "count_all")])
        )
        return t.rename_columns(keys + ["__mn", "__mx", "__pn"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return partials.groupby(keys).aggregate(
        Min("__mn", alias_name=first_name),
        Max("__mx", alias_name=last_name),
        Sum("__pn", alias_name=count_name),
    )


def salted_grouped_counts(
    ds: "ray.data.Dataset",
    keys: list[str],
    salt_buckets: int = 16,
    out_name: str = "n",
) -> "ray.data.Dataset":
    """Explicit two-stage salted groupby-count (north rule: 'skew
    from hot domains is handled by salted repartitioning before the
    groupby-aggregate shuffle').

    Stage 1 groups by (key, salt) where salt = row_position %
    salt_buckets — a hot key's rows land in ``salt_buckets``
    different reduce groups instead of one; stage 2 collapses the
    ≤ salt_buckets partial rows per key. Use when the per-block
    combiner of ``grouped_counts`` is NOT applicable (e.g. the
    aggregation state per key is too large to keep one per block) —
    for plain counts/min/max the combiner already bounds fan-in and
    this explicit salt is redundant."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        salt = pa.array(
            (np.arange(batch.num_rows, dtype=np.int64) % salt_buckets), pa.int64()
        )
        t = batch.select(keys).append_column("__salt", salt)
        t = t.group_by(keys + ["__salt"]).aggregate([([], "count_all")])
        return t.rename_columns(keys + ["__salt", "__pn"])

    stage1 = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(keys + ["__salt"])
        .aggregate(Sum("__pn", alias_name="__sn"))
    )
    return stage1.groupby(keys).aggregate(Sum("__sn", alias_name=out_name))


def coarse_grouped(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    per_bucket,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-id semantics at bounded group count: shuffle by
    ``hash(id) mod n_buckets`` and run ``per_bucket`` once per
    bucket. Thousands/millions of tiny per-id ``map_groups`` calls
    are pure Ray overhead (CLAUDE.md); a vectorized bucket function
    that respects per-id boundaries (sort by id inside, adjacency
    masks) gets the same answer with ≤ n_buckets well-sized groups.
    Bucket assignment uses pandas' fixed-key siphash — deterministic
    across workers, no PYTHONHASHSEED dependence."""
    import numpy as np
    import pandas as pd

    def add_bk(df: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(df), dtype=np.uint64)
        for c in id_cols:
            h = h * np.uint64(0x100000001B3) ^ pd.util.hash_pandas_object(
                df[c], index=False
            ).to_numpy()
        df = df.copy()
        df["__bk"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def wrapped(g: pd.DataFrame) -> pd.DataFrame:
        return per_bucket(g.drop(columns="__bk"))

    from ._shuffle import shuffle_parallelism

    return (
        ds.map_batches(add_bk, batch_format="pandas", batch_size=None)
        # partials entering here are narrow/bounded by contract; size
        # the groupby's shuffle matrix to the CLUSTER, not the input
        # block count (256 tiny partial blocks would otherwise cost
        # seconds of pure scheduling — the round-4 shuffle-matrix fix)
        .repartition(shuffle_parallelism())
        .groupby("__bk")
        .map_groups(wrapped, batch_format="pandas")
    )


def bounded_collect(
    out_ds: "ray.data.Dataset", max_rows: int, name: str, scale_path: str
):
    """Guarded driver gather for the EXACT-replay parity tiers: the
    1:1 reference-lifecycle folds collect a (small) result or replay
    table to the driver — this materializes + counts FIRST and
    refuses past ``max_rows``, so a parity tier can never be invoked
    accidentally at corpus scale; the error names the distributed
    scale path to use instead. (Counting the materialized dataset
    re-reads blocks, not the pipeline — no recompute.)"""
    import pandas as pd  # noqa: F401 — return type

    m = out_ds.materialize()
    n = m.count()
    if n > max_rows:
        raise ValueError(
            f"{name}: driver-bound replay table has {n} rows > "
            f"max_result_rows={max_rows}; at corpus scale use the "
            f"distributed path ({scale_path}) or raise the cap explicitly"
        )
    return m.to_pandas()


def distinct_rows(ds: "ray.data.Dataset", keys: list[str]) -> "ray.data.Dataset":
    """Distinct key tuples with per-block combining (no counts)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys).group_by(keys).aggregate([])
        return t

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return partials.groupby(keys).aggregate(Count(alias_name="__c")).drop_columns(["__c"])


def topk_per_group(
    ds: "ray.data.Dataset",
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: tuple = (),
    ascending: bool = False,
    n_buckets: int = 64,
    rank_col: str | None = None,
) -> "ray.data.Dataset":
    """Top-k rows per group (SQL ``row_number() OVER (PARTITION BY
    ... ORDER BY ...) <= k``) with NO global sort: a per-block
    partial keeps each block's local top-k per group (output bounded
    by k x groups-in-block — top-k is a mergeable semigroup), then
    ``coarse_grouped`` folds the partials under a bounded bucket key.
    Ties on ``order_col`` break by ``tiebreak_cols`` ascending, so
    the result is deterministic and SQL-reproducible. ``rank_col``
    optionally appends the 1-based per-group row_number, computed in
    the FINAL fold where every surviving row of a group is present
    (a downstream per-block rank would be wrong if map_groups split a
    group's output across blocks)."""
    import pandas as pd

    sort_cols = [order_col, *tiebreak_cols]
    asc = [ascending] + [True] * len(tiebreak_cols)

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return (
            df.sort_values(sort_cols, ascending=asc, kind="mergesort")
            .groupby(list(group_cols), sort=False)
            .head(k)
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = head_k(df)
        if rank_col is not None:
            out = out.copy()
            out[rank_col] = (
                out.groupby(list(group_cols), sort=False).cumcount() + 1
            ).astype("int64")
        return out

    partials = ds.map_batches(head_k, batch_format="pandas", batch_size=None)
    return coarse_grouped(
        partials, list(group_cols),
        final if rank_col is not None else head_k, n_buckets=n_buckets)

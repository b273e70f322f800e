"""Per-column statistics: count / nulls / min / max / moments /
distinct sketch / quantile digest — one block pass, tiny reduce.

Recasts AMiner's per-path bookkeeping (ParserCount reference:
aminer/analysis/ParserCount.py:27-134; histogram reports reference:
aminer/analysis/HistogramAnalysis.py:257-448) as a single
``map_batches`` partial per block followed by a driver-side merge of
small mergeable states — NO shuffle of data rows at all. At 100 TB
the reduce input is (#blocks × #columns) tiny states, so the wide
input never moves.
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np
import pyarrow as pa

import ray.data

from ..state.sketches import HyperLogLog, Moments, TDigest, hash_int64, hash_strings


class _ColPartial:
    __slots__ = ("moments", "hll", "tdigest")

    def __init__(self, moments: Moments, hll: HyperLogLog, tdigest: TDigest | None):
        self.moments = moments
        self.hll = hll
        self.tdigest = tdigest

    def merge(self, o: "_ColPartial") -> "_ColPartial":
        self.moments.merge(o.moments)
        self.hll.merge(o.hll)
        if self.tdigest is not None and o.tdigest is not None:
            self.tdigest.merge(o.tdigest)
        return self


def _partial_for_column(arr: pa.ChunkedArray, with_quantiles: bool) -> _ColPartial:
    n_null = arr.null_count
    t = arr.type
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        vals = arr.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        m = Moments.from_array(vals, n_null=n_null)
        hll = HyperLogLog().add_hashes(hash_int64(vals.view(np.uint64)))
        td = TDigest.from_array(vals) if with_quantiles else None
        return _ColPartial(m, hll, td)
    if pa.types.is_timestamp(t):
        vals = arr.drop_null().cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = Moments.from_array(vals.astype(np.float64), n_null=n_null)
        hll = HyperLogLog().add_hashes(hash_int64(vals))
        td = TDigest.from_array(vals.astype(np.float64)) if with_quantiles else None
        return _ColPartial(m, hll, td)
    # strings / binary: moments over byte length, HLL over values
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        import pyarrow.compute as pc

        from ..functions.text import flat_utf8, token_hashes

        nonnull = arr.drop_null()
        lens = pc.binary_length(nonnull).to_numpy(zero_copy_only=False)
        m = Moments.from_array(lens.astype(np.float64), n_null=n_null)
        # vectorized whole-row polynomial hashes straight off the
        # flat utf-8 buffer — no per-row Python objects
        data, off = flat_utf8(nonnull)
        hll = HyperLogLog().add_hashes(token_hashes(data, off[:-1], off[1:]))
        return _ColPartial(m, hll, None)
    # other types: count only
    return _ColPartial(Moments(n=len(arr) - n_null, n_null=n_null), HyperLogLog(), None)


class ColumnStatsPartials:
    """map_batches callable: one serialized partial-state row per
    (block, column). Stateless — plain function semantics, but kept a
    class so the column list is bound once."""

    def __init__(self, columns: list[str] | None = None, with_quantiles: bool = True):
        self.columns = columns
        self.with_quantiles = with_quantiles

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.columns or batch.column_names
        names, blobs = [], []
        for c in cols:
            if c not in batch.column_names:
                continue
            p = _partial_for_column(batch.column(c), self.with_quantiles)
            names.append(c)
            blobs.append(pickle.dumps(p, protocol=5))
        return pa.table(
            {"column": pa.array(names, pa.string()), "state": pa.array(blobs, pa.binary())}
        )


def merge_column_partials(partials: pa.Table) -> dict[str, _ColPartial]:
    out: dict[str, _ColPartial] = {}
    for name, blob in zip(
        partials.column("column").to_pylist(), partials.column("state").to_pylist()
    ):
        p = pickle.loads(blob)
        if name in out:
            out[name].merge(p)
        else:
            out[name] = p
    return out


def column_stats(
    ds: "ray.data.Dataset",
    columns: list[str] | None = None,
    with_quantiles: bool = True,
    round_to: int | None = None,
) -> pa.Table:
    """Small result table: one row per column with
    (column, n, n_null, min, max, mean, std, approx_distinct,
    p50, p95). The only materialized object is the tiny partials
    table — the input streams through once."""
    partials = ds.map_batches(
        ColumnStatsPartials(columns, with_quantiles),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    merged = merge_column_partials(_collect_arrow(partials))
    rows: dict[str, list[Any]] = {
        "column": [], "n": [], "n_null": [], "min": [], "max": [],
        "mean": [], "std": [], "approx_distinct": [], "p50": [], "p95": [],
    }
    cols_order = columns or sorted(merged.keys())
    for c in cols_order:
        if c not in merged:
            continue
        p = merged[c]
        m = p.moments
        rows["column"].append(c)
        rows["n"].append(m.n)
        rows["n_null"].append(m.n_null)
        def _r(x):
            if x is None or not np.isfinite(x):
                return None
            return round(float(x), round_to) if round_to is not None else float(x)
        rows["min"].append(_r(m.min if m.n else None))
        rows["max"].append(_r(m.max if m.n else None))
        rows["mean"].append(_r(m.mean if m.n else None))
        rows["std"].append(_r(m.std if m.n else None))
        rows["approx_distinct"].append(int(round(p.hll.estimate())) if m.n else 0)
        if p.tdigest is not None and m.n:
            q = p.tdigest.quantile([0.5, 0.95])
            rows["p50"].append(_r(q[0]))
            rows["p95"].append(_r(q[1]))
        else:
            rows["p50"].append(None)
            rows["p95"].append(None)
    return pa.table(rows)


def exact_distinct_counts(
    ds: "ray.data.Dataset", columns: list[str]
) -> dict[str, int]:
    """EXACT distinct count per column, at shuffle cost of 16-byte
    hashes (never the values): per block, the set of md5 digests per
    column; one distinct + one count groupby over (column, digest).
    Nulls are excluded (SQL count(DISTINCT) semantics). md5 collisions
    are negligible even at 10^12 rows (~n²/2^129). Complements the
    HLL estimate in ``column_stats`` — use this to bound the sketch
    error, or when exactness is required."""
    import pyarrow.compute as pc

    from ..functions.hashing import md5_hex
    from ._agg import distinct_rows, grouped_counts

    def partial(batch: pa.Table) -> pa.Table:
        out_c: list[str] = []
        out_h: list[str] = []
        for c in columns:
            if c not in batch.column_names:
                continue
            arr = batch.column(c)
            if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
                    or pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)):
                arr = pc.cast(arr, pa.string())
            hs = set(md5_hex(arr.drop_null()))
            out_c.extend([c] * len(hs))
            out_h.extend(hs)
        return pa.table(
            {"column": pa.array(out_c, pa.string()), "h": pa.array(out_h, pa.string())}
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    d = distinct_rows(partials, ["column", "h"])
    counts = grouped_counts(d, ["column"], out_name="n_distinct").to_pandas()
    return dict(zip(counts["column"], counts["n_distinct"].astype(int)))


def _collect_arrow(ds: "ray.data.Dataset") -> pa.Table:
    """Materialize a SMALL dataset to one Arrow table (driver side)."""
    import ray

    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows]
    if not tables:
        return pa.table({"column": pa.array([], pa.string()), "state": pa.array([], pa.binary())})
    return pa.concat_tables(tables, promote_options="permissive")

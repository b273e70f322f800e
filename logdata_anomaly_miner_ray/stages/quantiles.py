"""EXACT distributed quantiles (order statistics) without a global
sort.

`Dataset.sort` is an all-to-all exchange of every row; an exact
quantile needs only the k-th order statistic. This stage computes it
with bounded passes:

pass A — per-block (count, min, max, t-digest) partials, driver
merge (#blocks small blobs, the fit-pass pattern). The digest gives
an approximate VALUE WINDOW around each requested quantile.

count/refine loop — one ``map_batches`` per round computes, for
every unresolved quantile at once, ``n < lo`` and ``n in [lo, hi]``
plus the data min/max inside each window, via per-block ``np.sort``
+ ``searchsorted`` (vectorized over all windows). If the target
rank falls outside a window, the window widens (digest quantile at
exponentially growing offsets, clamped to the exact global
min/max); if the window holds more than ``max_gather`` rows it
tightens to its data extremes and bisects — duplicate-heavy
windows collapse in O(1) rounds because a single-distinct-value
window is detected directly. Every round is count-only — tiny
result rows, no data movement. The rank-below count is RECORDED at
resolution time, so no extra pass is needed before the gather.

final gather — one pass collects the (≤ max_gather per quantile)
values inside each resolved window; the exact k-th element is
selected driver-side with ``np.partition``. The answer is an INPUT
value — integer columns stay in int64 end-to-end (no 2^53 float
mantissa cliff), float columns stay float64 — matching DuckDB
``quantile_disc``: index = max(0, ceil(q*n) - 1) into the sorted
non-null column, computed in exact Fraction arithmetic.

Typical cost: pass A + 1 count round + 1 gather = 3 streaming passes
regardless of data size; pathological duplicate-heavy columns add
count-only rounds (log of window width).

Reference: AMiner's EventTypeDetector keeps full sorted value lists
per path for its quantile-based GoF tests
(analysis/EventTypeDetector.py value lists; VariableTypeDetector.py
uses them); that is per-process exact — this is the cluster-scale
exact recast. SURVEY.md §2.7.
"""

from __future__ import annotations

import pickle
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ..state.sketches import TDigest


def _col_values(batch: pa.Table, col: str) -> np.ndarray:
    """Non-null values in the column's NATIVE numpy dtype (int64
    stays int64 — float promotion would corrupt magnitudes > 2^53)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        return arr.drop_null().cast(pa.int64()).to_numpy(zero_copy_only=False)
    v = arr.to_numpy(zero_copy_only=False)
    if v.dtype == object:
        v = v.astype(np.float64)
    mask = pd.isna(v)
    return v[~mask]


def exact_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: list[float | Fraction],
    max_gather: int = 1_000_000,
    max_rounds: int = 64,
    block_card_cap: int = 4096,
    merged_card_cap: int = 262_144,
) -> pd.DataFrame:
    """(q, value) frame with the EXACT discrete quantile of ``col``
    for each q in ``qs`` (nulls ignored, DuckDB quantile_disc
    semantics). ``value`` is int64 for integer columns, float64
    otherwise.

    Pass-count fast paths (both exact, both bounded):

    - LOW CARDINALITY: each pass-A partial also carries the block's
      (value, count) table when it has ≤ ``block_card_cap`` distinct
      values; if no block overflows and the merged table stays under
      ``merged_card_cap``, every quantile is a cumulative-count rank
      lookup — ONE pass total. Any overflow falls through with only
      the digest kept (the extra partial bytes are bounded per
      block, so the fallback costs nothing extra).
    - SMALL N: when the whole column has ≤ ``max_gather`` non-null
      rows (the gather bound the caller already accepted), skip the
      count/refine rounds and gather the single [min, max] window
      once — TWO passes, every quantile selected from the same pool.
    """
    qs_f = [Fraction(q).limit_denominator(10**9) if not isinstance(q, Fraction) else q for q in qs]

    # ---- pass A: digest partials (digest is float64 and only ever
    # steers windows; exact min/max ride as native scalars) ----
    def partial(batch: pa.Table) -> pa.Table:
        v = _col_values(batch, col)
        vc = None
        if len(v):
            uniq, cnts = np.unique(v, return_counts=True)
            if len(uniq) <= block_card_cap:
                vc = (uniq, cnts)
        blob = pickle.dumps(
            {
                "n": int(len(v)),
                "min": v.min().item() if len(v) else None,
                "max": v.max().item() if len(v) else None,
                "is_int": v.dtype.kind in "iu",
                "digest": TDigest.from_array(v.astype(np.float64)) if len(v) else None,
                "vc": vc,
            },
            protocol=5,
        )
        return pa.table({"b": pa.array([blob], pa.binary())})

    n_total = 0
    gmin = None
    gmax = None
    is_int = True
    digest = TDigest()
    vc_acc: dict | None = {}  # value -> count; None once overflowed
    for b in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for blob in b["b"].to_pylist():
            p = pickle.loads(blob)
            n_total += p["n"]
            if p["n"]:
                gmin = p["min"] if gmin is None else min(gmin, p["min"])
                gmax = p["max"] if gmax is None else max(gmax, p["max"])
                is_int = is_int and p["is_int"]
                if vc_acc is not None:
                    if p["vc"] is None:
                        vc_acc = None
                    else:
                        for u, c in zip(p["vc"][0].tolist(), p["vc"][1].tolist()):
                            vc_acc[u] = vc_acc.get(u, 0) + c
                        if len(vc_acc) > merged_card_cap:
                            vc_acc = None
            if p["digest"] is not None:
                digest.merge(p["digest"])

    dtype = np.int64 if is_int else np.float64
    out_schema = {"q": np.float64, "value": dtype}
    if n_total == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in out_schema.items()})

    def _to_native(x: float, side: str):
        """Digest float → native window boundary, clamped to the
        exact global extremes (floor/ceil keeps int windows a
        superset of the float window)."""
        if is_int:
            x = int(np.floor(x)) if side == "lo" else int(np.ceil(x))
        return min(max(x, gmin), gmax)

    # target 0-based ranks, exact rational arithmetic
    ks = [max(0, -(-(q.numerator * n_total) // q.denominator) - 1) for q in qs_f]
    ks = [min(k, n_total - 1) for k in ks]

    # ---- low-cardinality fast path: ONE pass, rank = cumulative
    # count lookup in the merged (value, count) table ----
    if vc_acc is not None:
        va = np.sort(np.array(list(vc_acc.keys()), dtype=dtype))
        cs = np.cumsum(np.array([vc_acc[v.item()] for v in va], dtype=np.int64))
        idx = np.searchsorted(cs, np.array(ks, dtype=np.int64) + 1, side="left")
        return pd.DataFrame(
            {"q": np.array([float(q) for q in qs_f]), "value": va[idx]}
        )

    # ---- small-n fast path: the whole column fits the gather bound;
    # ONE shared [gmin, gmax] gather answers every quantile ----
    if n_total <= max_gather:
        pools: list[np.ndarray] = []

        def gather_all(batch: pa.Table) -> pa.Table:
            v = _col_values(batch, col)
            return pa.table({"v": pa.array(v.astype(dtype))})

        # materialize before pulling: raw-value gathers are MB-scale
        # and iter_batches on an unmaterialized pipeline drains at
        # driver pace (~11 MB/s measured; CLAUDE.md) — materialize
        # runs the projection cluster-parallel, the drain is zero-copy
        for b in ds.map_batches(
            gather_all, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).materialize().iter_batches(batch_format="pyarrow"):
            arr = b["v"].to_numpy()
            if len(arr):
                pools.append(arr)
        vals = np.concatenate(pools) if pools else np.zeros(0, dtype)
        vals.sort()
        return pd.DataFrame(
            {"q": np.array([float(q) for q in qs_f]),
             "value": vals[np.array(ks, dtype=np.int64)]}
        )

    # per-quantile window state (native dtype)
    nq = len(ks)
    lo = np.empty(nq, dtype=dtype)
    hi = np.empty(nq, dtype=dtype)
    widen = np.ones(nq)
    for i, q in enumerate(qs_f):
        eps = 0.005
        lo[i] = _to_native(float(digest.quantile(max(0.0, float(q) - eps))), "lo")
        hi[i] = _to_native(float(digest.quantile(min(1.0, float(q) + eps))), "hi")
    resolved = np.zeros(nq, dtype=bool)
    res_lt = np.zeros(nq, dtype=np.int64)  # n<lo recorded at resolution
    answers: dict[int, object] = {}

    def count_pass(lo_v: np.ndarray, hi_v: np.ndarray):
        """Per window: global (#rows < lo, #rows in [lo,hi], data
        min/max inside the window) — one streaming pass for ALL
        windows at once. Sentinel-free: a per-block ``has`` flag
        masks the extremes (native ints have no inf)."""
        lo_t, hi_t = lo_v.copy(), hi_v.copy()

        def cnt(batch: pa.Table) -> pa.Table:
            v = np.sort(_col_values(batch, col))
            a = np.searchsorted(v, lo_t, side="left")
            b2 = np.searchsorted(v, hi_t, side="right")
            has = b2 > a
            if len(v):
                wmin = np.where(has, v[np.minimum(a, len(v) - 1)], lo_t)
                wmax = np.where(has, v[np.maximum(b2 - 1, 0)], hi_t)
            else:
                has = np.zeros(len(lo_t), dtype=bool)
                wmin, wmax = lo_t, hi_t
            return pa.table(
                {"i": pa.array(np.arange(len(lo_t)), pa.int64()),
                 "lt": pa.array(a.astype(np.int64)),
                 "inw": pa.array((b2 - a).astype(np.int64)),
                 "has": pa.array(has),
                 "wmin": pa.array(wmin.astype(dtype)),
                 "wmax": pa.array(wmax.astype(dtype))}
            )

        tot_lt = np.zeros(len(lo_t), dtype=np.int64)
        tot_in = np.zeros(len(lo_t), dtype=np.int64)
        g_has = np.zeros(len(lo_t), dtype=bool)
        g_wmin = hi_t.copy()  # any in-window value is <= hi
        g_wmax = lo_t.copy()
        for b in ds.map_batches(
            cnt, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow"):
            idx = b["i"].to_numpy()
            np.add.at(tot_lt, idx, b["lt"].to_numpy())
            np.add.at(tot_in, idx, b["inw"].to_numpy())
            has = b["has"].to_numpy(zero_copy_only=False)
            hidx = idx[has]
            np.minimum.at(g_wmin, hidx, b["wmin"].to_numpy()[has])
            np.maximum.at(g_wmax, hidx, b["wmax"].to_numpy()[has])
            g_has[hidx] = True
        return tot_lt, tot_in, g_wmin, g_wmax

    def _step_up(x):
        return x + 1 if is_int else np.nextafter(x, np.inf)

    # invariant once ``bracketed``: the true rank lies in
    # [lo, hi_backup]; ``hi`` may be a bisection trial inside it
    bracketed = np.zeros(nq, dtype=bool)
    hi_backup = hi.copy()
    for _ in range(max_rounds):
        if resolved.all():
            break
        n_lt, n_in, wmin, wmax = count_pass(lo, hi)
        for i, k in enumerate(ks):
            if resolved[i]:
                continue
            contains = n_lt[i] <= k < n_lt[i] + n_in[i]
            if not contains:
                if bracketed[i]:
                    # a bisection trial cut below the rank: move to
                    # the upper half of the backup bracket
                    lo[i] = _step_up(hi[i])
                    hi[i] = hi_backup[i]
                else:  # digest window missed — widen exponentially
                    widen[i] *= 4.0
                    eps = 0.005 * widen[i]
                    q = float(qs_f[i])
                    lo[i] = _to_native(float(digest.quantile(max(0.0, q - eps))), "lo")
                    hi[i] = _to_native(float(digest.quantile(min(1.0, q + eps))), "hi")
                    if eps >= 1.0:
                        lo[i], hi[i] = gmin, gmax  # must contain k
                    hi_backup[i] = hi[i]
                continue
            bracketed[i] = True
            # tighten to the DATA extremes inside the window — this is
            # what makes duplicate-heavy windows collapse in O(1)
            # rounds instead of O(width) midpoint halvings. rows<lo
            # is unchanged by the tighten (no data in [lo, wmin)).
            lo[i], hi[i] = wmin[i], wmax[i]
            hi_backup[i] = max(hi_backup[i], hi[i])
            if lo[i] == hi[i]:
                answers[i] = lo[i].item()  # single distinct value holds the rank
                resolved[i] = True
            elif n_in[i] <= max_gather:
                res_lt[i] = n_lt[i]
                resolved[i] = True  # gatherable; rank base recorded
            else:  # bisect (duplicate-heavy window)
                hi_backup[i] = hi[i]
                mid = lo[i] + (hi[i] - lo[i]) // 2 if is_int else (lo[i] + hi[i]) / 2.0
                if mid <= lo[i] or mid >= hi[i]:  # adjacent values:
                    hi[i] = lo[i]  # window is {lo, hi}; test lo alone
                else:
                    hi[i] = mid
    if not resolved.all():
        # NOT for/else: resolution in the final allowed round must
        # count as convergence
        raise RuntimeError("exact_quantiles failed to converge; raise max_gather")

    # gather the resolved-but-unanswered windows in ONE final pass
    # (their lo/hi and recorded res_lt are frozen at resolution)
    pend = [i for i in range(nq) if i not in answers]
    if pend:
        lo_p = lo[pend]; hi_p = hi[pend]

        def gather(batch: pa.Table) -> pa.Table:
            v = np.sort(_col_values(batch, col))
            outs_i, outs_v = [], []
            for j in range(len(lo_p)):
                a = np.searchsorted(v, lo_p[j], side="left")
                b2 = np.searchsorted(v, hi_p[j], side="right")
                outs_i.append(np.full(b2 - a, j, dtype=np.int64))
                outs_v.append(v[a:b2])
            return pa.table(
                {"i": pa.array(np.concatenate(outs_i) if outs_i else np.zeros(0, np.int64)),
                 "v": pa.array(
                     (np.concatenate(outs_v) if outs_v else np.zeros(0, dtype)).astype(dtype))}
            )

        pools: dict[int, list[np.ndarray]] = {j: [] for j in range(len(pend))}
        for b in ds.map_batches(
            gather, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow"):
            idx = b["i"].to_numpy()
            vals = b["v"].to_numpy()
            for j in range(len(pend)):
                sel = vals[idx == j]
                if len(sel):
                    pools[j].append(sel)
        for j, i in enumerate(pend):
            vals = np.concatenate(pools[j]) if pools[j] else np.zeros(0, dtype)
            r = ks[i] - int(res_lt[i])
            if not (0 <= r < len(vals)):
                raise RuntimeError("rank drifted out of gathered window")
            answers[i] = np.partition(vals, r)[r].item()

    return pd.DataFrame(
        {"q": np.array([float(q) for q in qs_f]),
         "value": np.array([answers[i] for i in range(nq)], dtype=dtype)}
    )


def grouped_quantiles(
    ds: "ray.data.Dataset",
    group_cols: list[str],
    val_col: str,
    qs: tuple = (0.25, 0.5, 0.75),
    block_card_cap: int = 200_000,
) -> "ray.data.Dataset":
    """EXACT per-group quantiles (DuckDB ``quantile_disc``: index =
    max(0, ceil(q·n) - 1) into the sorted non-null values, ranks in
    exact Fraction arithmetic) — the grouped counterpart of
    ``exact_quantiles``' low-cardinality tier.

    One corpus pass emits per-block (group, value, count) partials
    via Arrow's C++ group_by (bounded by the block's distinct
    (group, value) pairs, guarded by ``block_card_cap`` — a HARD
    error, not a silent fallback: above it, use the digest-window
    machinery per group). A single composite-key groupby merges the
    partials, and a second tiny groupby per group selects every
    requested quantile from the cumulative counts. Nothing
    corpus-sized ever gathers; returns one row per (group, q):
    ``(*group_cols, qe2, n_vals, value)`` with qe2 = q·100 as int.
    """
    import pyarrow.compute as pc

    import math

    qs_f = [Fraction(q).limit_denominator(10**9) for q in qs]
    qe2 = [int(q * 100) for q in qs_f]
    SEP = "\x1f"

    def part(batch: pa.Table) -> pa.Table:
        t = batch.select(group_cols + [val_col])
        t = t.filter(pc.is_valid(t[val_col]))
        agg = t.group_by(group_cols + [val_col]).aggregate([([], "count_all")])
        if agg.num_rows > block_card_cap:
            raise ValueError(
                f"grouped_quantiles: block (group, value) cardinality "
                f"{agg.num_rows} exceeds block_card_cap={block_card_cap}; "
                "this tier is for bounded value domains — use the "
                "digest-window exact_quantiles per group instead")
        key = agg[group_cols[0]].cast(pa.string())
        for g in group_cols[1:]:
            key = pc.binary_join_element_wise(
                key, agg[g].cast(pa.string()), SEP)
        return pa.table({
            "gkey": key,
            "v": agg[val_col],
            "cnt": agg.column(len(group_cols) + 1).cast(pa.int64()),
        })

    from ray.data.aggregate import Sum

    from ._shuffle import shuffle_parallelism

    merged = ds.map_batches(
        part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).repartition(shuffle_parallelism()).groupby(["gkey", "v"]).aggregate(
        Sum("cnt", alias_name="cnt"))

    def select(g: pd.DataFrame) -> pa.Table:
        order = np.argsort(g["v"].to_numpy(), kind="mergesort")
        vals = g["v"].to_numpy()[order]
        cnts = g["cnt"].to_numpy(np.int64)[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        rows_v, rows_q = [], []
        for q, e2 in zip(qs_f, qe2):
            k = max(0, math.ceil(q * n) - 1)  # exact Fraction ceil
            j = int(np.searchsorted(cum, k + 1, side="left"))
            rows_q.append(e2)
            rows_v.append(vals[j])
        parts = str(g["gkey"].iloc[0]).split(SEP)
        out = {c: pa.array([parts[i]] * len(rows_q), pa.string())
               for i, c in enumerate(group_cols)}
        out["qe2"] = pa.array(rows_q, pa.int64())
        out["n_vals"] = pa.array([n] * len(rows_q), pa.int64())
        out["value"] = pa.array(np.asarray(rows_v))
        return pa.table(out)

    return merged.groupby("gkey").map_groups(select, batch_format="pandas")

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
via per-block ``np.sort`` + ``searchsorted`` (vectorized over all
windows). If the target rank falls outside a window, the window
widens (digest quantile at exponentially growing offsets, clamped to
the exact global min/max); if the window holds more than
``max_gather`` rows, it bisects at its midpoint using the same
count pass. Every round is count-only — tiny result rows, no data
movement.

final gather — one pass collects the (≤ max_gather per quantile)
values inside each resolved window; the exact k-th element is
selected driver-side with ``np.partition``. The answer is an INPUT
value (bit-exact, no arithmetic) matching DuckDB
``quantile_disc``: index = max(0, ceil(q*n) - 1) into the sorted
non-null column, computed in exact Fraction arithmetic.

Typical cost: pass A + 1 count round + 1 gather = 3 streaming passes
regardless of data size; pathological duplicate-heavy columns add
count-only bisection rounds (log of window width).

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
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
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
) -> pd.DataFrame:
    """(q, value) frame with the EXACT discrete quantile of ``col``
    for each q in ``qs`` (nulls ignored, DuckDB quantile_disc
    semantics)."""
    qs_f = [Fraction(q).limit_denominator(10**9) if not isinstance(q, Fraction) else q for q in qs]

    # ---- pass A: digest partials ----
    def partial(batch: pa.Table) -> pa.Table:
        v = _col_values(batch, col).astype(np.float64)
        blob = pickle.dumps(
            {
                "n": int(len(v)),
                "min": float(v.min()) if len(v) else np.inf,
                "max": float(v.max()) if len(v) else -np.inf,
                "digest": TDigest.from_array(v) if len(v) else None,
            },
            protocol=5,
        )
        return pa.table({"b": pa.array([blob], pa.binary())})

    n_total = 0
    gmin, gmax = np.inf, -np.inf
    digest = TDigest()
    for b in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for blob in b["b"].to_pylist():
            p = pickle.loads(blob)
            n_total += p["n"]
            gmin, gmax = min(gmin, p["min"]), max(gmax, p["max"])
            if p["digest"] is not None:
                digest.merge(p["digest"])

    out_schema = {"q": np.float64, "value": np.float64}
    if n_total == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in out_schema.items()})

    # target 0-based ranks, exact rational arithmetic
    ks = [max(0, -(-(q.numerator * n_total) // q.denominator) - 1) for q in qs_f]
    ks = [min(k, n_total - 1) for k in ks]

    # per-quantile window state
    lo = np.empty(len(ks)); hi = np.empty(len(ks)); widen = np.ones(len(ks))
    for i, q in enumerate(qs_f):
        eps = 0.005
        lo[i] = min(max(float(digest.quantile(max(0.0, float(q) - eps))), gmin), gmax)
        hi[i] = min(max(float(digest.quantile(min(1.0, float(q) + eps))), gmin), gmax)
    resolved = np.zeros(len(ks), dtype=bool)
    n_lt = np.zeros(len(ks), dtype=np.int64)
    n_in = np.zeros(len(ks), dtype=np.int64)
    answers: dict[int, float] = {}

    def count_pass(lo_v: np.ndarray, hi_v: np.ndarray):
        """Per window: global (#rows < lo, #rows in [lo,hi], data
        min/max inside the window) — one streaming pass for ALL
        windows at once."""
        lo_t, hi_t = lo_v.copy(), hi_v.copy()

        def cnt(batch: pa.Table) -> pa.Table:
            v = np.sort(_col_values(batch, col))
            a = np.searchsorted(v, lo_t, side="left")
            b2 = np.searchsorted(v, hi_t, side="right")
            has = b2 > a
            if len(v):
                wmin = np.where(has, v[np.minimum(a, len(v) - 1)], np.inf)
                wmax = np.where(has, v[np.maximum(b2 - 1, 0)], -np.inf)
            else:
                wmin = np.full(len(lo_t), np.inf)
                wmax = np.full(len(lo_t), -np.inf)
            return pa.table(
                {"i": pa.array(np.arange(len(lo_t)), pa.int64()),
                 "lt": pa.array(a.astype(np.int64)),
                 "inw": pa.array((b2 - a).astype(np.int64)),
                 "wmin": pa.array(wmin, pa.float64()),
                 "wmax": pa.array(wmax, pa.float64())}
            )

        tot_lt = np.zeros(len(lo_t), dtype=np.int64)
        tot_in = np.zeros(len(lo_t), dtype=np.int64)
        g_wmin = np.full(len(lo_t), np.inf)
        g_wmax = np.full(len(lo_t), -np.inf)
        for b in ds.map_batches(
            cnt, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow"):
            idx = b["i"].to_numpy()
            np.add.at(tot_lt, idx, b["lt"].to_numpy())
            np.add.at(tot_in, idx, b["inw"].to_numpy())
            np.minimum.at(g_wmin, idx, b["wmin"].to_numpy())
            np.maximum.at(g_wmax, idx, b["wmax"].to_numpy())
        return tot_lt, tot_in, g_wmin, g_wmax

    # invariant once ``bracketed``: the true rank lies in
    # [lo, hi_backup]; ``hi`` may be a bisection trial inside it
    bracketed = np.zeros(len(ks), dtype=bool)
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
                    lo[i] = np.nextafter(hi[i], np.inf)
                    hi[i] = hi_backup[i]
                else:  # digest window missed — widen exponentially
                    widen[i] *= 4.0
                    eps = 0.005 * widen[i]
                    q = float(qs_f[i])
                    lo[i] = min(max(float(digest.quantile(max(0.0, q - eps))), gmin), gmax)
                    hi[i] = min(max(float(digest.quantile(min(1.0, q + eps))), gmin), gmax)
                    if eps >= 1.0:
                        lo[i], hi[i] = gmin, gmax  # must contain k
                    hi_backup[i] = hi[i]
                continue
            bracketed[i] = True
            # tighten to the DATA extremes inside the window — this is
            # what makes duplicate-heavy windows collapse in O(1)
            # rounds instead of O(mantissa) midpoint halvings
            lo[i], hi[i] = wmin[i], wmax[i]
            hi_backup[i] = max(hi_backup[i], hi[i])
            if lo[i] == hi[i]:
                answers[i] = lo[i]  # single distinct value holds the rank
                resolved[i] = True
            elif n_in[i] <= max_gather:
                resolved[i] = True  # gatherable
            else:  # bisect (duplicate-heavy window)
                hi_backup[i] = hi[i]
                mid = (lo[i] + hi[i]) / 2.0
                if mid <= lo[i] or mid >= hi[i]:  # adjacent floats:
                    hi[i] = lo[i]  # window is {lo, hi}; test lo alone
                else:
                    hi[i] = mid
    if not resolved.all():
        # NOT for/else: resolution in the final allowed round must
        # count as convergence
        raise RuntimeError("exact_quantiles failed to converge; raise max_gather")

    # re-derive ranks for gatherable windows with one final count
    # (windows may have shifted in the loop), then gather
    pend = [i for i in range(len(ks)) if i not in answers]
    if pend:
        lo_p = lo[pend]; hi_p = hi[pend]
        lt_p, _, _, _ = count_pass(lo_p, hi_p)

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
                     np.concatenate(outs_v) if outs_v else np.zeros(0, np.float64),
                     pa.float64())}
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
            vals = np.concatenate(pools[j]) if pools[j] else np.zeros(0)
            r = ks[i] - int(lt_p[j])
            if not (0 <= r < len(vals)):
                raise RuntimeError("rank drifted out of gathered window")
            answers[i] = float(np.partition(vals, r)[r])

    return pd.DataFrame(
        {"q": np.array([float(q) for q in qs_f]), "value": np.array([answers[i] for i in range(len(ks))])}
    )

"""Variable-type inference (VariableTypeDetector recast).

Reference semantics (aminer/analysis/VariableTypeDetector.py:887-968
``detect_var_type``): from an initial sample of a variable, classify
it among

- ``stat``  — a single constant value
- ``asc`` / ``desc`` — monotonically non-decreasing / non-increasing
  numerics (int/float flavor)
- ``continuous`` — diverse numerics fitting a tested continuous
  shape (the reference tries uniform/normal/beta via KS
  goodness-of-fit, detect_continuous_shape:969-1165; here uniform
  and normal via our scipy-free KS against the fitted CDF)
- ``range`` — diverse numerics fitting no tested shape but bounded
- ``d``     — discrete: few distinct values with stable frequencies
- ``unq``   — all values distinct (identifier-like)
- ``others`` — too many distinct values without numeric structure

Batch recast: classification runs on per-column per-group samples
collected by the column-stat partial pass (or any reservoir); the
inference itself is a small-numpy driver/actor computation —
matching the reference, which also classifies on an in-memory
``num_init`` sample (EventTypeDetector ring buffers,
EventTypeDetector.py:31-32). Drift re-tests are in stages/drift.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from .drift import ks_critical

DIV_THRES = 0.3  # reference default div_thres (VariableTypeDetector.py:52)
SIM_THRES = 0.1  # reference default sim_thres
KS_ALPHA = 0.05


@dataclass
class VarType:
    kind: str  # stat | asc | desc | continuous | range | d | unq | others
    detail: dict[str, Any] = field(default_factory=dict)


def _ks_stat_against_cdf(sorted_vals: np.ndarray, cdf: np.ndarray) -> float:
    n = len(sorted_vals)
    ecdf_hi = np.arange(1, n + 1) / n
    ecdf_lo = np.arange(0, n) / n
    return float(np.maximum(np.abs(ecdf_hi - cdf), np.abs(cdf - ecdf_lo)).max())


def infer_var_type(values: "np.ndarray | list", num_init: int | None = None) -> VarType:
    """Classify one variable's sample, mirroring detect_var_type's
    decision order: stat → asc/desc → continuous/range → d/unq/others."""
    vals = list(values if num_init is None else values[-num_init:])
    n = len(vals)
    if n == 0:
        return VarType("others")
    uniq = set(str(v) for v in vals)
    if len(uniq) == 1:
        return VarType("stat", {"value": vals[0]})

    # numeric conversion (reference convert_to_floats)
    try:
        f = np.asarray([float(v) for v in vals], dtype=np.float64)
        numeric = np.isfinite(f).all()
    except (TypeError, ValueError):
        numeric = False
    if numeric:
        is_int = bool(np.all(f == np.floor(f)))
        d = np.diff(f)
        if np.all(d >= 0):
            return VarType("asc", {"int": is_int})
        if np.all(d <= 0):
            return VarType("desc", {"int": is_int})
        num_diff = len(np.unique(f))
        if num_diff > DIV_THRES * n:
            # diverse numerics → try continuous shapes
            s = np.sort(f)
            lo, hi = s[0], s[-1]
            # uniform on [lo, hi]
            cdf_u = (s - lo) / max(hi - lo, 1e-300)
            d_u = _ks_stat_against_cdf(s, np.clip(cdf_u, 0, 1))
            # normal(mean, std)
            mu, sd = float(f.mean()), float(f.std())
            if sd > 0:
                z = (s - mu) / sd
                cdf_n = 0.5 * (1.0 + _erf_vec(z / np.sqrt(2.0)))
                d_n = _ks_stat_against_cdf(s, cdf_n)
            else:
                d_n = np.inf
            crit = ks_critical(n, n, KS_ALPHA)  # one-sample approx
            best = min((d_u, "uniform"), (d_n, "normal"))
            if best[0] <= crit:
                return VarType(
                    "continuous",
                    {"dist": best[1], "ks": best[0],
                     "min": float(lo), "max": float(hi), "mean": mu, "std": sd},
                )
            return VarType("range", {"min": float(lo), "max": float(hi)})

    # non-numeric or low-diversity → d / unq / others
    num_diff = len(uniq)
    if num_diff == n:
        return VarType("unq")
    if num_diff >= n * (1 - SIM_THRES):
        return VarType("others")
    keys, counts = np.unique(np.asarray([str(v) for v in vals]), return_counts=True)
    return VarType(
        "d", {"values": keys.tolist(), "probs": (counts / n).tolist(), "n": n}
    )


def _erf_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized erf (Abramowitz-Stegun 7.1.26, |err| < 1.5e-7) —
    no scipy in this environment."""
    sign = np.sign(x)
    ax = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * np.exp(-ax * ax))


def infer_types_by_group(
    ds, group_col: str, value_col: str, sample_per_group: int = 1000
):
    """Per-group variable-type classification over a Dataset column:
    per-block reservoir-ish head samples merged per group (bounded,
    mirroring the reference's ring buffers), classified driver-side.
    Returns {group: VarType}."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        groups = np.asarray(
            pc.cast(batch[group_col], pa.string()).to_numpy(zero_copy_only=False),
            dtype=object,
        ).astype(str)
        vals = np.asarray(batch[value_col].to_numpy(zero_copy_only=False))
        gs, blobs = [], []
        for g in np.unique(groups):
            sel = vals[groups == g][:sample_per_group]
            gs.append(str(g))
            import pickle

            blobs.append(pickle.dumps(sel, protocol=5))
        return pa.table({"g": pa.array(gs, pa.string()), "s": pa.array(blobs, pa.binary())})

    import pickle

    samples: dict[str, list] = {}
    for b in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for g, blob in zip(b["g"].to_pylist(), b["s"].to_pylist()):
            cur = samples.setdefault(g, [])
            if len(cur) < sample_per_group:
                cur.extend(pickle.loads(blob).tolist())
    return {g: infer_var_type(np.asarray(v[:sample_per_group])) for g, v in samples.items()}

"""Distribution-drift tests: KS and PSI per partition/group
(VariableTypeDetector recast).

Reference semantics (aminer/analysis/VariableTypeDetector.py:969-1660):
continuous variables get Kolmogorov-Smirnov goodness-of-fit re-tests
on sliding samples; discrete variables get chi-square homogeneity
tests. The north rule asks for "KS/PSI distribution-drift tests per
partition". No scipy in this environment, so the statistics are
hand-rolled numpy:

- two-sample KS D statistic + the standard asymptotic critical value
  ``c(α)·sqrt((n+m)/(n·m))`` with c(0.05)=1.358 (Smirnov);
- PSI (population stability index) over fixed histogram bins with
  the usual 0.2 "significant shift" default threshold.

Execution shape: ONE pass computes per-(group, bin) histogram
partials vectorized inside ``map_batches`` (searchsorted + bincount
over group×bin), a tiny groupby merges them; the per-group test then
runs over the small histogram table. Group samples for exact KS come
from per-group t-digests (mergeable) rather than raw value
collection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

KS_C_ALPHA = {0.10: 1.224, 0.05: 1.358, 0.025: 1.48, 0.01: 1.628}


def ks_2samp_from_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample KS D statistic from two SORTED samples."""
    all_v = np.concatenate([a, b])
    all_v.sort(kind="mergesort")
    cdf_a = np.searchsorted(a, all_v, side="right") / max(len(a), 1)
    cdf_b = np.searchsorted(b, all_v, side="right") / max(len(b), 1)
    return float(np.abs(cdf_a - cdf_b).max()) if len(all_v) else 0.0


def ks_critical(n: int, m: int, alpha: float = 0.05) -> float:
    c = KS_C_ALPHA.get(alpha, 1.358)
    return c * np.sqrt((n + m) / (n * m)) if n and m else np.inf


def psi(expected_frac: np.ndarray, actual_frac: np.ndarray, eps: float = 1e-6) -> float:
    """Population stability index between two binned distributions."""
    p = np.clip(expected_frac, eps, None)
    q = np.clip(actual_frac, eps, None)
    p = p / p.sum()
    q = q / q.sum()
    return float(((q - p) * np.log(q / p)).sum())


def group_histograms(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    bin_edges: np.ndarray,
    count_name: str = "n",
) -> "ray.data.Dataset":
    """Counts per (group, bin) — bin 0 is underflow, bin len(edges)
    is overflow; interior bin i covers [edges[i-1], edges[i]).
    Vectorized: one searchsorted + one bincount per block; the
    HistogramAnalysis bin-count state (reference:
    aminer/analysis/HistogramAnalysis.py:257-329) for all groups at
    once."""

    edges = np.asarray(bin_edges, dtype=np.float64)
    n_bins = len(edges) + 1

    def partial(batch: pa.Table) -> pa.Table:
        groups = np.asarray(
            pc.cast(batch[group_col], pa.string()).to_numpy(zero_copy_only=False),
            dtype=object,
        ).astype(str)
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(vals)
        groups, vals = groups[ok], vals[ok]
        uniq, ginv = np.unique(groups, return_inverse=True)
        bins = np.searchsorted(edges, vals, side="right")
        flat = ginv * n_bins + bins
        counts = np.bincount(flat, minlength=len(uniq) * n_bins)
        gc, bc, cc = [], [], []
        for gi, gname in enumerate(uniq):
            row = counts[gi * n_bins : (gi + 1) * n_bins]
            nz = np.flatnonzero(row)
            gc.extend([gname] * len(nz))
            bc.extend(nz.tolist())
            cc.extend(row[nz].tolist())
        return pa.table(
            {
                group_col: pa.array(gc, pa.string()),
                "bin": pa.array(bc, pa.int64()),
                "__pn": pa.array(cc, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return partials.groupby([group_col, "bin"]).aggregate(Sum("__pn", alias_name=count_name))


def psi_drift_by_group(
    hist: pd.DataFrame,
    group_col: str,
    n_bins: int,
    count_name: str = "n",
    threshold: float = 0.2,
    reference_frac: np.ndarray | None = None,
) -> pd.DataFrame:
    """Per group: PSI of its bin distribution vs a reference.

    ``reference_frac`` (optional) is a clean external reference —
    e.g. the fit-phase histogram. Without one, the reference is the
    element-wise MEDIAN of the per-group fraction vectors
    (renormalized): robust to a minority of shifted groups, which
    would contaminate a pooled or leave-one-out reference and make
    every clean group flag. Laplace smoothing (+0.5 per bin) bounds
    empty-bin log terms. Input is the (small) histogram table;
    output (group, psi, drift)."""
    pivot = hist.pivot_table(
        index=group_col, columns="bin", values=count_name, aggfunc="sum", fill_value=0
    ).reindex(columns=range(n_bins), fill_value=0)
    counts = pivot.to_numpy(dtype=np.float64) + 0.5  # Laplace smoothing
    fracs = counts / counts.sum(axis=1, keepdims=True)
    if reference_frac is not None:
        ref = np.asarray(reference_frac, dtype=np.float64)
        ref = ref / ref.sum()
    else:
        ref = np.median(fracs, axis=0)
        ref = ref / ref.sum()
    out = []
    for i, g in enumerate(pivot.index):
        v = psi(ref, fracs[i])
        out.append((g, v, v > threshold))
    return pd.DataFrame(out, columns=[group_col, "psi", "drift"])


def ks_exact_by_group(
    ds: "ray.data.Dataset", group_col: str, value_col: str
) -> pd.DataFrame:
    """EXACT two-sample KS D of each group vs the POOLED-ALL
    reference: D_g = max over pooled value points of
    |F_g(x) − F_pool(x)| (right-continuous ECDFs; evaluation at the
    union's points is exact because the difference is piecewise
    constant between them). One pre-aggregated (group, value)
    groupby shuffles only distinct pairs; the ECDF pass runs on the
    collected count table — the verification-tier variant whose
    driver cost is O(total distinct values). ``ks_drift_by_group``
    (t-digest) is the unbounded-cardinality scale path. Returns
    (group, n, ks) with float division exactly matching SQL DOUBLE
    division (same rationals → same IEEE doubles)."""
    from ._agg import grouped_counts

    counts = grouped_counts(ds, [group_col, value_col]).to_pandas()
    counts = counts.dropna(subset=[value_col]).sort_values(value_col, kind="mergesort")
    vals = counts[value_col].to_numpy(np.float64)
    grp = counts[group_col].astype(str).to_numpy()
    cnt = counts["n"].to_numpy(np.int64)
    # pooled cumulative counts at distinct points
    pooled_vals, inv = np.unique(vals, return_inverse=True)
    pooled_cnt = np.bincount(inv, weights=cnt)
    cb = np.cumsum(pooled_cnt)
    m = float(cb[-1]) if len(cb) else 0.0
    rows = []
    for g in np.unique(grp):
        sel = grp == g
        gv = vals[sel]
        gc = np.cumsum(cnt[sel]).astype(np.float64)
        n = float(gc[-1])
        # F_g at every pooled point: index of last group value <= x
        pos = np.searchsorted(gv, pooled_vals, side="right")
        ca = np.where(pos > 0, gc[np.maximum(pos - 1, 0)], 0.0)
        d = np.abs(ca / n - cb / m).max() if m and n else 0.0
        rows.append((g, int(n), float(d)))
    return pd.DataFrame(rows, columns=[group_col, "n", "ks"])


def ks_drift_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    alpha: float = 0.05,
    n_quantile_points: int = 256,
    min_effect: float = 0.15,
) -> pd.DataFrame:
    """Per group: approximate two-sample KS of the group vs the
    POOLED-ALL reference distribution, using per-group t-digests
    (mergeable per-block partials) as the sample summaries. Output
    (group, ks_stat, critical, drift, n).

    The reference sample is the pooled distribution over every group
    (the learned state of the fit pass) — comparing against a
    leave-one-out pool would let one genuinely shifted group
    contaminate every other group's test. ``min_effect`` is an
    effect-size floor on D: at large n the asymptotic critical value
    shrinks toward 0 and any impurity fires; requiring a material D
    keeps only practically shifted groups (the reference's
    VariableTypeDetector similarly re-tests with binomial
    backtracking rather than firing on every significant p,
    VariableTypeDetector.py:1605-1660)."""
    import pickle

    from ..state.sketches import TDigest

    def partial(batch: pa.Table) -> pa.Table:
        groups = np.asarray(
            pc.cast(batch[group_col], pa.string()).to_numpy(zero_copy_only=False),
            dtype=object,
        ).astype(str)
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(vals)
        groups, vals = groups[ok], vals[ok]
        uniq = np.unique(groups)
        gs, blobs, ns = [], [], []
        for g in uniq:
            v = vals[groups == g]
            gs.append(str(g))
            blobs.append(pickle.dumps(TDigest.from_array(v), protocol=5))
            ns.append(len(v))
        return pa.table(
            {
                "group": pa.array(gs, pa.string()),
                "state": pa.array(blobs, pa.binary()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    digests: dict[str, TDigest] = {}
    ns: dict[str, int] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for g, blob, n in zip(b["group"].to_pylist(), b["state"].to_pylist(), b["n"].to_pylist()):
            td = pickle.loads(blob)
            if g in digests:
                digests[g].merge(td)
                ns[g] += n
            else:
                digests[g], ns[g] = td, n
    qs = (np.arange(n_quantile_points) + 0.5) / n_quantile_points
    groups = sorted(digests)
    pooled = TDigest()
    for h in groups:
        d = digests[h]
        pooled.merge(TDigest(d.delta, d.means.copy(), d.weights.copy()))
    m = sum(ns.values())
    b = np.sort(pooled.quantile(qs))
    rows = []
    for g in groups:
        n = ns[g]
        if not n or not m:
            rows.append((g, 0.0, np.inf, False, n))
            continue
        a = np.sort(digests[g].quantile(qs))
        d_stat = ks_2samp_from_sorted(a, b)
        crit = ks_critical(n, m, alpha)
        rows.append((g, d_stat, crit, d_stat > max(crit, min_effect), n))
    return pd.DataFrame(rows, columns=[group_col, "ks_stat", "critical", "drift", "n"])


def binom_two_sided_pvalue(k: int, n: int, p: float) -> float:
    """Exact two-sided binomial test p-value (scipy-free): the sum of
    P(X = k') over all k' whose pmf ≤ pmf(k)·(1+1e-7) — the same
    minlike definition scipy's binomtest uses (the reference feeds
    bin counts to it, HistogramAnalysis.py:196-209). Vectorized: the
    full log-pmf vector comes from one cumsum of log odds-ratio
    increments, O(n)."""
    if n <= 0:
        return 1.0
    if p <= 0.0:
        return 1.0 if k == 0 else 0.0
    if p >= 1.0:
        return 1.0 if k == n else 0.0
    ks = np.arange(n, dtype=np.float64)
    incr = np.log((n - ks) / (ks + 1.0)) + (np.log(p) - np.log1p(-p))
    base = n * np.log1p(-p)
    logpmf = np.concatenate([[base], base + np.cumsum(incr)])
    return float(np.exp(logpmf[logpmf <= logpmf[k] + 1e-7]).sum())


def modulo_time_bins(
    values: np.ndarray,
    modulo_value: float,
    time_unit: float,
    lower_limit: float,
    bin_size: float,
    bin_count: int,
    outlier_bins: bool = False,
) -> np.ndarray:
    """ModuloTimeBinDefinition.get_bin vectorized (reference
    HistogramAnalysis.py:211-256 over LinearNumericBinDefinition
    :175-194): bin((value mod modulo)/time_unit) with linear bins of
    ``bin_size`` from ``lower_limit``. With ``outlier_bins`` bin 0 is
    below-range and ``bin_count+1`` above-range; without, out-of-range
    values get −1 (the reference's None)."""
    t = (np.asarray(values, dtype=np.float64) % modulo_value) / time_unit
    pos = np.floor((t - lower_limit) / bin_size).astype(np.int64)
    if outlier_bins:
        return np.clip(pos + 1, 0, bin_count + 1)
    out = np.where((pos >= 0) & (pos < bin_count), pos, -1)
    return out


def histogram_bin_anomalies(
    hist: pd.DataFrame,
    group_col: str,
    bin_count: int,
    outlier_bins: bool = False,
    significance: float = 0.05,
    count_name: str = "n",
) -> pd.DataFrame:
    """Per-bin binomial significance over ``group_histograms`` output
    (reference HistogramAnalysis bin p-values: each interior bin's
    count is tested against the uniform expectation 1/bin_count;
    outlier bins — 0 and bin_count+1 when ``outlier_bins`` — get no
    p-value, as in get_bin_p_value:196-209). Returns rows with
    ``p_value`` and ``significant`` (p < significance); the driver
    input is the already-tiny (group × bin) table."""
    rows = []
    for g, sub in hist.groupby(group_col):
        total = int(sub[count_name].sum())
        for _, r in sub.iterrows():
            b = int(r["bin"])
            if outlier_bins and (b == 0 or b > bin_count):
                continue
            pv = binom_two_sided_pvalue(int(r[count_name]), total, 1.0 / bin_count)
            rows.append((g, b, int(r[count_name]), pv, pv < significance))
    return pd.DataFrame(
        rows, columns=[group_col, "bin", count_name, "p_value", "significant"]
    )


def cm_exact_by_group(
    ds: "ray.data.Dataset", group_col: str, value_col: str
) -> pd.DataFrame:
    """EXACT two-sample Cramér–von Mises criterion of each group vs
    the POOLED-ALL reference (integral form, tie-robust):

        T_g = n·m/N² · Σ_k w_k (F_g(x_k) − F_pool(x_k))²

    over the pooled distinct points x_k with pooled multiplicities
    w_k (N = m = pooled size, n = group size). Computed as an exact
    RATIONAL — numerator Σ w·(ca·m − cb·n)² and denominator
    n·m·(n+m)² in arbitrary-precision ints — so a SQL oracle using
    HUGEINT arithmetic matches bit-for-bit with no float-summation
    order sensitivity (the KS query gets away with floats because
    max() is order-free; a Σ does not). Same one pre-aggregated
    (group, value) shuffle as ``ks_exact_by_group``. Returns
    (group, n, cm_num, cm_den) — downstream scales
    round(1e6·num/den) in exact integer math."""
    from ._agg import grouped_counts

    counts = grouped_counts(ds, [group_col, value_col]).to_pandas()
    counts = counts.dropna(subset=[value_col]).sort_values(value_col, kind="mergesort")
    vals = counts[value_col].to_numpy(np.float64)
    grp = counts[group_col].astype(str).to_numpy()
    cnt = counts["n"].to_numpy(np.int64)
    pooled_vals, inv = np.unique(vals, return_inverse=True)
    pooled_cnt = np.bincount(inv, weights=cnt).astype(np.int64)
    cb = np.cumsum(pooled_cnt)
    m = int(cb[-1]) if len(cb) else 0
    rows = []
    for g in np.unique(grp):
        sel = grp == g
        gv = vals[sel]
        gc = np.cumsum(cnt[sel])
        n = int(gc[-1])
        pos = np.searchsorted(gv, pooled_vals, side="right")
        ca = np.where(pos > 0, gc[np.maximum(pos - 1, 0)], 0)
        num = 0
        for k in range(len(pooled_vals)):  # python ints: exact, no overflow
            diff = int(ca[k]) * m - int(cb[k]) * n
            num += int(pooled_cnt[k]) * diff * diff
        den = n * m * (n + m) ** 2
        rows.append((g, n, num, den))
    return pd.DataFrame(rows, columns=[group_col, "n", "cm_num", "cm_den"])

"""Cross-event correlation checks: A→B interval joins, implication
rules, cross-column contingency tests, count-vector clustering.

Clean-room recasts:
- ``interval_join_violations`` — TimeCorrelationViolationDetector
  (reference: aminer/analysis/TimeCorrelationViolationDetector.py:
  150-363): every A event must be followed by a matching B within
  [min_delta, max_delta]; batch recast = per-key sort + vectorized
  searchsorted of B timestamps around each A (an as-of/interval
  join within key groups — SURVEY.md §2.5).
- ``implication_support`` — EventCorrelationDetector's A⇒B rules
  (reference: aminer/analysis/EventCorrelationDetector.py:37-846):
  support/confidence of "B within Δt after A" per (A,B) event-type
  pair, testable against a binomial-style threshold.
- ``contingency_chi2`` — VariableCorrelationDetector (reference:
  aminer/analysis/VariableCorrelationDetector.py:15-1642):
  chi-square independence statistic over a two-column contingency
  table built with ONE pre-aggregated groupby.
- ``count_vector_outliers`` — EventCountClusterDetector (reference:
  aminer/analysis/EventCountClusterDetector.py:26-390): per
  (window, id) count vectors over event types, cosine-scored
  against the learned cluster vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def interval_join_violations(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    event_col: str,
    ts_col: str,
    a_event: str,
    b_event: str,
    min_delta: float,
    max_delta: float,
) -> "ray.data.Dataset":
    """A events with no B partner in (ts+min_delta, ts+max_delta]
    within the same key group. One groupby(key) shuffle; inside each
    group a vectorized double-searchsorted."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        ev = g[event_col].to_numpy()
        a_ts = tsi[ev == a_event]
        b_ts = tsi[ev == b_event]
        lo = np.searchsorted(b_ts, a_ts + int(min_delta * 1e6), side="left")
        hi = np.searchsorted(b_ts, a_ts + int(max_delta * 1e6), side="right")
        unmatched = lo >= hi
        rows = g[ev == a_event].iloc[np.flatnonzero(unmatched)][key_cols + [ts_col]].copy()
        rows["a_event"] = a_event
        rows["b_event"] = b_event
        return rows

    return ds.groupby(key_cols).map_groups(per_key, batch_format="pandas")


def implication_support(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    event_col: str,
    ts_col: str,
    max_delta: float,
) -> "ray.data.Dataset":
    """For every ordered event-type pair (A,B): how many A events
    were followed by a B within max_delta (n_hit) out of n_a — the
    support counts behind EventCorrelationDetector's binomial rule
    testing. Pre-aggregated per key group, merged in one small
    groupby."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        ev = g[event_col].to_numpy()
        types = np.unique(ev)
        rows = []
        d = int(max_delta * 1e6)
        for a in types:
            a_ts = tsi[ev == a]
            for b in types:
                b_ts = tsi[ev == b]
                lo = np.searchsorted(b_ts, a_ts, side="right")
                hi = np.searchsorted(b_ts, a_ts + d, side="right")
                rows.append((a, b, len(a_ts), int((hi > lo).sum())))
        return pd.DataFrame(rows, columns=["a_event", "b_event", "__na", "__nh"])

    partials = ds.groupby(key_cols).map_groups(per_key, batch_format="pandas")
    return partials.groupby(["a_event", "b_event"]).aggregate(
        Sum("__na", alias_name="n_a"), Sum("__nh", alias_name="n_hit")
    )


def implication_rules(
    support: pd.DataFrame,
    p0: float = 0.9,
    alpha: float = 0.05,
    min_support: int = 20,
) -> pd.DataFrame:
    """Accept A⇒B rules whose hit rate is credibly ≥ p0 — the
    binomial rule test of EventCorrelationDetector (reference:
    aminer/analysis/EventCorrelationDetector.py:126-175
    ``get_min_eval_true``: smallest k with
    P[Binom(n, p0) ≤ k] ≥ alpha). scipy-free exact binomial CDF via
    log-space summation. Input: the (a_event, b_event, n_a, n_hit)
    table from ``implication_support``."""

    def min_eval_true(n: int, p: float, a: float) -> int:
        # smallest k such that sum_{i<=k} C(n,i) p^i (1-p)^(n-i) >= a
        # np.log(1-p), NOT log1p: the SQL oracle replays this loop
        # with ln(1-p) and the two must walk the same float path
        logp, log1p = np.log(p), np.log(1.0 - p)
        # iterative log-pmf to avoid overflow
        lp = n * log1p  # i = 0
        cdf = np.exp(lp)
        k = 0
        while cdf < a and k < n:
            k += 1
            lp += np.log((n - k + 1) / k) + logp - log1p
            cdf += np.exp(lp)
        return k

    rows = []
    for _, r in support.iterrows():
        n, hit = int(r["n_a"]), int(r["n_hit"])
        if n < min_support or r["a_event"] == r["b_event"]:
            continue
        thresh = min_eval_true(n, p0, alpha)
        if hit >= thresh:
            rows.append(
                (r["a_event"], r["b_event"], n, hit, hit / n, thresh)
            )
    return pd.DataFrame(
        rows, columns=["a_event", "b_event", "n_a", "n_hit", "confidence", "min_hits"]
    )


def generate_hypotheses(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    event_col: str,
    ts_col: str,
    max_delta: float = 5.0,
    candidates_size: int = 10,
    generation_probability: float = 1.0,
    generation_factor: float = 1.0,
    max_hypotheses: int = 1000,
    seed: int = 42,
) -> pd.DataFrame:
    """Randomized A⇒B hypothesis GENERATION — the sampled temporal
    self-join of EventCorrelationDetector (reference:
    aminer/analysis/EventCorrelationDetector.py:42-125): each event
    joins the candidate set with probability ``generation_factor``
    (bounded deque of ``candidates_size``), and each new event forms
    forward/back hypotheses with the candidates within ``max_delta``
    seconds with probability ``generation_probability``. Batch
    recast: per key group (sorted), a vectorized trailing-window
    pairing with a SEEDED rng (deterministic across runs/workers —
    the seed is mixed with the key hash so groups draw independent
    streams). Output: distinct (a_event, b_event, direction) rows
    capped at ``max_hypotheses``. Evaluation of the generated
    hypotheses is ``implication_support`` + ``implication_rules``."""

    _EMPTY = pd.DataFrame(
        {"a_event": pd.Series(dtype=object), "b_event": pd.Series(dtype=object),
         "direction": pd.Series(dtype=object)}
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        empty = _EMPTY
        if len(g) < 2:
            return empty
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        ev = g[event_col].to_numpy()
        import zlib

        key_str = "\x1f".join(str(g[c].iloc[0]) for c in key_cols)
        key_mix = zlib.crc32(key_str.encode())  # stable across processes
        rng = np.random.default_rng(seed ^ key_mix)
        is_candidate = rng.random(len(ev)) <= generation_factor
        d = int(max_delta * 1e6)
        lo = np.searchsorted(tsi, tsi - d, side="left")
        rows = []
        cand_queue: list[int] = []  # indices, bounded deque semantics
        for i in range(len(ev)):
            # pair the new event with live candidates in the window
            live = [j for j in cand_queue if j >= lo[i] and j < i]
            if live and rng.random() <= generation_probability:
                for j in live:
                    if ev[j] != ev[i]:
                        rows.append((ev[j], ev[i], "forward"))
                        rows.append((ev[i], ev[j], "back"))
            if is_candidate[i]:
                cand_queue.append(i)
                if len(cand_queue) > candidates_size:
                    cand_queue.pop(0)
        if not rows:
            return empty
        out = pd.DataFrame(rows, columns=["a_event", "b_event", "direction"])
        return out.drop_duplicates().reset_index(drop=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = [per_key(sub) for _, sub in g.groupby(key_cols, sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return _EMPTY
        return pd.concat(outs).drop_duplicates().reset_index(drop=True)

    from ._agg import coarse_grouped

    hyps = (
        coarse_grouped(ds, key_cols, per_bucket, n_buckets=64)
        .to_pandas()
        .drop_duplicates()
        .reset_index(drop=True)
    )
    return hyps.head(max_hypotheses)


def event_correlation_rules(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    event_col: str,
    ts_col: str,
    max_delta: float = 600.0,
    hypothesis_max_delta_time: float = 5.0,
    p0: float = 0.9,
    alpha: float = 0.05,
    min_support: int = 20,
    **gen_kwargs,
) -> pd.DataFrame:
    """Full EventCorrelationDetector lifecycle: GENERATE candidate
    implications from temporally-close samples (window
    ``hypothesis_max_delta_time``), EVALUATE their support over the
    whole data at ``max_delta`` (one pre-aggregated pass), ACCEPT by
    the binomial test — generation + get_min_eval_true evaluation
    (reference EventCorrelationDetector.py:42-175)."""
    hyps = generate_hypotheses(
        ds, key_cols, event_col, ts_col,
        max_delta=hypothesis_max_delta_time, **gen_kwargs,
    )
    support = implication_support(ds, key_cols, event_col, ts_col, max_delta).to_pandas()
    fwd = set(zip(hyps[hyps["direction"] == "forward"]["a_event"], hyps[hyps["direction"] == "forward"]["b_event"]))
    keep = support[[(a, b) in fwd for a, b in zip(support["a_event"], support["b_event"])]]
    return implication_rules(keep, p0=p0, alpha=alpha, min_support=min_support)


def contingency_chi2(
    ds: "ray.data.Dataset", col_a: str, col_b: str
) -> tuple[float, int, pd.DataFrame]:
    """Chi-square independence statistic of two categorical columns.
    Returns (chi2, dof, contingency df). The counts come from ONE
    pre-aggregated groupby; the statistic is computed driver-side on
    the small table (no scipy: statistic + dof only, compare to a
    critical value chosen by the caller)."""
    from ._agg import grouped_counts

    counts = grouped_counts(ds, [col_a, col_b]).to_pandas()
    pivot = counts.pivot_table(index=col_a, columns=col_b, values="n", fill_value=0)
    obs = pivot.to_numpy(dtype=np.float64)
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    exp = row @ col / obs.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        chi2 = float(np.nansum((obs - exp) ** 2 / np.where(exp > 0, exp, np.nan)))
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    return chi2, dof, counts


def count_vector_outliers(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    event_col: str,
    ts_col: str,
    window_seconds: int = 600,
    confidence_factor: float = 0.5,
) -> pd.DataFrame:
    """Per (id, window) event-type count vector, cosine-scored
    against the learned mean vector of its id; windows whose best
    similarity < confidence_factor are outliers. The count matrix
    comes from one pre-aggregated groupby; scoring is a small
    driver-side numpy pass (the learned model is tiny)."""
    from ..functions.windows import window_id as _wid

    def partial(batch: pa.Table) -> pa.Table:
        w = _wid(batch[ts_col], window_seconds)
        t = batch.select(id_cols + [event_col]).append_column("window", w)
        g = t.group_by(id_cols + ["window", event_col]).aggregate([([], "count_all")])
        return g.rename_columns(id_cols + ["window", event_col, "__pn"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(id_cols + ["window", event_col])
        .aggregate(Sum("__pn", alias_name="n"))
        .to_pandas()
    )
    pivot = counts.pivot_table(
        index=id_cols + ["window"], columns=event_col, values="n", fill_value=0
    )
    X = pivot.to_numpy(dtype=np.float64)
    ids = pivot.index.to_frame(index=False)
    out_rows = []
    for key, grp in ids.groupby(id_cols):
        rows = grp.index.to_numpy()
        V = X[rows]
        mean = V.mean(axis=0)
        mn = np.linalg.norm(mean)
        vn = np.linalg.norm(V, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            sim = np.where((vn > 0) & (mn > 0), V @ mean / (vn * mn), 1.0)
        for r, s in zip(rows, sim):
            if s < confidence_factor:
                rec = ids.iloc[r].to_dict()
                rec["similarity"] = float(s)
                out_rows.append(rec)
    return pd.DataFrame(out_rows, columns=id_cols + ["window", "similarity"])


# ---------------------------------------------------------------------------
# TimeCorrelationDetector recast
# ---------------------------------------------------------------------------


def tc_pair_tables(
    ts_us: np.ndarray, masks: np.ndarray, max_delta_us: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pairwise cause→effect trigger tables of the reference's
    TimeCorrelationDetector (aminer/analysis/TimeCorrelationDetector.py:
    201-220 update_tables_for_feature): for every atom (stream order)
    matching effect-feature g, and every cause-feature f whose LAST
    trigger strictly before this atom lies within ``max_delta_us``,
    count (f, g) and accumulate the delta. The reference keeps the
    same event in two mirrored tables (forward +delta at (f, g),
    backward −delta at (g, f)); one table carries both. Deltas are
    integer microseconds (the reference truncates float seconds to
    ms — exact under integer arithmetic).

    ``ts_us`` must be in stream order (the order last_trigger_time is
    updated in); ``masks`` is (n_atoms, n_features) bool. Returns
    (count (F,F), delta_us_sum (F,F), trigger_counts (F,)). A
    feature's own diagonal counts self-succession, as in the
    reference. Vectorized: F² searchsorted passes, no per-atom loop.
    """
    n, F = masks.shape
    count = np.zeros((F, F), dtype=np.int64)
    delta = np.zeros((F, F), dtype=np.int64)
    idx = [np.flatnonzero(masks[:, f]) for f in range(F)]
    for g in range(F):
        ig = idx[g]
        if len(ig) == 0:
            continue
        tg = ts_us[ig]
        for f in range(F):
            jf = idx[f]
            if len(jf) == 0:
                continue
            pos = np.searchsorted(jf, ig, side="left") - 1
            valid = pos >= 0
            if not valid.any():
                continue
            d = tg[valid] - ts_us[jf[pos[valid]]]
            ok = d <= max_delta_us
            count[f, g] = int(ok.sum())
            delta[f, g] = int(d[ok].sum())
    return count, delta, masks.sum(axis=0).astype(np.int64)


def sample_feature_rules(
    ds: "ray.data.Dataset",
    attr_cols: list[str],
    parallel_check_count: int = 8,
    min_rule_attributes: int = 1,
    max_rule_attributes: int = 2,
    use_path_match: bool = True,
    use_value_match: bool = True,
    seed: int = 42,
) -> list[list[tuple[str, object]]]:
    """Seeded recast of create_random_rule (reference
    TimeCorrelationDetector.py:164-199): sample
    ``parallel_check_count`` rows deterministically (bottom-k of a
    seeded row hash — every worker/rerun draws the same rows), then
    per sampled row draw 1..max attributes and per attribute either a
    value-match (col, value) or a path-match (col, None ≙ non-null)
    sub-rule. Returns feature specs: each a list of (col, value|None)
    conjuncts. The reference draws from ``random`` as atoms stream
    by; the batch recast replaces that unseeded stream order with a
    seeded content hash — same rule SHAPE distribution, reproducible.
    """
    import pandas as _pd

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(attr_cols).to_pandas()
        h = np.zeros(len(df), dtype=np.uint64)
        for c in attr_cols:
            h = h * np.uint64(0x100000001B3) ^ _pd.util.hash_pandas_object(
                df[c], index=False
            ).to_numpy()
        if seed:
            h ^= np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
        df = df.assign(__h=h.view(np.int64))
        return pa.Table.from_pandas(
            df.nsmallest(parallel_check_count, "__h"), preserve_index=False
        )

    top = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .to_pandas()
        .nsmallest(parallel_check_count, "__h")
        .reset_index(drop=True)
    )
    rules: list[list[tuple[str, object]]] = []
    rng = np.random.default_rng(seed)
    for _, row in top.iterrows():
        n_attr = int(rng.integers(min_rule_attributes, max_rule_attributes + 1))
        cols = list(rng.permutation(attr_cols)[:n_attr])
        conj: list[tuple[str, object]] = []
        for c in cols:
            path_match = use_path_match and (
                not use_value_match or bool(rng.integers(0, 2))
            )
            conj.append((c, None) if path_match else (c, row[c]))
        if conj and conj not in rules:
            rules.append(conj)
    return rules


def time_correlation_report(
    ds: "ray.data.Dataset",
    ts_col: str,
    order_col: str,
    features: list[list[tuple[str, object]]],
    record_window: int = 10000,
    max_delta: float = 10.0,
    n_buckets: int = 64,
    max_result_rows: int = 2_000_000,
) -> pd.DataFrame:
    """Windowed TimeCorrelationDetector report (reference
    TimeCorrelationDetector.py:27-265): the stream is cut into
    windows of ``record_window`` records (the reference emits a
    report and resets every record_count_before_event atoms — window
    = order // record_window over the global ``order_col`` sequence),
    and per window the pairwise cause→effect tables are computed with
    ``tc_pair_tables``. Batch deviation (documented): all features
    exist from the window start (the reference grows the feature list
    over the first atoms); pair state never crosses a window (the
    reference's reset).

    Driver-bound tier bound: the per-window report (≤ windows × F²
    rows) is gathered to the driver, capped at ``max_result_rows``
    (raises with the scale path named) — this is the 1:1 parity
    replay; at corpus scale use ``sample_feature_rules`` +
    ``tc_pair_tables`` over sampled windows instead.

    Output: one row per (window, a_idx, b_idx) with n > 0 —
    ``n``, ``delta_us`` (sum of cause→effect gaps), ``trig_a``,
    ``trig_b``. Shuffle: ONE coarse groupby over hashed window
    buckets; each window's atoms are evaluated inside pandas.
    Partitioning assumption: a window's rows fit one task — bounded
    by record_window itself."""
    from ._agg import coarse_grouped

    max_delta_us = int(max_delta * 1e6)
    F = len(features)

    def _masks(df: pd.DataFrame) -> np.ndarray:
        m = np.zeros((len(df), F), dtype=bool)
        for fi, conj in enumerate(features):
            cur = np.ones(len(df), dtype=bool)
            for c, v in conj:
                cur &= df[c].notna().to_numpy() if v is None else (df[c] == v).to_numpy()
            m[:, fi] = cur
        return m

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        wins, aidx, bidx, ns, ds_, ta, tb = [], [], [], [], [], [], []
        for w, sub in g.groupby("__win", sort=False):
            sub = sub.sort_values([ts_col, order_col], kind="mergesort")
            ts = sub[ts_col].to_numpy()
            ts_us = (
                ts.astype("datetime64[us]").astype(np.int64)
                if ts.dtype.kind == "M"
                else (ts * 1e6).astype(np.int64) if ts.dtype.kind == "f" else ts.astype(np.int64)
            )
            masks = _masks(sub)
            count, delta, trig = tc_pair_tables(ts_us, masks, max_delta_us)
            a, b = np.nonzero(count)
            wins.extend([int(w)] * len(a))
            aidx.extend(a.tolist()); bidx.extend(b.tolist())
            ns.extend(count[a, b].tolist()); ds_.extend(delta[a, b].tolist())
            ta.extend(trig[a].tolist()); tb.extend(trig[b].tolist())
        return pa.table(
            {"window": pa.array(wins, pa.int64()), "a_idx": pa.array(aidx, pa.int64()),
             "b_idx": pa.array(bidx, pa.int64()), "n": pa.array(ns, pa.int64()),
             "delta_us": pa.array(ds_, pa.int64()), "trig_a": pa.array(ta, pa.int64()),
             "trig_b": pa.array(tb, pa.int64())}
        )

    def add_win(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = pc.cast(pc.floor(pc.divide(pc.cast(b[order_col], pa.float64()), float(record_window))), pa.int64())
        return b.append_column("__win", w)

    with_win = ds.map_batches(add_win, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    from ._agg import bounded_collect

    out = bounded_collect(
        coarse_grouped(with_win, ["__win"], per_bucket, n_buckets=n_buckets),
        max_result_rows, "time_correlation_report",
        "sample_feature_rules + tc_pair_tables over sampled windows",
    )
    if len(out) == 0:
        return pd.DataFrame(
            {c: pd.Series(dtype=np.int64)
             for c in ["window", "a_idx", "b_idx", "n", "delta_us", "trig_a", "trig_b"]}
        )
    return out.sort_values(["window", "a_idx", "b_idx"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# EventCountClusterDetector recast (exact lifecycle)
# ---------------------------------------------------------------------------


def manhattan_cluster_score(
    count_vector: dict,
    model: list[dict],
    confidence_factor: float,
    idf_weights: dict | None = None,
    norm: bool = False,
) -> float:
    """The reference check() metric (EventCountClusterDetector.py:
    243-279): normalized Manhattan distance of the count vector to
    each model vector — per element |a·w/Σa − b·w/Σb| summed, divided
    by the max-attainable sum — with the reference's EARLY ABORT: any
    model vector at distance ≤ confidence_factor makes the sample
    normal (returns −1, true min unknown). No model vectors → 1
    (first window is always anomalous). ``idf_weights`` maps event →
    log10((1+#ids)/#ids-with-event)."""
    min_score = 1.0
    for known in model:
        manh = 0.0
        manh_max = 0.0
        norm_known = sum(known.values()) if norm else 1
        norm_count = sum(count_vector.values()) if norm else 1
        for element in set(list(known.keys()) + list(count_vector.keys())):
            w = idf_weights.get(element, 1.0) if idf_weights else 1.0
            if element not in known:
                v = count_vector[element] * w / norm_count
                manh += v
                manh_max += v
            elif element not in count_vector:
                v = known[element] * w / norm_known
                manh += v
                manh_max += v
            else:
                a = count_vector[element] * w / norm_count
                b = known[element] * w / norm_known
                manh += abs(a - b)
                manh_max += max(a, b)
        score = manh / manh_max if manh_max != 0 else 0.0
        if score <= confidence_factor:
            return -1.0
        min_score = min(min_score, score)
    return min_score


def event_count_cluster_anomalies(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    event_col: str,
    ts_col: str,
    window_size: float = 600.0,
    num_windows: int = 50,
    confidence_factor: float = 0.33,
    idf: bool = False,
    norm: bool = False,
    add_normal: bool = False,
    check_empty_windows: bool = True,
    learn_mode: bool = True,
    n_buckets: int = 64,
    max_result_rows: int = 2_000_000,
) -> pd.DataFrame:
    """EXACT EventCountClusterDetector lifecycle (reference:
    aminer/analysis/EventCountClusterDetector.py:102-279), recast per
    id group:

    - windows are PER-ID, anchored at the id's first atom time
      (next_check = t₀ + W, stepped in W multiples) — window k =
      (t − t₀) // W; a completed window is only evaluated when a
      later atom arrives (the trailing window never fires);
    - a gap of skipped windows fires ONE empty-vector check (when
      ``check_empty_windows``) before the completed window's check —
      the reference's single detect({}) per skip;
    - scoring is ``manhattan_cluster_score`` (early abort ≤ cf);
      anomalies (score ≠ −1) are recorded and, in ``learn_mode``,
      added to the FIFO model (identical vectors deduped, oldest
      dropped past ``num_windows``); ``add_normal`` also learns
      normal vectors;
    - ``idf`` weights are computed from the FULL dataset (batch
      deviation, documented: the reference grows idf sets online;
      the batch value is their converged state).

    One coarse-bucketed shuffle on the id; the per-id pass loops
    windows (small), not atoms. Returns one row per anomalous check:
    id cols, ``window`` (index), ``score``, ``n_events``, ``values``
    ('|'-joined first-occurrence order), ``freqs`` ('|'-joined).

    Driver-bound tier bound: the anomaly-row result is gathered to
    the driver, capped at ``max_result_rows`` (raises with the scale
    path named) — this is the 1:1 parity replay; at corpus scale use
    ``count_vector_outliers`` (simplified, fully distributed)."""
    from ._agg import coarse_grouped

    idf_weights = None
    if idf:
        import math

        pairs = (
            ds.map_batches(
                lambda t: t.select(id_cols + [event_col]).group_by(id_cols + [event_col]).aggregate([]),
                batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
            )
            .groupby(id_cols + [event_col])
            .count()
            .to_pandas()
        )
        n_ids = pairs.groupby(id_cols).ngroups
        per_event = pairs.groupby(event_col).size()
        idf_weights = {
            e: math.log10((1 + n_ids) / c) for e, c in per_event.items()
        }

    out_cols = id_cols + ["window", "score", "n_events", "values", "freqs"]

    def per_id(g: pd.DataFrame, out: list) -> None:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        tsf = (
            ts.astype("datetime64[us]").astype(np.int64) / 1e6
            if ts.dtype.kind == "M"
            else ts.astype(np.float64)
        )
        ev = g[event_col].to_numpy()
        key = tuple(g[c].iloc[0] for c in id_cols)
        w = ((tsf - tsf[0]) // window_size).astype(np.int64)
        model: list[dict] = []

        def learn(vec: dict) -> None:
            if vec in model:
                return
            if len(model) >= num_windows:
                model.pop(0)
            model.append(dict(vec))

        def detect(win: int, vec: dict) -> None:
            score = manhattan_cluster_score(
                vec, model, confidence_factor, idf_weights, norm
            )
            if score == -1.0:
                if learn_mode and add_normal:
                    learn(vec)
                return
            if learn_mode:
                learn(vec)
            out.append(
                key + (int(win), float(score), int(sum(vec.values())),
                       "|".join(str(k) for k in vec), "|".join(str(v) for v in vec.values()))
            )

        starts = np.flatnonzero(np.concatenate([[True], w[1:] != w[:-1]]))
        ends = np.concatenate([starts[1:], [len(w)]])
        for i in range(len(starts) - 1):  # trailing window never fires
            a, b = starts[i], ends[i]
            vec: dict = {}
            for e in ev[a:b]:
                vec[e] = vec.get(e, 0) + 1
            nxt = w[starts[i + 1]]
            if nxt > w[a] + 1 and check_empty_windows:
                detect(int(w[a]) + 1, {})
            detect(int(w[a]), vec)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows: list = []
        for _, sub in g.groupby(id_cols, sort=False):
            per_id(sub, rows)
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        return pd.DataFrame(rows, columns=out_cols)

    from ._agg import bounded_collect

    res = bounded_collect(
        coarse_grouped(ds, id_cols, per_bucket, n_buckets=n_buckets),
        max_result_rows, "event_count_cluster_anomalies",
        "count_vector_outliers (simplified, fully distributed)",
    )
    if len(res) == 0:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
    return res.sort_values(id_cols + ["window"]).reset_index(drop=True)

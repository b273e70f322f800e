"""N-gram language-model quality scoring (stupid backoff).

The CCNet / Wenzek et al. 2020 quality gate scores every document
with a small reference language model; Brants et al. 2007 ("Large
Language Models in Machine Translation") showed the *stupid backoff*
score — raw count ratios with a fixed 0.4 backoff multiplier, no
discounting — is the right large-scale recast of Kneser-Ney. This
module implements exactly that over a REFERENCE corpus (the small,
curated side — a real pipeline points it at its high-quality subset):

    S(w_i | w_{i-2} w_{i-1}) = c3/c2ctx        if c3 > 0
                             = 0.4 · c2/c1ctx  elif c2 > 0
                             = 0.4² · c1/T1    elif c1 > 0
                             = 0               else

with the deepest ORDER available at each position (position 0 starts
at the unigram level, position 1 at the bigram level — the backoff
penalty applies only when a zero count forces the fallback). The
document score is the SUM of per-token scores as EXACT INTEGERS
(``ratio·scale`` floor-divided — 0.4 = 2/5 and 0.4² = 4/25 stay
rational), so a DuckDB oracle reproduces it bit-for-bit; transcendental
log-probabilities never enter a checked column (CLAUDE.md ulp rule).

Scale shape (the decontaminate pattern): the reference LM tables are
bounded by construction (``max_ref_grams`` hard error), fold to the
driver once as (h1, h2, count) arrays — gram identity is the 128-bit
pair from ``functions.text.shingle_hashes2``, the same
collision-free-in-practice standard the hygiene operators use —
broadcast via ``ray.put``, and the 100-TB corpus streams through ONE
shuffle-free vectorized pass (searchsorted lookups + np.where branch
chains; per-doc sums via np.add.at). Raw text never shuffles.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ._taskcache import cached_task_fn

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _excl_cumsum(a: np.ndarray) -> np.ndarray:
    out = np.cumsum(a)
    return np.concatenate([[0], out[:-1]]).astype(np.int64)


class _GramCounts:
    """Sorted-array count lookup over 128-bit (h1, h2) gram keys —
    the counting sibling of decontam._GramIndex (same cold-loop
    handling of equal-h1 runs)."""

    def __init__(self, h1: np.ndarray, h2: np.ndarray, cnt: np.ndarray):
        order = np.lexsort((h2, h1))
        self.e1 = np.ascontiguousarray(h1[order])
        self.e2 = np.ascontiguousarray(h2[order])
        self.c = np.ascontiguousarray(cnt[order].astype(np.int64))

    def get(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        out = np.zeros(len(h1), dtype=np.int64)
        if len(self.e1) == 0 or len(h1) == 0:
            return out
        lo = np.searchsorted(self.e1, h1, side="left")
        hi = np.searchsorted(self.e1, h1, side="right")
        one = np.flatnonzero(hi - lo == 1)
        m = self.e2[lo[one]] == h2[one]
        out[one[m]] = self.c[lo[one[m]]]
        multi = np.flatnonzero(hi - lo > 1)  # 64-bit-collision runs: cold
        for i in multi:
            for j in range(lo[i], hi[i]):
                if self.e2[j] == h2[i]:
                    out[i] = self.c[j]
                    break
        return out


def ref_gram_counts(
    ref_ds: "ray.data.Dataset",
    text_col: str = "text",
    max_ref_grams: int = 50_000_000,
) -> dict:
    """1/2/3-gram count tables of the REFERENCE corpus, folded to the
    driver as (h1, h2, cnt) arrays per order plus the unigram total.
    The reference side must be the SMALL side (cap is a hard error:
    silently dropping reference mass would skew every score)."""
    from ..functions.text import shingle_hashes2

    def explode(batch: pa.Table) -> pa.Table:
        cols = {"k": [], "h1": [], "h2": [], "c": []}
        for k in (1, 2, 3):
            h1, h2, _ = shingle_hashes2(batch[text_col], k=k)
            if len(h1):
                u, c = np.unique(np.stack([h1, h2], axis=1), axis=0,
                                 return_counts=True)
                cols["k"].append(np.full(len(u), k, np.int64))
                cols["h1"].append(u[:, 0].view(np.int64))
                cols["h2"].append(u[:, 1].view(np.int64))
                cols["c"].append(c.astype(np.int64))
        if not cols["k"]:
            e = np.zeros(0, np.int64)
            return pa.table({n: pa.array(e, pa.int64()) for n in cols})
        return pa.table({n: pa.array(np.concatenate(v), pa.int64())
                         for n, v in cols.items()})

    parts, total = [], 0
    for b in ref_ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        total += b.num_rows
        if total > max_ref_grams:
            raise ValueError(
                f"reference gram tables exceed max_ref_grams={max_ref_grams}; "
                "the LM reference must be the SMALL side")
        parts.append(b)
    if not parts:
        z = np.zeros(0, np.uint64)
        empty = (z, z.copy(), np.zeros(0, np.int64))
        return {1: empty, 2: empty, 3: empty, "t1": 0}
    df = pa.concat_tables(parts).to_pandas()
    out: dict = {}
    for k in (1, 2, 3):
        g = (df[df["k"] == k].groupby(["h1", "h2"], sort=False)["c"]
             .sum().reset_index())
        out[k] = (g["h1"].to_numpy(np.int64).view(np.uint64),
                  g["h2"].to_numpy(np.int64).view(np.uint64),
                  g["c"].to_numpy(np.int64))
    out["t1"] = int(df.loc[df["k"] == 1, "c"].sum())
    return out


def stupid_backoff_scores(
    ds: "ray.data.Dataset",
    ref_ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 10**6,
    max_ref_grams: int = 50_000_000,
    carry_cols: tuple = (),
) -> "ray.data.Dataset":
    """Per-document stupid-backoff LM score (see module docstring):
    returns ``(id_col, *carry_cols, n_tok, lm_score)`` with
    ``lm_score`` the exact integer Σ over tokens of the scaled
    floor-divided count ratios. ``carry_cols`` pass through unchanged
    (e.g. ``lang`` for downstream per-language bucketing) — a
    passthrough column beats a corpus-sized join. One shuffle-free
    pass over the corpus; the reference tables broadcast once."""
    carry_cols = tuple(carry_cols)
    tables = ref_gram_counts(ref_ds, text_col, max_ref_grams)
    blob_ref = ray.put(tables)

    class Score:
        def __init__(self, blob_ref, text_col, id_col, scale):
            t = ray.get(blob_ref)
            self.L1 = _GramCounts(*t[1])
            self.L2 = _GramCounts(*t[2])
            self.L3 = _GramCounts(*t[3])
            self.t1 = int(t["t1"])
            self.text_col, self.id_col, self.scale = text_col, id_col, scale

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..functions.text import shingle_hashes2

            S = np.int64(self.scale)
            T1 = max(self.t1, 1)
            u1, v1, r1 = shingle_hashes2(batch[self.text_col], k=1)
            u2, v2, _ = shingle_hashes2(batch[self.text_col], k=2)
            u3, v3, _ = shingle_hashes2(batch[self.text_col], k=3)
            nrows = batch.num_rows
            cnt = np.bincount(r1, minlength=nrows).astype(np.int64)
            first1 = _excl_cumsum(cnt)
            first2 = _excl_cumsum(np.maximum(cnt - 1, 0))
            first3 = _excl_cumsum(np.maximum(cnt - 2, 0))
            c1 = self.L1.get(u1, v1)
            c2 = self.L2.get(u2, v2)
            c3 = self.L3.get(u3, v3)

            n = len(r1)
            s = np.zeros(n, dtype=np.int64)
            if n:
                i = np.arange(n, dtype=np.int64) - first1[r1]
                # position 0: unigram level, no penalty
                m = np.flatnonzero(i == 0)
                s[m] = np.where(c1[m] > 0, c1[m] * S // T1, 0)
                # position 1: bigram level
                m = np.flatnonzero(i == 1)
                if len(m):
                    bi = first2[r1[m]]  # bigram starting at 0
                    cc2, c1p, c1t = c2[bi], c1[m - 1], c1[m]
                    s[m] = np.where(
                        cc2 > 0, cc2 * S // np.maximum(c1p, 1),
                        np.where(c1t > 0, 2 * c1t * S // (5 * T1), 0))
                # positions >= 2: trigram level
                m = np.flatnonzero(i >= 2)
                if len(m):
                    rm, im = r1[m], i[m]
                    tri = first3[rm] + (im - 2)
                    ctx = first2[rm] + (im - 2)
                    bi = first2[rm] + (im - 1)
                    cc3, ccx = c3[tri], c2[ctx]
                    cc2, c1p, c1t = c2[bi], c1[m - 1], c1[m]
                    s[m] = np.where(
                        cc3 > 0, cc3 * S // np.maximum(ccx, 1),
                        np.where(
                            cc2 > 0, 2 * cc2 * S // np.maximum(5 * c1p, 1),
                            np.where(c1t > 0, 4 * c1t * S // (25 * T1), 0)))
            tot = np.zeros(nrows, dtype=np.int64)
            np.add.at(tot, r1, s)  # int-exact (bincount sums in float)
            ids = batch[self.id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            cols = {self.id_col: ids}
            for c in carry_cols:
                cc = batch[c]
                cols[c] = cc.combine_chunks() if isinstance(
                    cc, pa.ChunkedArray) else cc
            cols["n_tok"] = pa.array(cnt, pa.int64())
            cols["lm_score"] = pa.array(tot, pa.int64())
            return pa.table(cols)

    return ds.map_batches(
        cached_task_fn(
            Score, cache_on=(blob_ref, text_col, id_col, scale, carry_cols),
            blob_ref=blob_ref, text_col=text_col, id_col=id_col, scale=scale,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


def perplexity_buckets(
    scores: "ray.data.Dataset",
    group_col: str = "lang",
    score_col: str = "lm_score",
    block_card_cap: int = 200_000,
) -> "ray.data.Dataset":
    """CCNet head/middle/tail corpus split (Wenzek et al. 2020 §4.4):
    per ``group_col`` (language), the corpus is cut at the exact
    discrete tertiles of the LM quality score — documents at or below
    the 1/3 threshold are ``tail`` (worst), at or below 2/3
    ``middle``, above it ``head``. CCNet buckets on LOW perplexity =
    best; here the stupid-backoff score is higher-is-better, so head
    is the top third.

    Exactness: thresholds are the values at 1-based ranks
    ``ceil(n/3)`` and ``ceil(2n/3)`` of the per-group sorted scores —
    exact integers from :func:`stages.quantiles.grouped_quantiles`
    (DuckDB ``quantile_disc`` semantics), so the bucket assignment is
    a pure integer comparison an SQL oracle reproduces bit-for-bit.

    Scale shape: ONE partial pass for the thresholds (bounded
    (group, score, count) partials — ``block_card_cap`` is a hard
    error, not a silent fallback), the tiny per-group threshold table
    broadcasts once, and the corpus streams through one shuffle-free
    assignment pass. Nothing corpus-sized gathers or shuffles.
    """
    from fractions import Fraction

    from .quantiles import grouped_quantiles

    th = grouped_quantiles(
        scores, [group_col], score_col,
        qs=(Fraction(1, 3), Fraction(2, 3)),
        block_card_cap=block_card_cap,
    ).to_pandas()  # 2 rows per group
    # grouped_quantiles emits group keys STRINGIFIED (composite-gkey
    # split); normalize lookups via str() on both sides, and make a
    # miss a hard error — a silent default threshold would bucket a
    # whole group wrong without a trace
    t1 = {str(r[group_col]): int(r["value"])
          for _, r in th.iterrows() if int(r["qe2"]) == 33}
    t2 = {str(r[group_col]): int(r["value"])
          for _, r in th.iterrows() if int(r["qe2"]) == 66}
    th_ref = ray.put((t1, t2))

    def assign(batch: pa.Table, _ref=th_ref) -> pa.Table:
        lo, hi = ray.get(_ref)
        g = [str(k) for k in batch[group_col].to_pylist()]
        s = batch[score_col].to_numpy(zero_copy_only=False)
        try:
            a = np.array([lo[k] for k in g], dtype=np.int64)
            b = np.array([hi[k] for k in g], dtype=np.int64)
        except KeyError as exc:  # pragma: no cover - defensive
            raise KeyError(
                f"perplexity_buckets: group {exc} missing from the "
                "threshold table — thresholds must be computed from "
                "the SAME dataset being bucketed") from exc
        bucket = np.where(s <= a, "tail", np.where(s <= b, "middle", "head"))
        return batch.append_column("bucket", pa.array(bucket, pa.string()))

    return scores.map_batches(
        assign, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

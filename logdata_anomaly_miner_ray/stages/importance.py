"""DSIR-style data-selection importance weights (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"):
score every document by how target-like its hashed-token feature
counts are, in two shuffle-free passes over the corpus.

Recast Ray-Data-first with the repo's exactness contract:

- features are whitespace tokens hashed into ``n_buckets`` via the
  first 4 hex nibbles of ``md5(token)`` — the one hash family DuckDB
  reproduces exactly (same idiom as the simhash/quota oracles), so
  the WHOLE pipeline is SQL-checkable;
- pass 1: per-block (target, raw) bucket-count partials — two
  ``n_buckets``-long int arrays per block, folded on the driver
  (bounded by block count × buckets, never by data);
- the per-bucket score broadcast to pass 2 is the EXACT-integer
  smoothed likelihood ratio
  ``s_b = ((ct_b+1)·(Tr+B)·scale) // ((cr_b+1)·(Tt+B))``
  (λ̂-target / λ̂-raw with add-1 smoothing, scaled and floored) —
  computed with Python ints on the driver and reproduced bit-exactly
  by DuckDB HUGEINT floor division. Because target ⊆ raw
  (ct_b ≤ cr_b), ``s_b ≤ scale·(Tr+B)/(Tt+B)`` ≈ scale / target
  fraction, so the int64 envelope holds at any corpus size for sane
  target fractions (asserted);
- pass 2: per-doc ``weight = Σ_tok s_bucket(tok)`` — a flat
  bucket-gather + segment ``bincount`` per block, no shuffle; output
  is one row per document (a score column, like quality scoring).

The checked integer weight ranks by the sum of per-feature
likelihood RATIOS; the faithful DSIR log-likelihood-ratio weight
(sum of logs) is exposed alongside as ``w_llr`` (float64) for users
— floats stay out of oracle-checked columns by the repo contract
(DuckDB's ln differs from numpy's by 1 ulp on ~25% of inputs,
measured).

Two hash tiers, identical plumbing: ``hash_mode="md5"`` (per-token
C-speed hashlib loop — the price of SQL reproducibility, same trade
as functions/hashing.simhash64_md5) for oracle-checked runs, and
``hash_mode="fast"`` (one vectorized ``pd.util.hash_pandas_object``
pass per block) for the 100-TB tier.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

__all__ = ["dsir_bucket_scores", "dsir_weights"]

_WS = r"\s+"  # RE2 ASCII class — identical in Arrow and DuckDB


def _flat_tokens(text: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(row_id per token, flat non-empty tokens) for one block."""
    toks = pc.split_pattern_regex(text, _WS)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "")
    km = keep.to_numpy(zero_copy_only=False)
    return rows[km], flat.filter(keep)


def _buckets_fast(flat: pa.Array, n_buckets: int) -> np.ndarray:
    """Vectorized bucket id per token (the 100-TB tier):
    ``pd.util.hash_pandas_object`` — one C pass over the column, no
    per-token Python call. Deterministic across processes/runs (fixed
    default hash key) but NOT reproducible in SQL; the md5 mode is
    the oracle-checkable one. Identical plumbing either way."""
    import pandas as pd

    if len(flat) == 0:
        return np.empty(0, dtype=np.int64)
    h = pd.util.hash_pandas_object(
        pd.Series(flat.to_pandas()), index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _buckets_md5(flat: pa.Array, n_buckets: int) -> np.ndarray:
    """Bucket id per token: int of the first 4 hex nibbles of
    md5(token), mod n_buckets — bit-identical to the DuckDB
    strpos-nibble idiom. C-speed hashlib loop over the flat column's
    buffers (no per-row Python string building)."""
    flat = flat.combine_chunks() if isinstance(
        flat, pa.ChunkedArray) else flat
    if len(flat) == 0:
        return np.empty(0, dtype=np.int64)
    if pa.types.is_large_string(flat.type):
        flat = flat.cast(pa.string())
    buf = flat.buffers()
    offsets = np.frombuffer(buf[1], dtype=np.int32,
                            count=len(flat) + 1, offset=flat.offset * 4)
    mv = memoryview(buf[2])
    out = np.fromiter(
        (int(hashlib.md5(mv[offsets[i]:offsets[i + 1]]).hexdigest()[:4], 16)
         for i in range(len(flat))),
        dtype=np.int64, count=len(flat))
    return out % np.int64(n_buckets)


def dsir_bucket_scores(
    ds: "ray.data.Dataset", *, target_col: str = "lang",
    target_value: str = "en", n_buckets: int = 64,
    text_col: str = "text", scale: int = 10**6,
    hash_mode: str = "md5",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pass 1: fold per-block (target, raw) bucket counts and return
    (s_b int64 scores, ct, cr). Partials are 2·n_buckets ints per
    block."""

    def part(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        rows, flat = _flat_tokens(text)
        bk = _hash_fn(hash_mode)(flat, n_buckets)
        tgt = pc.equal(batch[target_col], target_value).to_numpy(
            zero_copy_only=False)
        is_t = tgt[rows]
        cr = np.bincount(bk, minlength=n_buckets).astype(np.int64)
        ct = np.bincount(bk[is_t], minlength=n_buckets).astype(np.int64)
        return pa.table({"bk": pa.array(np.arange(n_buckets), pa.int64()),
                         "ct": pa.array(ct, pa.int64()),
                         "cr": pa.array(cr, pa.int64())})

    parts = ds.map_batches(
        part, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).to_pandas()
    g = parts.groupby("bk", sort=True)[["ct", "cr"]].sum()
    ct = g["ct"].to_numpy(np.int64)
    cr = g["cr"].to_numpy(np.int64)
    tt, tr = int(ct.sum()), int(cr.sum())
    b = int(n_buckets)
    s = np.array(
        [((int(c) + 1) * (tr + b) * scale) // ((int(r) + 1) * (tt + b))
         for c, r in zip(ct, cr)], dtype=np.int64)
    # int64 envelope: s_b <= scale*(Tr+B)/(Tt+B) since ct <= cr;
    # a doc weight sums dl of them — assert generous headroom
    assert int(s.max(initial=0)) < 2**62 // max(1, 10**6), (
        "dsir bucket score overflow risk: target fraction too small "
        "for this scale — lower `scale`")
    return s, ct, cr


def _hash_fn(mode: str):
    if mode == "md5":
        return _buckets_md5
    if mode == "fast":
        return _buckets_fast
    raise ValueError(f"unknown hash_mode {mode!r} (md5|fast)")


def dsir_weights(
    ds: "ray.data.Dataset", *, target_col: str = "lang",
    target_value: str = "en", n_buckets: int = 64,
    text_col: str = "text", id_col: str = "doc_id",
    scale: int = 10**6, hash_mode: str = "md5",
) -> "ray.data.Dataset":
    """Per-document importance weights → (doc_id, n_tok, weight,
    w_llr): ``weight`` = Σ per-token exact-integer ratio scores
    (oracle-checkable), ``w_llr`` = the faithful DSIR
    log-likelihood-ratio Σ (ln λ̂t − ln λ̂r) (float64, user-facing).
    Zero-token docs emit (0, 0, 0.0). Pass 2 is shuffle-free."""
    import ray

    s, ct, cr = dsir_bucket_scores(
        ds, target_col=target_col, target_value=target_value,
        n_buckets=n_buckets, text_col=text_col, scale=scale,
        hash_mode=hash_mode)
    b = int(n_buckets)
    tt, tr = int(ct.sum()), int(cr.sum())
    llr = (np.log(ct + 1.0) - np.log(tt + b)
           - np.log(cr + 1.0) + np.log(tr + b))
    ref = ray.put((s, llr))

    def score(batch: pa.Table) -> pa.Table:
        sv, lv = ray.get(ref)
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        rows, flat = _flat_tokens(text)
        bk = _hash_fn(hash_mode)(flat, n_buckets)
        n = batch.num_rows
        n_tok = np.bincount(rows, minlength=n).astype(np.int64)
        # integer weights sum via add.at (np.bincount only sums in
        # float64, which is exact only below 2^53)
        wi = np.zeros(n, dtype=np.int64)
        np.add.at(wi, rows, sv[bk])
        wl = np.zeros(n, dtype=np.float64)
        np.add.at(wl, rows, lv[bk])
        return pa.table({
            "doc_id": batch[id_col].cast(pa.int64()),
            "n_tok": pa.array(n_tok, pa.int64()),
            "weight": pa.array(wi, pa.int64()),
            "w_llr": pa.array(wl, pa.float64()),
        })

    return ds.map_batches(
        score, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)

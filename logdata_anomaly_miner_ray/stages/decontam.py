"""Eval-set decontamination and duplicate-span coverage.

Two corpus-hygiene operators a large-scale training-data pipeline
needs beyond near-dup detection (complementing stages/dedup.py):

- ``decontaminate``: flag training documents containing any word
  k-gram that also occurs in an EVAL/benchmark document set — the
  published n-gram-overlap decontamination procedure (Brown et al.
  2020 "Language Models are Few-Shot Learners" appendix C; also
  used by PaLM / Llama data cards). The eval side is small by
  definition (benchmarks), so its gram set broadcasts once via
  ``ray.put`` and the 100-TB training side is ONE shuffle-free
  ``map_batches`` pass.

- ``dup_span_coverage``: per document, how many of its w-gram
  positions are covered by a gram occurring in ≥2 DISTINCT
  documents — the gram-fingerprint recast of exact substring
  deduplication (Lee et al. 2022 "Deduplicating Training Data Makes
  Language Models Better"; suffix arrays are replaced by a bounded
  keyed shuffle of per-(doc, gram) count rows). The set of
  duplicated grams never materializes anywhere: cross-doc detection
  and per-doc partial sums happen inside one coarse-bucket
  ``map_groups``, and a second coarse groupby sums partials per doc.

Gram identity in BOTH operators is the 128-bit ``(h1, h2)`` pair
from ``functions.text.shingle_hashes2`` — two independent rolling
hashes, the same effectively-collision-free standard as the md5
content hash in exact dedup — because neither operator has an exact
string-verification tail (a single-hash collision would silently
alter counts; a 128-bit one cannot in practice). Raw text never
shuffles in either operator.
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


def _distinct_grams_per_row(arr, k: int):
    """(h1, h2, row_id) of each row's DISTINCT k-grams (uint64 ×2)."""
    from ..functions.text import shingle_hashes2

    h1, h2, rid = shingle_hashes2(arr, k=k)
    if len(h1) == 0:
        return h1, h2, rid
    order = np.lexsort((h2, h1, rid))
    h1, h2, rid = h1[order], h2[order], rid[order]
    keep = np.concatenate(
        [[True], (rid[1:] != rid[:-1]) | (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
    )
    return h1[keep], h2[keep], rid[keep]


def eval_gram_set(
    eval_ds: "ray.data.Dataset",
    text_col: str,
    k: int = 5,
    max_eval_grams: int = 50_000_000,
) -> pd.DataFrame:
    """Distinct word k-grams of the EVAL set as a two-column uint64
    frame (h1, h2), gathered to the driver.

    Eval/benchmark sets are small by definition — the gather is
    bounded by ``max_eval_grams`` (a hard error, not a silent
    truncation: dropping eval grams would under-flag contamination).
    50M grams ≈ 800 MB of hash pairs, far above any benchmark suite.
    """

    def explode(batch: pa.Table) -> pa.Table:
        h1, h2, _ = _distinct_grams_per_row(batch[text_col], k)
        if len(h1):  # block-local dedupe shrinks the gather
            u = np.unique(np.stack([h1, h2], axis=1), axis=0)
            h1, h2 = u[:, 0], u[:, 1]
        return pa.table(
            {"h1": pa.array(h1.view(np.int64), pa.int64()),
             "h2": pa.array(h2.view(np.int64), pa.int64())}
        )

    parts = []
    total = 0
    for b in eval_ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        total += b.num_rows
        if total > max_eval_grams:
            raise ValueError(
                f"eval gram set exceeds max_eval_grams={max_eval_grams}; "
                "the eval side of decontamination must be the SMALL side "
                "(raise the cap only with matching driver memory)"
            )
        parts.append(b)
    if not parts:
        return pd.DataFrame({"h1": np.zeros(0, np.int64), "h2": np.zeros(0, np.int64)})
    t = pa.concat_tables(parts)
    df = pd.DataFrame(
        {"h1": t["h1"].to_numpy(zero_copy_only=False),
         "h2": t["h2"].to_numpy(zero_copy_only=False)}
    )
    return df.drop_duplicates(ignore_index=True)


class _GramIndex:
    """Sorted-array membership over 128-bit (h1, h2) gram keys:
    h1 → searchsorted run, h2 verified within the equal-h1 run (no
    per-gram Python objects in the hot path)."""

    def __init__(self, d: dict):
        order = np.lexsort((d["h2"], d["h1"]))
        self.e1 = np.ascontiguousarray(d["h1"][order])
        self.e2 = np.ascontiguousarray(d["h2"][order])

    def member(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        lo = np.searchsorted(self.e1, h1, side="left")
        hi = np.searchsorted(self.e1, h1, side="right")
        hit = np.zeros(len(h1), dtype=bool)
        one = np.flatnonzero(hi - lo == 1)  # the ~always case
        hit[one] = self.e2[lo[one]] == h2[one]
        # an equal-h1 run longer than 1 needs a reference-internal
        # 64-bit hash collision (~E²/2⁶⁵ expected) — loop is cold
        for i in np.flatnonzero(hi - lo > 1):
            a, b = lo[i], hi[i]
            j = np.searchsorted(self.e2[a:b], h2[i])
            hit[i] = j < (b - a) and self.e2[a + j] == h2[i]
        return hit


def decontaminate(
    ds: "ray.data.Dataset",
    eval_ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    k: int = 5,
    max_eval_grams: int = 50_000_000,
) -> "ray.data.Dataset":
    """Flag training documents sharing any word k-gram with the eval
    set (Brown et al. 2020 appendix-C n-gram decontamination).

    Returns a Dataset of ``(id_col, n_hits)`` — ``n_hits`` = number
    of the document's DISTINCT k-grams present in the eval gram set —
    with one row per contaminated document (``n_hits ≥ 1``).

    Scale shape: the eval gram set (small side) broadcasts ONCE as a
    ``ray.put`` blob and each worker process builds its membership
    index once (task-cached); the training corpus streams through a
    single shuffle-free ``map_batches`` pass — per batch, distinct
    128-bit gram keys are joined against the index with a vectorized
    pandas hash merge and hit counts segment-reduce per row. Output
    is only the contaminated rows, so nothing corpus-sized gathers.
    """
    grams = eval_gram_set(eval_ds, text_col, k=k, max_eval_grams=max_eval_grams)
    blob = ray.put({"h1": grams["h1"].to_numpy(), "h2": grams["h2"].to_numpy()})

    class Decontaminate:
        def __init__(self, blob_ref, text_col: str, id_col: str, k: int):
            self.idx = _GramIndex(ray.get(blob_ref))
            self.text_col, self.id_col, self.k = text_col, id_col, k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[self.id_col].to_numpy(zero_copy_only=False)
            h1, h2, rid = _distinct_grams_per_row(batch[self.text_col], self.k)
            empty = pa.table(
                {self.id_col: pa.array([], pa.int64()),
                 "n_hits": pa.array([], pa.int64())}
            )
            if len(h1) == 0 or len(self.idx.e1) == 0:
                return empty
            hit = self.idx.member(h1.view(np.int64), h2.view(np.int64))
            if not hit.any():
                return empty
            n_hits = np.bincount(rid[hit], minlength=len(ids))
            nz = np.flatnonzero(n_hits)
            return pa.table(
                {self.id_col: pa.array(ids[nz].astype(np.int64), pa.int64()),
                 "n_hits": pa.array(n_hits[nz].astype(np.int64), pa.int64())}
            )

    return ds.map_batches(
        cached_task_fn(
            Decontaminate, cache_on=(blob, text_col, id_col, k),
            blob_ref=blob, text_col=text_col, id_col=id_col, k=k,
        ),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def oov_gram_rate(
    ds: "ray.data.Dataset",
    ref_ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    k: int = 3,
    max_ref_grams: int = 50_000_000,
) -> "ray.data.Dataset":
    """Reference-corpus novelty score — the integer-exact recast of
    CCNet-style LM-perplexity quality filtering (Wenzek et al. 2020):
    per document, how many of its DISTINCT word k-grams are UNSEEN in
    a reference corpus. A high OOV fraction marks out-of-domain or
    garbled text exactly where a reference-trained LM would assign
    high perplexity, but the counts are integers, so the result is
    bit-reproducible (no float LM scores).

    Returns ``(id_col, n_grams, n_oov)`` — one row per document with
    ≥1 k-gram. Scale shape identical to ``decontaminate``: the
    reference gram set broadcasts once, the corpus streams through
    ONE shuffle-free pass.
    """
    grams = eval_gram_set(ref_ds, text_col, k=k, max_eval_grams=max_ref_grams)
    blob = ray.put({"h1": grams["h1"].to_numpy(), "h2": grams["h2"].to_numpy()})

    class Oov:
        def __init__(self, blob_ref, text_col: str, id_col: str, k: int):
            self.idx = _GramIndex(ray.get(blob_ref))
            self.text_col, self.id_col, self.k = text_col, id_col, k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[self.id_col].to_numpy(zero_copy_only=False)
            h1, h2, rid = _distinct_grams_per_row(batch[self.text_col], self.k)
            if len(h1) == 0:
                return pa.table(
                    {self.id_col: pa.array([], pa.int64()),
                     "n_grams": pa.array([], pa.int64()),
                     "n_oov": pa.array([], pa.int64())}
                )
            if len(self.idx.e1) == 0:
                hit = np.zeros(len(h1), dtype=bool)
            else:
                hit = self.idx.member(h1.view(np.int64), h2.view(np.int64))
            n_grams = np.bincount(rid, minlength=len(ids))
            n_oov = np.bincount(rid[~hit], minlength=len(ids))
            nz = np.flatnonzero(n_grams)
            return pa.table(
                {self.id_col: pa.array(ids[nz].astype(np.int64), pa.int64()),
                 "n_grams": pa.array(n_grams[nz].astype(np.int64), pa.int64()),
                 "n_oov": pa.array(n_oov[nz].astype(np.int64), pa.int64())}
            )

    return ds.map_batches(
        cached_task_fn(
            Oov, cache_on=(blob, text_col, id_col, k, "oov"),
            blob_ref=blob, text_col=text_col, id_col=id_col, k=k,
        ),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def _rebuild_kept_text(texts, ids: np.ndarray, dup_window_mask, w: int):
    """Vectorized cleaned-text assembly: drop every token of a
    duplicated window, join the kept tokens with single spaces (the
    window separator and the in-window token separator coincide, so
    the result equals the kept windows joined by ' ').

    ``dup_window_mask(doc_ids, win_ords) -> bool[n_windows]``.
    Returns ``(clean pa.StringArray, n_win, n_dup, keep_row_mask)``
    per input row; rows with no tokens or with every window
    duplicated get ``keep_row_mask=False``. Byte movement is one
    numpy gather/scatter over the batch's flat utf-8 buffer — no
    per-row Python."""
    from ..functions.text import _excl_cumsum, flat_utf8, token_spans

    data, offsets = flat_utf8(texts)
    nrows = len(offsets) - 1
    starts, ends, row_id = token_spans(data, offsets)
    n = len(starts)
    if n == 0:
        empty = pa.array([""] * nrows, pa.string())
        z = np.zeros(nrows, np.int64)
        return empty, z, z.copy(), np.zeros(nrows, bool)
    cnt = np.bincount(row_id, minlength=nrows)
    first = _excl_cumsum(cnt)
    j_in_row = np.arange(n, dtype=np.int64) - first[row_id]
    is_ws_start = (j_in_row % w) == 0
    ws_idx = np.flatnonzero(is_ws_start)
    win_of_tok = np.cumsum(is_ws_start) - 1
    win_row = row_id[ws_idx]
    win_ord = (j_in_row[ws_idx] // w).astype(np.int64)
    dup_w = dup_window_mask(ids[win_row].astype(np.int64), win_ord)
    n_win = np.bincount(win_row, minlength=nrows).astype(np.int64)
    n_dup = np.bincount(win_row[dup_w], minlength=nrows).astype(np.int64)

    keep_tok = ~dup_w[win_of_tok]
    ks, ke, krow = starts[keep_tok], ends[keep_tok], row_id[keep_tok]
    lens = (ke - ks).astype(np.int64)
    kept_cnt = np.bincount(krow, minlength=nrows).astype(np.int64)
    row_bytes = (
        np.bincount(krow, weights=lens, minlength=nrows).astype(np.int64)
        + np.maximum(kept_cnt - 1, 0)
    )
    out_offsets = _excl_cumsum(row_bytes)
    out = np.full(int(out_offsets[-1]), 32, np.uint8)  # gaps = separators
    seq = lens + 1
    gex = np.cumsum(seq) - seq  # global exclusive cumsum over kept tokens
    kfirst = _excl_cumsum(kept_cnt)
    base_per_row = np.zeros(nrows, np.int64)
    has = kept_cnt > 0
    base_per_row[has] = gex[kfirst[:-1][has]]
    dst_start = out_offsets[:-1][krow] + (gex - base_per_row[krow])
    total = int(lens.sum())
    if total:
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        out[np.repeat(dst_start, lens) + intra] = data[np.repeat(ks, lens) + intra]
    if int(out_offsets[-1]) >= 2**31:  # utf8 offsets are int32; Ray's
        # 128 MB block cap keeps real blocks far below this
        raise ValueError(
            "_rebuild_kept_text: block output exceeds 2 GiB; lower the "
            "input block size (DataContext.target_max_block_size)")
    clean = pa.Array.from_buffers(
        pa.utf8(), nrows,
        [None, pa.py_buffer(out_offsets.astype(np.int32).tobytes()),
         pa.py_buffer(out.tobytes())],
    )
    return clean, n_win, n_dup, has


def dup_span_rewrite(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    w: int = 8,
    n_sub_buckets: int = 256,
    n_doc_buckets: int = 64,
    broadcast_dup_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """Exact duplicate-WINDOW dedup REWRITE — the cleaned-corpus
    counterpart of ``dup_span_coverage`` (C4 / Lee et al. 2022 style:
    remove every non-overlapping w-token window whose exact token
    text occurs in ≥ 2 DISTINCT documents; alignment-sensitive by
    construction — the gram recast of the suffix-array procedure).

    Returns ``(id_col, clean_text, n_win, n_dup)`` — cleaned text =
    kept windows joined by single spaces (whitespace-normalizing for
    every document), one row per document with ≥ 1 KEPT window
    (all-duplicate and zero-token documents are dropped). A window
    repeated only WITHIN one document is kept.

    Scale shape: window identity is ``(h1, h2<<4|wlen)`` — the
    124-bit packing of ``functions.text.window_hashes``'s 128-bit +
    length identity (shuffle bytes 48 → 28 B/row, envelope-asserted).
    Pass A explodes one narrow row per (doc, window position) packed
    as ``id<<24|ord`` under a coarse gram bucket; one
    ``map_groups`` finds windows with ≥ 2 distinct docs and emits
    ONLY the duplicated (doc, window-ordinal) pairs. Pass B rewrites:
    below ``broadcast_dup_limit`` the dup-position pairs broadcast
    once (``ray.put``) and the corpus streams through one
    shuffle-free pass — raw text never moves; above it, text unions
    with the dup positions into ONE coarse doc-bucket groupby (the
    dup-heavy tier: text shuffles once, the standard union +
    coarse-key merge from CLAUDE.md). Tier choice traces via
    GRAFT_TRACE=1."""
    from ..functions.text import window_hashes
    from .bloom import _pair_member_mask, _sorted_pairs
    from .dedup import _dedup_trace

    if not 1 <= w < 16:
        raise ValueError("dup_span_rewrite: w must be in [1, 15] "
                         "(window length packs into 4 bits)")

    # shuffle-byte packing (round-4 verdict item: the 5M drill was
    # spill-bound on ~48 B/row): window identity (h1, h2, wl) packs to
    # (h1, h2<<4|wl) — a 124-bit identity, still far beyond collision
    # range — and position (id, ord) packs to id<<24|ord, with bm25-
    # style envelope asserts. 28 B/row with an int32 bucket key.
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h1, h2, wlen, word, rid = window_hashes(batch[text_col], w)
        h1i = h1.view(np.int64)
        docids = ids[rid].astype(np.int64)
        if len(docids):
            assert docids.min() >= 0 and docids.max() < 2**39, \
                "dup_span_rewrite: doc ids must fit 39 bits"
            assert word.max() < 2**24, \
                "dup_span_rewrite: >16M windows in one doc"
        h2w = (h2 << np.uint64(4)) | wlen.astype(np.uint64)
        ido = (docids << np.int64(24)) | word.astype(np.int64)
        return pa.table(
            {
                "gk": pa.array((h1i % np.int64(n_sub_buckets)).astype(np.int32),
                               pa.int32()),
                "h1": pa.array(h1i, pa.int64()),
                "h2w": pa.array(h2w.view(np.int64), pa.int64()),
                "ido": pa.array(ido, pa.int64()),
            }
        )

    def find_dups(g: pd.DataFrame) -> pa.Table:
        h1 = g["h1"].to_numpy()
        h2w = g["h2w"].to_numpy()
        ido = g["ido"].to_numpy()
        # packed ido sorts as (id, ord) — id-major by construction
        order = np.lexsort((ido, h2w, h1))
        h1, h2w, ido = h1[order], h2w[order], ido[order]
        ids = ido >> 24
        new = np.concatenate(
            [[True], (h1[1:] != h1[:-1]) | (h2w[1:] != h2w[:-1])]
        )
        run_id = np.cumsum(new) - 1
        new_doc = new | np.concatenate([[True], ids[1:] != ids[:-1]])
        ndoc = np.bincount(run_id, weights=new_doc)
        dup = ndoc[run_id] >= 2
        return pa.table(
            {id_col: pa.array(ids[dup], pa.int64()),
             "ord": pa.array(ido[dup] & np.int64(0xFFFFFF), pa.int64())}
        )

    from ._shuffle import shuffle_parallelism

    # ---- pass A census: per-block window-identity doc counts (the
    # dup_span_coverage broadcast shape) — when the dup-window SET is
    # small enough to broadcast, dup positions come from a
    # shuffle-free membership pass and the per-position all-to-all
    # never happens; otherwise fall back to the keyed shuffle ----
    def win_partials(batch: pa.Table) -> pa.Table:
        schema = {"gk": pa.int32(), "h1": pa.int64(), "h2w": pa.int64(),
                  "nd": pa.int64()}
        h1, h2, wlen, word, rid = window_hashes(batch[text_col], w)
        if len(h1) == 0:
            return pa.table({c: pa.array([], tp) for c, tp in schema.items()})
        h2w = ((h2 << np.uint64(4)) | wlen.astype(np.uint64)).view(np.int64)
        h1i = h1.view(np.int64)
        order = np.lexsort((rid, h2w, h1i))
        h1i, h2w, rid = h1i[order], h2w[order], rid[order]
        new = np.concatenate(
            [[True], (h1i[1:] != h1i[:-1]) | (h2w[1:] != h2w[:-1])
             | (rid[1:] != rid[:-1])])
        h1i, h2w = h1i[new], h2w[new]
        newg = np.concatenate(
            [[True], (h1i[1:] != h1i[:-1]) | (h2w[1:] != h2w[:-1])])
        starts = np.flatnonzero(newg)
        nd = np.diff(np.append(starts, len(h1i)))
        h1i, h2w = h1i[starts], h2w[starts]
        return pa.table({
            "gk": pa.array((h1i % np.int64(n_sub_buckets)).astype(np.int32),
                           pa.int32()),
            "h1": pa.array(h1i, pa.int64()),
            "h2w": pa.array(h2w, pa.int64()),
            "nd": pa.array(nd.astype(np.int64), pa.int64()),
        })

    def dup_wins(g: pd.DataFrame) -> pa.Table:
        order = np.lexsort((g["h2w"].to_numpy(), g["h1"].to_numpy()))
        h1 = g["h1"].to_numpy()[order]
        h2w = g["h2w"].to_numpy()[order]
        nd = g["nd"].to_numpy()[order]
        new = np.concatenate(
            [[True], (h1[1:] != h1[:-1]) | (h2w[1:] != h2w[:-1])])
        run_id = np.cumsum(new) - 1
        tot = np.bincount(run_id, weights=nd)
        keep = new & (tot[run_id] >= 2)
        return pa.table({"h1": pa.array(h1[keep], pa.int64()),
                         "h2w": pa.array(h2w[keep], pa.int64())})

    dupw = (
        ds.map_batches(win_partials, batch_format="pyarrow",
                       batch_size=None, zero_copy_batch=True)
        .repartition(shuffle_parallelism())
        .groupby("gk")
        .map_groups(dup_wins, batch_format="pandas")
    ).materialize()
    n_dup_wins = dupw.count()

    if n_dup_wins <= broadcast_dup_limit:
        _dedup_trace("dup_span_rewrite: broadcast window-set detection "
                     "(%d dup windows)", n_dup_wins)
        h1s, h2s = [], []
        for b in dupw.iter_batches(batch_format="pyarrow"):
            h1s.append(b["h1"].to_numpy(zero_copy_only=False))
            h2s.append(b["h2w"].to_numpy(zero_copy_only=False))
        wpairs = _sorted_pairs(
            np.concatenate(h1s).view(np.uint64) if h1s
            else np.zeros(0, np.uint64),
            np.concatenate(h2s).view(np.uint64) if h2s
            else np.zeros(0, np.uint64),
        )
        wpref = ray.put(wpairs)

        class DupPositions:
            def __init__(self, wpref, text_col, id_col, w):
                self.pairs = ray.get(wpref)
                self.text_col, self.id_col, self.w = text_col, id_col, w

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = batch[self.id_col].to_numpy(zero_copy_only=False)
                h1, h2, wlen, word, rid = window_hashes(
                    batch[self.text_col], self.w)
                h2w = (h2 << np.uint64(4)) | wlen.astype(np.uint64)
                hit = _pair_member_mask(self.pairs, h1, h2w)
                return pa.table({
                    self.id_col: pa.array(
                        ids[rid[hit]].astype(np.int64), pa.int64()),
                    "ord": pa.array(word[hit].astype(np.int64), pa.int64()),
                })

        dup_pos = ds.map_batches(
            cached_task_fn(
                DupPositions, cache_on=(wpref, text_col, id_col, w, "dsrw"),
                wpref=wpref, text_col=text_col, id_col=id_col, w=w),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ).materialize()
    else:
        _dedup_trace("dup_span_rewrite: keyed-shuffle detection "
                     "(%d dup windows)", n_dup_wins)
        dup_pos = (
            ds.map_batches(
                explode, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True
            )
            .repartition(shuffle_parallelism())  # narrow rows: size the
            # shuffle matrix to the cluster, not the input block count
            .groupby("gk")
            .map_groups(find_dups, batch_format="pandas")
        ).materialize()  # narrow (id, ord) dup rows only

    out_schema = {
        id_col: pa.int64(), "clean_text": pa.string(),
        "n_win": pa.int64(), "n_dup": pa.int64(),
    }

    def rewrite_table(texts, ids: np.ndarray, pairs: np.ndarray) -> pa.Table:
        def mask(doc_ids: np.ndarray, ords: np.ndarray) -> np.ndarray:
            return _pair_member_mask(
                pairs, doc_ids.astype(np.uint64), ords.astype(np.uint64)
            )

        clean, n_win, n_dup, keep = _rebuild_kept_text(texts, ids, mask, w)
        k = np.flatnonzero(keep)
        return pa.table(
            {
                id_col: pa.array(ids[k].astype(np.int64), pa.int64()),
                "clean_text": clean.take(pa.array(k, pa.int64())),
                "n_win": pa.array(n_win[k], pa.int64()),
                "n_dup": pa.array(n_dup[k], pa.int64()),
            }
        )

    return _two_tier_pos_rewrite(
        ds, dup_pos, rewrite_table, text_col, id_col, out_schema,
        broadcast_dup_limit, n_doc_buckets, cache_key=(w,),
        trace_name="dup_span_rewrite",
    )


def _two_tier_pos_rewrite(
    ds: "ray.data.Dataset",
    dup_pos: "ray.data.Dataset",
    rewrite_table,
    text_col: str,
    id_col: str,
    out_schema: dict,
    broadcast_dup_limit: int,
    n_doc_buckets: int,
    cache_key: tuple = (),
    trace_name: str = "pos_rewrite",
):
    """Shared pass-B machinery for position-keyed corpus rewrites
    (``dup_span_rewrite``, ``paragraph_dedup``): attach a narrow
    (id, ord) drop-position Dataset to the corpus and rewrite every
    document with ``rewrite_table(texts, ids, sorted_pairs)``.

    Below ``broadcast_dup_limit`` positions, the pairs broadcast
    once (``ray.put``) and the corpus streams through ONE
    shuffle-free task-cached pass — raw text never moves. Above it
    (dup-heavy corpora), text unions with the positions into ONE
    coarse doc-bucket groupby (the standing union + coarse-key merge
    replacement for Dataset.join). Tier choice traces via
    GRAFT_TRACE=1."""
    from .bloom import _sorted_pairs
    from .dedup import _dedup_trace

    n_dup_pos = dup_pos.count()
    tier = "broadcast" if n_dup_pos <= broadcast_dup_limit else "shuffle"
    _dedup_trace("%s: %d dup positions, tier=%s", trace_name, n_dup_pos, tier)

    if tier == "broadcast":
        if n_dup_pos == 0:
            pairs_np = np.empty((0, 2), np.uint64)
        else:
            dp = dup_pos.to_pandas()
            pairs_np = _sorted_pairs(
                dp[id_col].to_numpy(np.uint64), dp["ord"].to_numpy(np.uint64)
            )
        pairs_ref = ray.put(pairs_np)

        class Rewrite:
            def __init__(self, pairs_ref, text_col, id_col):
                self.pairs = ray.get(pairs_ref)
                self.text_col, self.id_col = text_col, id_col

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = batch[self.id_col].to_numpy(zero_copy_only=False)
                return rewrite_table(batch[self.text_col], ids, self.pairs)

        return ds.map_batches(
            cached_task_fn(
                Rewrite, cache_on=(pairs_ref, text_col, id_col) + cache_key,
                pairs_ref=pairs_ref, text_col=text_col, id_col=id_col,
            ),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )

    # dup-heavy tier: union text + dup positions under a coarse doc
    # bucket; groupby UDFs return ARROW tables (CLAUDE.md: keeps empty
    # output partitions' block types uniform)
    def tag_text(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "dk": pa.array(ids % np.int64(n_doc_buckets), pa.int64()),
                id_col: pa.array(ids, pa.int64()),
                "txt": batch[text_col].cast(pa.string()),
                "ord": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
            }
        )

    def tag_pos(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "dk": pa.array(ids % np.int64(n_doc_buckets), pa.int64()),
                id_col: pa.array(ids, pa.int64()),
                "txt": pa.array([None] * len(ids), pa.string()),
                "ord": batch["ord"],
            }
        )

    from ._shuffle import shuffle_parallelism

    tagged = ds.map_batches(
        tag_text, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).union(
        dup_pos.map_batches(
            tag_pos, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    ).repartition(shuffle_parallelism())
    # ^ coalesce (no shuffle): the sort-shuffle matrix follows INPUT
    # block count (CLAUDE.md round-4); a many-file corpus otherwise
    # hands the groupby a 1000²-cell matrix and the run goes
    # driver-scheduling-bound (observed at 50M rows / 1000 files)

    def rewrite_group(g: pd.DataFrame) -> pa.Table:
        is_text = g["ord"].to_numpy() < 0
        tx = g[is_text]
        if not len(tx):
            return pa.table({c: pa.array([], tp) for c, tp in out_schema.items()})
        pos = g[~is_text]
        pairs = _sorted_pairs(
            pos[id_col].to_numpy(np.uint64), pos["ord"].to_numpy(np.uint64)
        )
        return rewrite_table(
            pa.array(tx["txt"].tolist(), pa.string()),
            tx[id_col].to_numpy(np.int64), pairs,
        )

    return tagged.groupby("dk").map_groups(rewrite_group, batch_format="pandas")


def dup_span_coverage(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    w: int = 8,
    n_sub_buckets: int = 256,
    n_doc_buckets: int = 256,
    broadcast_dup_limit: int = 10_000_000,
) -> "ray.data.Dataset":
    """Per-document duplicate-span coverage: of a document's w-gram
    positions, how many carry a gram occurring in ≥2 DISTINCT
    documents (gram-fingerprint recast of Lee et al. 2022 exact
    substring dedup; the W-token window replaces the 50-char
    suffix-array threshold).

    Returns a Dataset of ``(id_col, n_pos, n_dup_pos)`` — total gram
    positions and duplicated-gram positions — one row per document
    with ≥1 gram (documents shorter than w tokens emit nothing).

    Two execution tiers, decided by the DUP-GRAM count (the
    decontaminate shape):

    - **broadcast tier** (≤ ``broadcast_dup_limit`` dup grams —
      typical corpora): pass A shuffles per-block GRAM-COUNT partials
      ``(gk:int32, h1, h2, nd)`` — one row per distinct gram per
      block, pre-summed (documents never span blocks, so block
      distinct-doc counts sum exactly) — one coarse groupby emits
      only grams seen in ≥2 docs; the dup set broadcasts once
      (``ray.put``, 16 B/gram) and pass B streams the corpus through
      ONE shuffle-free membership pass. Doc-gram rows never shuffle.
    - **scale tier** (dup-heavy corpora): the single keyed shuffle of
      per-(doc, distinct gram) rows packed as ``(gk:int32, h1, h2,
      id<<24|cnt)`` (28 B/row under envelope asserts); a
      ``groupby(gk).map_groups`` detects cross-document grams by run
      length over the sorted 128-bit keys and immediately
      segment-sums per-document partials, so the dup-gram set never
      materializes; a second coarse groupby on
      ``id % n_doc_buckets`` sums the partials into exact
      per-document totals. (Pass A runs first either way — its
      reduced rows are the cheap census that picks the tier; a
      dup-heavy corpus pays it once, trace via GRAFT_TRACE=1.)

    Raw text never shuffles in either tier.
    """
    import ray

    from ..functions.text import shingle_hashes2
    from ._shuffle import shuffle_parallelism
    from .bloom import _pair_member_mask, _sorted_pairs
    from .dedup import _dedup_trace

    # ---- pass A: per-block gram-count partials → dup-gram set ----
    def gram_partials(batch: pa.Table) -> pa.Table:
        schema = {"gk": pa.int32(), "h1": pa.int64(), "h2": pa.int64(),
                  "nd": pa.int64()}
        h1, h2, rid = shingle_hashes2(batch[text_col], k=w)
        if len(h1) == 0:
            return pa.table({c: pa.array([], tp) for c, tp in schema.items()})
        # distinct (doc, gram), then docs-per-gram within the block
        order = np.lexsort((rid, h2, h1))
        h1, h2, rid = h1[order], h2[order], rid[order]
        new = (
            np.concatenate([[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
                            | (rid[1:] != rid[:-1])])
        )
        h1, h2 = h1[new], h2[new]
        newg = np.concatenate(
            [[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        )
        starts = np.flatnonzero(newg)
        nd = np.diff(np.append(starts, len(h1)))
        h1, h2 = h1[starts], h2[starts]
        h1i = h1.view(np.int64)
        return pa.table({
            "gk": pa.array((h1i % np.int64(n_sub_buckets)).astype(np.int32),
                           pa.int32()),
            "h1": pa.array(h1i, pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64()),
            "nd": pa.array(nd.astype(np.int64), pa.int64()),
        })

    def dup_grams(g: pd.DataFrame) -> pa.Table:
        order = np.lexsort((g["h2"].to_numpy(), g["h1"].to_numpy()))
        h1 = g["h1"].to_numpy()[order]
        h2 = g["h2"].to_numpy()[order]
        nd = g["nd"].to_numpy()[order]
        new = np.concatenate([[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])])
        run_id = np.cumsum(new) - 1
        tot = np.bincount(run_id, weights=nd)
        keep = new & (tot[run_id] >= 2)
        return pa.table({"h1": pa.array(h1[keep], pa.int64()),
                         "h2": pa.array(h2[keep], pa.int64())})

    dup = (
        ds.map_batches(gram_partials, batch_format="pyarrow",
                       batch_size=None, zero_copy_batch=True)
        .repartition(shuffle_parallelism())
        .groupby("gk")
        .map_groups(dup_grams, batch_format="pandas")
    ).materialize()
    n_dup_grams = dup.count()

    if n_dup_grams <= broadcast_dup_limit:
        _dedup_trace("dup_span_coverage: broadcast tier (%d dup grams)",
                     n_dup_grams)
        h1s, h2s = [], []
        for b in dup.iter_batches(batch_format="pyarrow"):
            h1s.append(b["h1"].to_numpy(zero_copy_only=False))
            h2s.append(b["h2"].to_numpy(zero_copy_only=False))
        pairs = _sorted_pairs(
            np.concatenate(h1s).view(np.uint64) if h1s else np.zeros(0, np.uint64),
            np.concatenate(h2s).view(np.uint64) if h2s else np.zeros(0, np.uint64),
        )
        pref = ray.put(pairs)

        class Cover:
            def __init__(self, pref, text_col, id_col, w):
                self.pairs = ray.get(pref)
                self.text_col, self.id_col, self.w = text_col, id_col, w

            def __call__(self, batch: pa.Table) -> pa.Table:
                h1, h2, rid = shingle_hashes2(batch[self.text_col], k=self.w)
                n = batch.num_rows
                n_pos = np.bincount(rid, minlength=n)
                hit = _pair_member_mask(self.pairs, h1, h2)
                n_dup = np.bincount(rid[hit], minlength=n)
                keep = n_pos >= 1
                k = np.flatnonzero(keep)
                return pa.table({
                    self.id_col: batch[self.id_col].cast(pa.int64()).take(
                        pa.array(k, pa.int64())),
                    "n_pos": pa.array(n_pos[k].astype(np.int64), pa.int64()),
                    "n_dup_pos": pa.array(n_dup[k].astype(np.int64),
                                          pa.int64()),
                })

        from ._taskcache import cached_task_fn

        return ds.map_batches(
            cached_task_fn(Cover, cache_on=(pref, text_col, id_col, w),
                           pref=pref, text_col=text_col, id_col=id_col, w=w),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )

    _dedup_trace("dup_span_coverage: scale tier (%d dup grams)", n_dup_grams)

    # ---- scale tier: single keyed shuffle of per-(doc, gram) rows ----
    # shuffle-byte packing (see dup_span_rewrite): (id, cnt) packs to
    # id<<24|cnt with envelope asserts; 28 B/row with an int32 bucket.
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        schema = {
            "gk": pa.int32(), "h1": pa.int64(), "h2": pa.int64(),
            "idc": pa.int64(),
        }
        h1, h2, rid = shingle_hashes2(batch[text_col], k=w)
        if len(h1) == 0:
            return pa.table({c: pa.array([], tp) for c, tp in schema.items()})
        order = np.lexsort((h2, h1, rid))
        h1, h2, rid = h1[order], h2[order], rid[order]
        new = np.concatenate(
            [[True], (rid[1:] != rid[:-1]) | (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        )
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(h1)))
        h1, h2, rid = h1[starts], h2[starts], rid[starts]
        h1i = h1.view(np.int64)
        docids = ids[rid].astype(np.int64)
        assert docids.min() >= 0 and docids.max() < 2**39, \
            "dup_span_coverage: doc ids must fit 39 bits"
        assert cnt.max() < 2**24, \
            "dup_span_coverage: one gram repeats >16M times in a doc"
        return pa.table(
            {
                "gk": pa.array((h1i % np.int64(n_sub_buckets)).astype(np.int32),
                               pa.int32()),
                "h1": pa.array(h1i, pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
                "idc": pa.array((docids << np.int64(24)) | cnt.astype(np.int64),
                                pa.int64()),
            }
        )

    from ._shuffle import shuffle_parallelism

    exploded = ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).repartition(shuffle_parallelism())  # narrow rows: size the
    # shuffle matrix to the cluster, not the input block count

    def bucket_partials(g: pd.DataFrame) -> pa.Table:
        # rows are unique per (doc, gram) globally → within the full
        # gk bucket, a (h1, h2) run's length IS its distinct-doc count
        order = np.lexsort((g["h2"].to_numpy(), g["h1"].to_numpy()))
        h1 = g["h1"].to_numpy()[order]
        h2 = g["h2"].to_numpy()[order]
        idc = g["idc"].to_numpy()[order]
        ids = idc >> 24
        cnt = idc & np.int64(0xFFFFFF)
        new = np.concatenate([[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])])
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        dup = run_len[run_id] >= 2
        uids, uinv = np.unique(ids, return_inverse=True)
        n_pos = np.bincount(uinv, weights=cnt, minlength=len(uids))
        n_dup = np.bincount(uinv[dup], weights=cnt[dup], minlength=len(uids))
        return pa.table(
            {
                "dk": pa.array(uids % np.int64(n_doc_buckets), pa.int64()),
                id_col: pa.array(uids, pa.int64()),
                "n_pos": pa.array(n_pos.astype(np.int64), pa.int64()),
                "n_dup_pos": pa.array(n_dup.astype(np.int64), pa.int64()),
            }
        )

    partials = exploded.groupby("gk").map_groups(
        bucket_partials, batch_format="pandas"
    )

    def doc_totals(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(id_col, sort=True)[["n_pos", "n_dup_pos"]].sum()
        return pa.table(
            {
                id_col: pa.array(s.index.to_numpy(np.int64), pa.int64()),
                "n_pos": pa.array(s["n_pos"].to_numpy(np.int64), pa.int64()),
                "n_dup_pos": pa.array(s["n_dup_pos"].to_numpy(np.int64), pa.int64()),
            }
        )

    return partials.groupby("dk").map_groups(doc_totals, batch_format="pandas")


def paragraph_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_sub_buckets: int = 256,
    n_doc_buckets: int = 64,
    broadcast_dup_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """Corpus-wide PARAGRAPH-level exact dedup, keep-first (the CCNet
    paragraph-hash procedure, Wenzek et al. 2020 §3.1: paragraphs are
    normalized, hashed, and every later occurrence of an
    already-seen paragraph is removed across the whole corpus; also
    the paragraph stage of RefinedWeb). The AMiner analogue is
    NewMatchPathValueDetector's first-occurrence semantics
    (reference analysis/NewMatchPathValueDetector.py:24-116) applied
    per paragraph instead of per atom.

    A paragraph is a '\\n'-separated line. Normalization for the
    dedup key = collapse ``[ \\t\\r]+`` runs to one space + trim
    spaces (both RE2-expressible, mirrored verbatim by the SQL
    oracle); paragraphs whose normalized form is EMPTY are
    structural blanks and never participate. The kept occurrence is
    the globally first by ``(doc_id, line index)``; later repeats —
    including repeats inside the same document — are removed. The
    ORIGINAL (un-normalized) paragraph text is what survives into
    ``clean_text``.

    Returns one row per input document:
    ``(id_col, clean_text, n_paras, n_dropped)`` with clean_text =
    kept lines joined by '\\n'.

    Scale shape: paragraph identity is the 128-bit md5 ``(h1, h2)``
    of the normalized text (no exact-verification tail — a
    single-hash collision would silently drop a unique paragraph, a
    128-bit one cannot in practice). Pass A explodes ONE narrow row
    per participating (doc, paragraph) under a coarse hash bucket,
    repartitions to the cluster-sized shuffle matrix, and one
    ``map_groups`` emits ONLY the losing occurrences. Pass B is the
    shared two-tier rewrite (``_two_tier_pos_rewrite``): broadcast
    drop-pairs + one shuffle-free streaming pass below the limit,
    union + coarse doc-bucket groupby above it. Raw text never
    shuffles in the broadcast tier."""
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64_pair
    from ._shuffle import shuffle_parallelism

    def _split_lines(txt):
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        return pc.split_pattern(txt.cast(pa.string()), "\n")

    def _line_geometry(lines):
        flat = pc.list_flatten(lines)
        parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        nl = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        nl = nl.astype(np.int64)
        starts = np.cumsum(nl) - nl
        ords = np.arange(len(parent), dtype=np.int64) - starts[parent]
        return flat, parent.astype(np.int64), nl, ords

    _NORM_RE = "[ \t\r]+"

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, parent, _nl, ords = _line_geometry(_split_lines(batch[text_col]))
        norm = pc.utf8_trim(
            pc.replace_substring_regex(flat, _NORM_RE, " "), " ")
        part = pc.not_equal(norm, "").to_numpy(zero_copy_only=False)
        pidx = np.flatnonzero(part)
        h1, h2 = md5_u64_pair(norm.take(pa.array(pidx, pa.int64())))
        h1i = h1.view(np.int64)
        return pa.table(
            {
                "gk": pa.array(h1i % np.int64(n_sub_buckets), pa.int64()),
                "h1": pa.array(h1i, pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
                id_col: pa.array(ids[parent[pidx]], pa.int64()),
                "ord": pa.array(ords[pidx], pa.int64()),
            }
        )

    def find_losers(g: pd.DataFrame) -> pa.Table:
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        ids = g[id_col].to_numpy()
        ords = g["ord"].to_numpy()
        order = np.lexsort((ords, ids, h2, h1))
        h1, h2, ids, ords = h1[order], h2[order], ids[order], ords[order]
        new = np.concatenate(
            [[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])])
        lose = ~new  # every occurrence after the (doc_id, ord)-first
        return pa.table(
            {id_col: pa.array(ids[lose], pa.int64()),
             "ord": pa.array(ords[lose], pa.int64())}
        )

    from .bloom import _pair_lookup, _pair_member_mask
    from .dedup import _dedup_trace

    # ---- census tier (the dup_span broadcast shape, keep-first
    # flavor): per-block per-hash (min packed position, count)
    # partials — boilerplate paragraphs collapse to ONE row per block
    # — then only hashes with ≥2 occurrences broadcast with their
    # keeper position; losers come from a shuffle-free lookup pass.
    def census(batch: pa.Table) -> pa.Table:
        schema = {"gk": pa.int32(), "h1": pa.int64(), "h2": pa.int64(),
                  "mn": pa.int64(), "cnt": pa.int64()}
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, parent, _nl, ords = _line_geometry(_split_lines(batch[text_col]))
        norm = pc.utf8_trim(
            pc.replace_substring_regex(flat, _NORM_RE, " "), " ")
        part = pc.not_equal(norm, "").to_numpy(zero_copy_only=False)
        pidx = np.flatnonzero(part)
        if not len(pidx):
            return pa.table({c: pa.array([], tp) for c, tp in schema.items()})
        h1, h2 = md5_u64_pair(norm.take(pa.array(pidx, pa.int64())))
        h1i = h1.view(np.int64)
        h2i = h2.view(np.int64)
        docids = ids[parent[pidx]]
        o = ords[pidx]
        assert docids.min() >= 0 and docids.max() < 2**39, \
            "paragraph_dedup: doc ids must fit 39 bits"
        assert o.max() < 2**24, "paragraph_dedup: >16M lines in one doc"
        ido = (docids << np.int64(24)) | o
        order = np.lexsort((ido, h2i, h1i))
        h1i, h2i, ido = h1i[order], h2i[order], ido[order]
        new = np.concatenate(
            [[True], (h1i[1:] != h1i[:-1]) | (h2i[1:] != h2i[:-1])])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(h1i)))
        return pa.table({
            "gk": pa.array((h1i[starts] % np.int64(n_sub_buckets))
                           .astype(np.int32), pa.int32()),
            "h1": pa.array(h1i[starts], pa.int64()),
            "h2": pa.array(h2i[starts], pa.int64()),
            "mn": pa.array(ido[starts], pa.int64()),  # sorted → run min
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    def dup_keepers(g: pd.DataFrame) -> pa.Table:
        order = np.lexsort((g["h2"].to_numpy(), g["h1"].to_numpy()))
        h1 = g["h1"].to_numpy()[order]
        h2 = g["h2"].to_numpy()[order]
        mn = g["mn"].to_numpy()[order]
        cnt = g["cnt"].to_numpy()[order]
        new = np.concatenate(
            [[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])])
        run_id = np.cumsum(new) - 1
        tot = np.bincount(run_id, weights=cnt)
        keeper = np.full(run_id.max() + 1 if len(run_id) else 0,
                         np.iinfo(np.int64).max, np.int64)
        np.minimum.at(keeper, run_id, mn)
        keep = new & (tot[run_id] >= 2)
        return pa.table({"h1": pa.array(h1[keep], pa.int64()),
                         "h2": pa.array(h2[keep], pa.int64()),
                         "keeper": pa.array(keeper[run_id[keep]],
                                            pa.int64())})

    dupp = (
        ds.map_batches(census, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .repartition(shuffle_parallelism())
        .groupby("gk")
        .map_groups(dup_keepers, batch_format="pandas")
    ).materialize()
    n_dup_paras = dupp.count()

    if n_dup_paras <= broadcast_dup_limit:
        _dedup_trace("paragraph_dedup: broadcast census detection "
                     "(%d dup paragraphs)", n_dup_paras)
        h1s, h2s, ks = [], [], []
        for b in dupp.iter_batches(batch_format="pyarrow"):
            h1s.append(b["h1"].to_numpy(zero_copy_only=False))
            h2s.append(b["h2"].to_numpy(zero_copy_only=False))
            ks.append(b["keeper"].to_numpy(zero_copy_only=False))
        if h1s:
            p1 = np.concatenate(h1s).view(np.uint64)
            p2 = np.concatenate(h2s).view(np.uint64)
            kv = np.concatenate(ks)
            order = np.lexsort((p2, p1))
            ppairs = np.stack([p1[order], p2[order]], axis=1)
            kv = kv[order]
        else:
            ppairs = np.empty((0, 2), np.uint64)
            kv = np.zeros(0, np.int64)
        pref = ray.put((ppairs, kv))

        class Losers:
            def __init__(self, pref, text_col, id_col):
                self.pairs, self.keepers = ray.get(pref)
                self.text_col, self.id_col = text_col, id_col

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = batch[self.id_col].to_numpy(
                    zero_copy_only=False).astype(np.int64)
                flat, parent, _nl, ords = _line_geometry(
                    _split_lines(batch[self.text_col]))
                norm = pc.utf8_trim(
                    pc.replace_substring_regex(flat, _NORM_RE, " "), " ")
                part = pc.not_equal(norm, "").to_numpy(zero_copy_only=False)
                pidx = np.flatnonzero(part)
                if not len(pidx):
                    return pa.table({self.id_col: pa.array([], pa.int64()),
                                     "ord": pa.array([], pa.int64())})
                h1, h2 = md5_u64_pair(norm.take(pa.array(pidx, pa.int64())))
                docids = ids[parent[pidx]]
                o = ords[pidx]
                ido = (docids << np.int64(24)) | o
                hit, keeper = _pair_lookup(self.pairs, self.keepers, h1, h2)
                lose = hit & (ido != keeper)
                return pa.table({
                    self.id_col: pa.array(docids[lose], pa.int64()),
                    "ord": pa.array(o[lose], pa.int64()),
                })

        dup_pos = ds.map_batches(
            cached_task_fn(Losers, cache_on=(pref, text_col, id_col, "pdl"),
                           pref=pref, text_col=text_col, id_col=id_col),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ).materialize()
    else:
        _dedup_trace("paragraph_dedup: keyed-shuffle detection "
                     "(%d dup paragraphs)", n_dup_paras)
        dup_pos = (
            ds.map_batches(
                explode, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True,
            )
            .repartition(shuffle_parallelism())
            .groupby("gk")
            .map_groups(find_losers, batch_format="pandas")
        ).materialize()  # narrow loser (id, ord) rows only

    out_schema = {
        id_col: pa.int64(), "clean_text": pa.string(),
        "n_paras": pa.int64(), "n_dropped": pa.int64(),
    }

    def rewrite_table(texts, ids: np.ndarray, pairs: np.ndarray) -> pa.Table:
        ids = ids.astype(np.int64)
        flat, parent, nl, ords = _line_geometry(_split_lines(texts))
        drop = _pair_member_mask(
            pairs, ids[parent].astype(np.uint64), ords.astype(np.uint64))
        nrows = len(ids)
        n_dropped = np.bincount(
            parent[drop], minlength=nrows).astype(np.int64)
        kept_flat = flat.filter(pa.array(~drop))
        offsets = np.concatenate([[0], np.cumsum(nl - n_dropped)])
        rebuilt = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), kept_flat)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "clean_text": pc.binary_join(rebuilt, "\n"),
                "n_paras": pa.array(nl, pa.int64()),
                "n_dropped": pa.array(n_dropped, pa.int64()),
            }
        )

    return _two_tier_pos_rewrite(
        ds, dup_pos, rewrite_table, text_col, id_col, out_schema,
        broadcast_dup_limit, n_doc_buckets, cache_key=("para",),
        trace_name="paragraph_dedup",
    )

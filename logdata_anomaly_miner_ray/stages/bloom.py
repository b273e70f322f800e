"""Bloom-prefiltered incremental dedup against a prior corpus snapshot.

The recurring-crawl question — "which of these NEW documents did we
already ingest in a previous snapshot?" — is an exact membership test
of batch content hashes against snapshot content hashes. AMiner's
analogue is the in-process learned-value set of
NewMatchPathValueDetector (reference
aminer/analysis/NewMatchPathValueDetector.py:60-118: known_values
lookup, unseen -> anomaly + learn); this stage is its corpus-scale
recast with the standard Bloom-filter prefilter (Bloom 1970; Kirsch &
Mitzenmacher 2006 double hashing for the k probe positions).

Scale shape:

- snapshot -> per-block DISTINCT 128-bit md5 halves ``(h1, h2)``,
  materialized NARROW (16 B/doc — this is the persisted incremental
  index in a production pipeline, rebuilt here from text);
- a Bloom bitmap is stream-folded on the driver over that narrow
  dataset (memory = bitmap + one batch; the bitmap is the broadcast
  artifact, so it is bounded by one node's memory BY DEFINITION) and
  shipped once via ``ray.put``;
- the batch side is ONE shuffle-free pass: bloom-NEGATIVE rows are
  certainly new (no false negatives) and never travel anywhere;
  only bloom-POSITIVE rows (true dups + ~1% false positives) enter
  exact verification;
- exact verification is two-tier (the repo's standard pattern):
  candidate hashes below ``broadcast_candidate_limit`` verify via
  two broadcast passes (zero shuffles); above it, candidates union
  the snapshot hash dataset into ONE coarse-bucket groupby (hashes
  only — raw text never shuffles anywhere in this stage).

An undersized bitmap only raises the false-positive rate (more rows
enter exact verification); correctness NEVER depends on bloom
parameters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import md5_u64_pair
from ._taskcache import cached_task_fn
from .dedup import _dedup_trace

# probe count: with the auto-sized ~10 bits/item, k=4 gives ~1.2% FP
_NUM_HASHES = 4


def _positions(h1: np.ndarray, h2: np.ndarray, j: int, mask: np.uint64) -> np.ndarray:
    # Kirsch-Mitzenmacher: pos_j = (h1 + j*h2) mod m, m a power of two
    # (uint64 wraparound is harmless: build and probe use the same map)
    return (h1 + np.uint64(j) * h2) & mask


def _sorted_pairs(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """(n, 2) uint64 array lexsorted by (h1, h2), deduped."""
    if len(h1) == 0:
        return np.empty((0, 2), np.uint64)
    return np.unique(
        np.stack([h1.astype(np.uint64), h2.astype(np.uint64)], axis=1), axis=0
    )


def _pair_member_mask(
    sorted_pairs: np.ndarray, h1: np.ndarray, h2: np.ndarray
) -> np.ndarray:
    """Vectorized exact membership of (h1, h2) rows in a lexsorted
    pair array. The h1 searchsorted window is almost always width
    <=1 (128-bit hashes); wider windows (h1 collisions) fall back to
    a loop over just those rows."""
    n = len(h1)
    if n == 0 or len(sorted_pairs) == 0:
        return np.zeros(n, bool)
    h1 = h1.astype(np.uint64)
    h2 = h2.astype(np.uint64)
    c1, c2 = sorted_pairs[:, 0], sorted_pairs[:, 1]
    lo = np.searchsorted(c1, h1, side="left")
    hi = np.searchsorted(c1, h1, side="right")
    hit = np.zeros(n, bool)
    one = hi - lo == 1
    il = lo[one]
    hit[one] = c2[il] == h2[one]
    wide = np.nonzero(hi - lo > 1)[0]
    for i in wide:  # ~never: needs a 64-bit h1 collision
        hit[i] = h2[i] in c2[lo[i] : hi[i]]
    return hit


def _pair_lookup(
    sorted_pairs: np.ndarray, values: np.ndarray,
    h1: np.ndarray, h2: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """(hit_mask, looked-up values) of (h1, h2) rows against a
    lexsorted pair array with an ALIGNED value column — the keyed
    variant of :func:`_pair_member_mask` (same h1-window shape)."""
    n = len(h1)
    out = np.zeros(n, dtype=values.dtype if len(values) else np.int64)
    if n == 0 or len(sorted_pairs) == 0:
        return np.zeros(n, bool), out
    h1 = h1.astype(np.uint64)
    h2 = h2.astype(np.uint64)
    c1, c2 = sorted_pairs[:, 0], sorted_pairs[:, 1]
    lo = np.searchsorted(c1, h1, side="left")
    hi = np.searchsorted(c1, h1, side="right")
    hit = np.zeros(n, bool)
    one = hi - lo == 1
    il = lo[one]
    m = c2[il] == h2[one]
    hit[one] = m
    oidx = np.flatnonzero(one)[m]
    out[oidx] = values[il[m]]
    for i in np.nonzero(hi - lo > 1)[0]:  # ~never: 64-bit h1 collision
        for j in range(lo[i], hi[i]):
            if c2[j] == h2[i]:
                hit[i] = True
                out[i] = values[j]
                break
    return hit, out


def _hash_pairs_ds(
    ds: "ray.data.Dataset", text_col: str, id_col: str | None
) -> "ray.data.Dataset":
    """Narrow (h1, h2[, id]) projection; hashes deduped per block on
    the id-less (snapshot) side."""

    def stamp(batch: pa.Table) -> pa.Table:
        h1, h2 = md5_u64_pair(batch[text_col])
        cols = {"h1": pa.array(h1, pa.uint64()), "h2": pa.array(h2, pa.uint64())}
        if id_col is not None:
            cols[id_col] = batch[id_col]
            return pa.table(cols)
        return pa.table(cols).group_by(["h1", "h2"]).aggregate([])

    return ds.map_batches(
        stamp, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def build_bloom_bitmap(
    snap_hashes: "ray.data.Dataset", num_bits: int
) -> np.ndarray:
    """Fold a (h1, h2) hash dataset into a Bloom bitmap (uint64
    words) on the driver, streaming via ``iter_batches``."""
    assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of two"
    mask = np.uint64(num_bits - 1)
    words = np.zeros(num_bits >> 6, np.uint64)
    for batch in snap_hashes.iter_batches(batch_format="pyarrow"):
        h1 = batch["h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h2 = batch["h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
        for j in range(_NUM_HASHES):
            pos = _positions(h1, h2, j, mask)
            np.bitwise_or.at(
                words,
                (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
    return words


def _bloom_member_mask(
    words: np.ndarray, h1: np.ndarray, h2: np.ndarray, num_bits: int
) -> np.ndarray:
    mask = np.uint64(num_bits - 1)
    member = np.ones(len(h1), bool)
    for j in range(_NUM_HASHES):
        pos = _positions(h1, h2, j, mask)
        bits = (
            words[(pos >> np.uint64(6)).astype(np.int64)] >> (pos & np.uint64(63))
        ) & np.uint64(1)
        member &= bits.astype(bool)
        if not member.any():
            break
    return member


def _auto_bits(n_items: int, cap_log2: int = 33) -> int:
    """~10 bits per snapshot item, power of two, in [2^16, 2^cap]."""
    target = max(1 << 16, 10 * max(1, n_items))
    bits = 1 << int(np.ceil(np.log2(target)))
    return min(bits, 1 << cap_log2)


def bloom_new_ids(
    batch_ds: "ray.data.Dataset",
    snapshot_ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    num_bits: int | None = None,
    broadcast_candidate_limit: int = 2_000_000,
    n_groups: int = 256,
) -> "ray.data.Dataset":
    """ids of batch rows whose ``text_col`` content does NOT occur in
    the snapshot (exact, per batch row — within-batch duplicates are
    each reported as new).

    Identity is the full 128-bit md5 of the text (the same
    effectively-collision-free standard as ``exact_dup_groups``);
    the Bloom bitmap is a prefilter only. Tier decisions trace via
    GRAFT_TRACE=1 (tests assert tier engagement)."""
    snap_hashes = _hash_pairs_ds(snapshot_ds, text_col, None).materialize()
    if num_bits is None:
        num_bits = _auto_bits(snap_hashes.count())
    words_ref = ray.put(build_bloom_bitmap(snap_hashes, num_bits))

    class BloomStamp:
        def __init__(self):
            self.words = ray.get(words_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            h1, h2 = md5_u64_pair(batch[text_col])
            cand = _bloom_member_mask(self.words, h1, h2, num_bits)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "h1": pa.array(h1, pa.uint64()),
                    "h2": pa.array(h2, pa.uint64()),
                    "cand": pa.array(cand),
                }
            )

    # narrow (id, h1, h2, cand) — materialized so the candidate pass
    # and the final projection don't recompute the md5 scan
    stamped = batch_ds.map_batches(
        cached_task_fn(BloomStamp, cache_on=(words_ref, text_col, id_col, num_bits)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).materialize()

    def only(cand_val: bool, cols: list[str]):
        def f(t: pa.Table) -> pa.Table:
            m = t["cand"] if cand_val else pc.invert(t["cand"])
            return t.filter(m).select(cols)

        return f

    new_negatives = stamped.map_batches(
        only(False, [id_col]), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    candidates = stamped.map_batches(
        only(True, [id_col, "h1", "h2"]), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    )
    n_cand = candidates.count()
    _dedup_trace(
        "bloom_new_ids: %d candidates (bits=%d), tier=%s",
        n_cand, num_bits,
        "broadcast" if n_cand <= broadcast_candidate_limit else "shuffle",
    )

    if n_cand <= broadcast_candidate_limit:
        # tier 1 (zero shuffles): broadcast the candidate hash set,
        # one snapshot-hash pass keeps only hashes that are actual
        # candidates (<= n_cand rows survive), broadcast the matched
        # set back, final per-row filter on the stamped projection.
        if n_cand == 0:
            return new_negatives
        cand_pd = candidates.select_columns(["h1", "h2"]).to_pandas()
        cand_ref = ray.put(
            _sorted_pairs(
                cand_pd["h1"].to_numpy(np.uint64), cand_pd["h2"].to_numpy(np.uint64)
            )
        )

        class MatchSnap:
            def __init__(self):
                self.cand = ray.get(cand_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                hit = _pair_member_mask(
                    self.cand,
                    t["h1"].to_numpy(zero_copy_only=False),
                    t["h2"].to_numpy(zero_copy_only=False),
                )
                return t.filter(pa.array(hit))

        matched = snap_hashes.map_batches(
            cached_task_fn(MatchSnap, cache_on=(cand_ref,)),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ).to_pandas()
        if "h1" not in matched.columns:  # empty ds loses its schema
            m_pairs = np.empty((0, 2), np.uint64)
        else:
            m_pairs = _sorted_pairs(
                matched["h1"].to_numpy(np.uint64), matched["h2"].to_numpy(np.uint64)
            )
        m_ref = ray.put(m_pairs)

        class DropMatched:
            def __init__(self):
                self.matched = ray.get(m_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                hit = _pair_member_mask(
                    self.matched,
                    t["h1"].to_numpy(zero_copy_only=False),
                    t["h2"].to_numpy(zero_copy_only=False),
                )
                return t.filter(pa.array(~hit)).select([id_col])

        new_fp = candidates.map_batches(
            cached_task_fn(DropMatched, cache_on=(m_ref,)),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
        return new_negatives.union(new_fp)

    # tier 2 (dup-heavy batch): ONE coarse-bucket groupby over
    # candidate rows + snapshot hashes (16 B keys + ids only).
    # Groupby UDFs return ARROW tables (CLAUDE.md: keeps empty output
    # partitions' block types uniform).
    def tag(is_snap: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.append_column("snap", pa.array([is_snap] * t.num_rows, pa.int8()))
            if is_snap:
                # -1 sentinel, NOT null: a null in an int64 column
                # promotes the whole pandas group frame to float64,
                # silently rounding ids > 2^53 (CLAUDE.md trap)
                t = t.append_column(
                    id_col, pa.array(np.full(t.num_rows, -1, np.int64), pa.int64())
                )
            bucket = (
                t["h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
                % np.uint64(n_groups)
            ).astype(np.int64)
            return t.append_column("bucket", pa.array(bucket, pa.int64()))

        return f

    cand_tagged = candidates.map_batches(
        tag(0), batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    snap_tagged = snap_hashes.map_batches(
        tag(1), batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def resolve(g: pd.DataFrame) -> pa.Table:
        snap = g[g["snap"] == 1]
        seen = _sorted_pairs(
            snap["h1"].to_numpy(np.uint64), snap["h2"].to_numpy(np.uint64)
        )
        cand = g[g["snap"] == 0]
        hit = _pair_member_mask(
            seen, cand["h1"].to_numpy(np.uint64), cand["h2"].to_numpy(np.uint64)
        )
        return pa.table(
            {id_col: pa.array(cand[id_col].to_numpy(np.int64)[~hit], pa.int64())}
        )

    new_fp = (
        cand_tagged.union(snap_tagged)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
    )
    return new_negatives.union(new_fp)

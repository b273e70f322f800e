"""Content hashing and near-dup signatures (MinHash, SimHash).

AMiner dedups learned artifacts with exact Python sets (SURVEY.md
§2.7); a training-data pipeline needs document-level exact and
near-duplicate detection, so the engine adds:

- ``md5_hex`` content hash (matches DuckDB's ``md5()`` for the SQL
  oracle) → exact dedup via groupby on the hash;
- word-shingle MinHash signatures with banded LSH bucketing;
- 64-bit SimHash fingerprints;
- winnowing-style min-k shingle fingerprints.

All signature math is vectorized numpy over the shingle-hash arrays
produced by ``functions.text.shingle_hashes``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..state.sketches import splitmix64
from .text import flat_utf8, shingle_hashes


def md5_hex(arr) -> list[str]:
    """md5 hex digest per row of a string column. hashlib releases
    the GIL per call and runs at C speed; the per-row loop is the
    digest feed only (no vectorized md5 exists in pyarrow)."""
    data, offsets = flat_utf8(arr)
    mv = memoryview(data)
    return [
        hashlib.md5(mv[offsets[i] : offsets[i + 1]]).hexdigest()
        for i in range(len(offsets) - 1)
    ]


def md5_u64_pair(arr) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 halves of the md5 digest per row of a string
    column — the 128-bit content identity used by the bloom-filter
    prefilter (Kirsch-Mitzenmacher double hashing derives any number
    of bloom positions from the two halves)."""
    data, offsets = flat_utf8(arr)
    mv = memoryview(data)
    n = len(offsets) - 1
    raw = b"".join(
        hashlib.md5(mv[offsets[i] : offsets[i + 1]]).digest() for i in range(n)
    )
    both = np.frombuffer(raw, dtype="<u8").reshape(n, 2) if n else np.empty((0, 2), np.uint64)
    return np.ascontiguousarray(both[:, 0]), np.ascontiguousarray(both[:, 1])


def sha256_hex(arr) -> list[str]:
    """sha256 hex digest per row — used for the byte-identity
    invariant on ``text`` (BASELINE.json input_hint)."""
    data, offsets = flat_utf8(arr)
    mv = memoryview(data)
    return [
        hashlib.sha256(mv[offsets[i] : offsets[i + 1]]).hexdigest()
        for i in range(len(offsets) - 1)
    ]


def _perm_seeds(num_perm: int) -> np.ndarray:
    return splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))


def minhash_signatures(arr, num_perm: int = 64, k: int = 3) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signature matrix over word
    k-shingles. Rows with no shingle get all-max sentinel signatures
    (never collide). Permutations are XOR-rotations of one base hash
    (splitmix-mixed), standard practice for MinHash at scale."""
    n_rows = len(arr)
    sh, rid = shingle_hashes(arr, k=k)
    sig = np.full((n_rows, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    seeds = _perm_seeds(num_perm)
    order = np.argsort(rid, kind="stable")
    sh, rid = sh[order], rid[order]
    # group boundaries per row
    row_start = np.searchsorted(rid, np.arange(n_rows))
    row_end = np.searchsorted(rid, np.arange(n_rows), side="right")
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            ph = splitmix64(sh ^ seeds[p])
            # per-row min via minimum.reduceat on non-empty rows
            ne = row_end > row_start
            if ne.any():
                mins = np.minimum.reduceat(ph, row_start[ne])
                sig[np.flatnonzero(ne), p] = mins
    return sig


def minhash_bands(sig: np.ndarray, num_bands: int = 16) -> np.ndarray:
    """(n_rows, num_bands) uint64 band hashes for LSH bucketing.
    Docs sharing any (band_id, band_hash) are candidate near-dups."""
    n_rows, num_perm = sig.shape
    rows_per_band = num_perm // num_bands
    out = np.empty((n_rows, num_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(num_bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = np.full(n_rows, np.uint64(0xCBF29CE484222325))
            for c in range(rows_per_band):
                h = (h ^ chunk[:, c]) * np.uint64(0x100000001B3)
            out[:, b] = splitmix64(h)
    return out


def minhash_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard similarity between signature rows."""
    return (sig_a == sig_b).mean(axis=-1)


def simhash64(arr, k: int = 2) -> np.ndarray:
    """64-bit SimHash per row over word k-shingles: sign of the
    per-bit sum of ±1 contributions of each shingle hash."""
    n_rows = len(arr)
    sh, rid = shingle_hashes(arr, k=k)
    out = np.zeros(n_rows, dtype=np.uint64)
    if len(sh) == 0:
        return out
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((sh[:, None] >> shifts) & np.uint64(1)).astype(np.int32) * 2 - 1
    acc = np.zeros((n_rows, 64), dtype=np.int64)
    np.add.at(acc, rid, bits)
    pos = acc > 0
    out = (pos.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
    return out


def simhash64_md5(arr, k: int = 2) -> np.ndarray:
    """SQL-reproducible SimHash variant: word k-shingles are joined
    with a single space and hashed with md5 (first 16 hex chars as
    the uint64), so DuckDB can recompute the fingerprint exactly —
    ``md5(tok || ' ' || lead(tok) OVER ...)`` over
    ``regexp_split_to_array(text, '\\s+')``. The md5 feed is a
    per-shingle C call (no vectorized md5 exists); use the default
    polynomial ``simhash64`` on hot paths and this mode where an
    exact SQL oracle is wanted."""
    n_rows = len(arr)
    out = np.zeros(n_rows, dtype=np.uint64)
    grow, digs, G = gram_md5_digests(arr, k)
    if G == 0:
        return out
    # big-endian first 8 digest bytes == int(hexdigest[:16], 16)
    hashes = np.frombuffer(digs, dtype=">u8").reshape(G, 2)[:, 0]
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hashes[:, None] >> shifts) & np.uint64(1)).astype(np.int32) * 2 - 1
    acc = np.zeros((n_rows, 64), dtype=np.int64)
    np.add.at(acc, grow, bits)
    pos = acc > 0
    return (pos.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprints."""
    x = a ^ b
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def fingerprint_min_k(arr, k_shingle: int = 4, k_keep: int = 8) -> np.ndarray:
    """Winnowing-style document fingerprint: the ``k_keep`` smallest
    shingle hashes per row, XOR-folded to one uint64. Stable under
    small edits away from the minimal shingles."""
    n_rows = len(arr)
    sh, rid = shingle_hashes(arr, k=k_shingle)
    out = np.zeros(n_rows, dtype=np.uint64)
    if len(sh) == 0:
        return out
    order = np.lexsort((sh, rid))
    sh, rid = sh[order], rid[order]
    row_start = np.searchsorted(rid, np.arange(n_rows))
    row_end = np.searchsorted(rid, np.arange(n_rows), side="right")
    for r in range(n_rows):  # small loop over rows, vector work done above
        lo, hi = row_start[r], min(row_end[r], row_start[r] + k_keep)
        if hi > lo:
            v = np.uint64(0)
            for h in sh[lo:hi]:
                v ^= splitmix64(np.array([h ^ v], dtype=np.uint64))[0]
            out[r] = v
    return out


def min_shingle_md5(arr, k: int = 3) -> list[str | None]:
    """Winnowing-style fingerprint with a PORTABLE hash family: the
    minimum md5 hex digest over all word k-shingles of the row
    (tokens joined by single spaces), so an external SQL engine with
    md5() reproduces it exactly. Rows with <k tokens → None. Digests
    come from the shared :func:`gram_md5_digests` feed; the per-row
    minimum is a (row, hi, lo) lexsort over the raw 128-bit digests
    (hex order == 128-bit order), hex materialized per row only."""
    n_rows = len(arr)
    out: list[str | None] = [None] * n_rows
    grow, digs, G = gram_md5_digests(arr, k)
    if G == 0:
        return out
    d = np.frombuffer(digs, dtype=">u8").reshape(G, 2)
    order = np.lexsort((d[:, 1], d[:, 0], grow))
    rows_sorted = grow[order]
    uniq, first_idx = np.unique(rows_sorted, return_index=True)
    mv = memoryview(digs)
    for r, fi in zip(uniq.tolist(), first_idx.tolist()):
        gi = int(order[fi])
        out[r] = mv[16 * gi:16 * gi + 16].hex()
    return out


def ngram_jaccard_exact(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word k-gram Jaccard between two strings — the verifier
    applied to LSH candidate pairs (small cardinality, driver/task
    side)."""
    def grams(s: str) -> set[tuple[str, ...]]:
        toks = s.split()
        return {tuple(toks[i : i + k]) for i in range(max(0, len(toks) - k + 1))}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / len(ga | gb)


def gram_md5_digests(arr, k: int = 3):
    """Shared md5 word-k-gram digest feed for the portable-hash
    (SQL-mirrorable) fingerprint family (:func:`winnow_select`,
    :func:`min_shingle_md5`, :func:`simhash64_md5`): every gram is
    hashed as ``' '.join(tokens[i:i+k])`` — reproduced byte-for-byte
    by reading ONE contiguous slice of a canonical single-space-joined
    buffer built with a vectorized gather/scatter copy (the only
    per-gram Python is the C-speed ``md5().digest()`` comp+join).

    Returns ``(grow, digs, G)``: int64 row index per gram (grams in
    row-major document order), the concatenated 16-byte digests, and
    the gram count. ``G == 0`` for inputs with no k-gram."""
    from .text import token_spans

    data, offsets = flat_utf8(arr)
    starts, ends, grow_all = token_spans(data, offsets)
    nt_all = len(starts)
    if nt_all < k or nt_all == 0:
        return np.zeros(0, np.int64), b"", 0
    lens = (ends - starts).astype(np.int64)
    # canonical buffer: every token copied, ONE space slot after each
    # (the slot after a row's last token is unused padding — grams
    # never cross rows, so it is never read)
    seq = lens + 1
    dest_starts = np.zeros(nt_all, np.int64)
    cum = np.cumsum(seq)
    dest_starts[1:] = cum[:-1]
    canon = np.full(int(cum[-1]), 0x20, np.uint8)
    total_bytes = int(lens.sum())
    if total_bytes:
        intra = (np.arange(total_bytes, dtype=np.int64)
                 - np.repeat(np.cumsum(lens) - lens, lens))
        canon[np.repeat(dest_starts, lens) + intra] = \
            data[np.repeat(starts.astype(np.int64), lens) + intra]
    dest_ends = dest_starts + lens
    # gram byte ranges: tokens i..i+k-1 within one row
    same = grow_all[: nt_all - (k - 1)] == grow_all[k - 1:]
    g_s = dest_starts[: nt_all - (k - 1)][same]
    g_e = dest_ends[k - 1:][same]
    grow = grow_all[: nt_all - (k - 1)][same].astype(np.int64)
    G = len(g_s)
    if G == 0:
        return grow, b"", 0
    buf = canon.tobytes()
    _md5 = hashlib.md5
    digs = b"".join(  # C-speed digest feed: comp+join beats indexed writes 2x
        [_md5(buf[a:b]).digest()
         for a, b in zip(g_s.tolist(), g_e.tolist())])
    return grow, digs, G


def winnow_select(arr, k: int = 3, w: int = 4):
    """Robust winnowing fingerprint selection (Schleimer, Wilkerson &
    Aiken, SIGMOD 2003 — the MOSS algorithm): md5 digests of the word
    k-grams slide under a window of ``w`` consecutive grams; each
    window selects its MINIMUM hash, ties broken by the RIGHTMOST
    occurrence, and overlapping windows selecting the same gram
    deduplicate. Documents with fewer than ``w + k - 1`` tokens get
    one clamped window over whatever grams exist (documents with < k
    tokens emit nothing).

    Hash identity is the md5 HEX digest compared lexicographically —
    hex order == 128-bit integer order, so an SQL engine's ``md5()``
    + ``min()`` reproduces every selection exactly (the portable-hash
    convention of :func:`min_shingle_md5`).

    Returns ``(row_id, pos, fp)``: int64 row indices, 1-based gram
    positions, and md5 hex strings — flat arrays sorted by (row,
    pos). Vectorized throughout except the shared C-speed digest feed
    (:func:`gram_md5_digests`); ordering uses the raw 128-bit digests
    as (hi, lo) uint64 pairs (dense rank via lexsort — never a
    32-char string sort), and hex strings are materialized for the
    SELECTED grams only. The window minimum is a w-fold
    ``np.minimum`` over (rank << 32 | ~position) composite keys,
    never a per-window Python loop.
    """
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int64), [])
    grow, digs, G = gram_md5_digests(arr, k)
    if G == 0:
        return empty
    # envelope: rank and local position each pack into 32 bits of the
    # composite window-min key below (bm25-style explicit assert)
    assert G < 2**32, f"winnow block too large: {G} grams >= 2^32"
    d = np.frombuffer(digs, dtype=">u8").reshape(G, 2)
    hi, lo = d[:, 0], d[:, 1]
    # dense rank over the 128-bit digests (== hex lexicographic order)
    order = np.lexsort((lo, hi))
    sh, sl = hi[order], lo[order]
    newv = np.r_[True, (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])]
    rank = np.empty(G, np.int64)
    rank[order] = np.cumsum(newv) - 1
    # per-gram flat row bounds and local positions
    changes = np.flatnonzero(np.r_[True, grow[1:] != grow[:-1]])
    seg_start = np.repeat(changes, np.diff(np.r_[changes, G]))
    local = np.arange(G, dtype=np.int64) - seg_start
    seg_len = np.repeat(np.diff(np.r_[changes, G]), np.diff(np.r_[changes, G]))
    seg_end = seg_start + seg_len
    # composite key: smaller rank wins; equal ranks → larger local
    # position wins (rightmost-tie rule)
    key = (rank.astype(np.uint64) << np.uint64(32)) | (
        np.uint64(0xFFFFFFFF) - local.astype(np.uint64))
    MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
    key_pad = np.concatenate([key, np.full(w, MAX, np.uint64)])
    combined = np.full(G, MAX, np.uint64)
    idx = np.arange(G, dtype=np.int64)
    for j in range(w):
        val = np.where(idx + j < seg_end, key_pad[idx + j], MAX)
        combined = np.minimum(combined, val)
    # valid window starts: local < max(seg_len - (w-1), 1)
    start_mask = local < np.maximum(seg_len - (w - 1), 1)
    comb = combined[start_mask]
    sel_local = (np.uint64(0xFFFFFFFF) - (comb & np.uint64(0xFFFFFFFF))
                 ).astype(np.int64)
    sel_flat = seg_start[start_mask] + sel_local
    sel = np.unique(sel_flat)  # overlapping windows dedupe
    mv16 = memoryview(digs)
    fps = [mv16[16 * s:16 * s + 16].hex() for s in sel.tolist()]
    return grow[sel], (local[sel] + 1).astype(np.int64), fps

"""Arrow-buffer-level vectorized text kernels.

Token counting, shingling, bigram statistics, quality metrics — all
computed from the flat utf-8 data buffer + offsets of an Arrow
string/binary column, zero-copy, with numpy passes only (no per-row
Python in any hot path).

Recasts (clean-room, semantics only):
- token counting / value extraction — AMiner's DelimitedData /
  VariableByteData model elements (reference:
  aminer/parsing/DelimitedDataModelElement.py:20-52) parse runs of
  bytes per record; here a single boundary-transition pass yields
  every token of every row at once.
- char-pair (bigram) frequency table + mean pair probability —
  EntropyDetector (reference:
  aminer/analysis/EntropyDetector.py:128-193) walks value strings
  char by char; here one bincount over the whole batch buffer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.sketches import splitmix64

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
# ASCII whitespace bytes (space \t \n \v \f \r)
_WS_BYTES = np.array([32, 9, 10, 11, 12, 13], dtype=np.uint8)
# polynomial base for rolling token hashes — odd, so invertible mod 2^64
_BASE = np.uint64(0x100000001B3)


def flat_utf8(arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data_bytes, offsets) view of a string/binary column.

    ``data`` is the whole utf-8 buffer (uint8), ``offsets`` has
    ``len(arr)+1`` absolute int64 indices into ``data``; row i spans
    ``data[offsets[i]:offsets[i+1]]``. Null rows span zero bytes.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        # empty arrays may alias the offsets and data buffers —
        # return canonical empties instead of reinterpreting them
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    t = arr.type
    if t not in (pa.large_binary(), pa.large_string()):
        arr = arr.cast(pa.large_binary())
    off_buf = arr.buffers()[1]
    data_buf = arr.buffers()[2]
    offsets = np.frombuffer(off_buf, dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return data, offsets


def _row_sums(indicator_cumsum: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums from a cumsum array of a per-byte indicator.

    ``indicator_cumsum`` must be the exclusive-prefix-sum (length =
    len(data)+1); robust for empty rows unlike ``np.add.reduceat``.
    """
    return indicator_cumsum[offsets[1:]] - indicator_cumsum[offsets[:-1]]


def _excl_cumsum(a: np.ndarray, dtype=np.int64) -> np.ndarray:
    out = np.zeros(len(a) + 1, dtype=dtype)
    np.cumsum(a, dtype=dtype, out=out[1:])
    return out


def token_spans(data: np.ndarray, offsets: np.ndarray):
    """Whitespace-delimited token spans across the whole batch buffer.

    Returns (starts, ends, row_id): absolute byte ranges of every
    token plus the row each belongs to. One vectorized pass.
    """
    n = len(data)
    lo, hi = int(offsets[0]), int(offsets[-1])
    is_ws = np.isin(data, _WS_BYTES)
    nonws = ~is_ws
    prev_ws = np.empty(n, dtype=bool)
    prev_ws[:1] = True
    prev_ws[1:] = is_ws[:-1]
    # force token break at every row start
    prev_ws[offsets[:-1][offsets[:-1] < n]] = True
    next_ws = np.empty(n, dtype=bool)
    next_ws[-1:] = True
    next_ws[:-1] = is_ws[1:]
    row_ends = offsets[1:] - 1
    next_ws[row_ends[(row_ends >= 0) & (row_ends < n)]] = True

    starts = np.flatnonzero(nonws & prev_ws)
    ends = np.flatnonzero(nonws & next_ws) + 1
    starts = starts[(starts >= lo) & (starts < hi)]
    ends = ends[(ends > lo) & (ends <= hi)]
    row_id = np.searchsorted(offsets, starts, side="right") - 1
    return starts, ends, row_id


def token_counts(arr) -> np.ndarray:
    """Whitespace token count per row (matches splitting on /\\s+/
    of the trimmed string)."""
    data, offsets = flat_utf8(arr)
    n = len(data)
    is_ws = np.isin(data, _WS_BYTES)
    prev_ws = np.empty(n, dtype=bool)
    prev_ws[:1] = True
    prev_ws[1:] = is_ws[:-1]
    prev_ws[offsets[:-1][offsets[:-1] < n]] = True
    starts = (~is_ws) & prev_ws
    cs = _excl_cumsum(starts)
    return _row_sums(cs, offsets)


def token_hashes(data: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """64-bit polynomial hash of each token span, fully vectorized.

    Uses weighted prefix sums: with S[i] = sum_{j<i} data[j]*B^(i-1-j)
    computed incrementally as S[i] = S[i-1]*B + data[i-1] — that
    recurrence is serial, so instead compute W[i] = data[i] * B^(N-1-i)
    (cumulative powers wrap naturally in uint64), prefix-sum W, and
    normalize each span by the inverse power of its end position.
    B is odd hence invertible mod 2^64.
    """
    n = len(data)
    if n == 0 or len(starts) == 0:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # powers[i] = B^i,  inv_powers[i] = B^-i  (mod 2^64)
        binv = _modinv64(_BASE)
        pw = np.empty(n, dtype=np.uint64)
        pw[0] = 1
        ipw = np.empty(n, dtype=np.uint64)
        ipw[0] = 1
        if n > 1:
            pw[1:] = np.multiply.accumulate(np.full(n - 1, _BASE, dtype=np.uint64))
            ipw[1:] = np.multiply.accumulate(np.full(n - 1, binv, dtype=np.uint64))
        # weighted data, weight = B^(position)
        w = (data.astype(np.uint64) + np.uint64(1)) * pw  # +1 so NUL bytes count
        s = np.zeros(n + 1, dtype=np.uint64)
        np.add.accumulate(w, out=s[1:])
        # hash(a..b) = (S[b]-S[a]) * B^-a   → equals sum data[j]*B^(j-a)
        # (empty spans at the buffer end index past ipw — their sum
        # is 0 regardless of the inverse power, so clip the index)
        h = (s[ends] - s[starts]) * ipw[np.minimum(starts, n - 1)]
        # mix in token length to separate e.g. "aa" vs "a"+NUL edge cases
        h ^= (ends - starts).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return splitmix64(h)


def _modinv64(b: np.uint64) -> np.uint64:
    """Inverse of odd b mod 2^64 by Newton iteration."""
    b_ = int(b)
    x = b_  # correct mod 2^3
    for _ in range(5):
        x = (x * (2 - b_ * x)) % (1 << 64)
    return np.uint64(x)


def shingle_hashes(
    arr, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, row_id) of all word k-shingles per row.

    Consecutive-token windows of length k; shingles never cross row
    boundaries. Foundation for MinHash/SimHash dedup and
    winnowing-style fingerprints.
    """
    data, offsets = flat_utf8(arr)
    starts, ends, row_id = token_spans(data, offsets)
    th = token_hashes(data, starts, ends)
    if len(th) < k:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        h = th[: len(th) - k + 1].copy()
        for j in range(1, k):
            h = h * np.uint64(0x100000001B3) + th[j : len(th) - k + 1 + j]
    valid = row_id[: len(th) - k + 1] == row_id[k - 1 :]
    return splitmix64(h[valid]), row_id[: len(th) - k + 1][valid]


def shingle_hashes2(arr, k: int = 3) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h1, h2, row_id) of all word k-shingles per row — TWO
    independent 64-bit hashes per shingle (one tokenization pass).

    The (h1, h2) pair is an effectively collision-free 128-bit gram
    identity (same exactness standard as the md5 content hash in
    exact dedup): stages that count gram membership WITHOUT an exact
    string-verification tail (decontamination, duplicate-span
    coverage) key on the pair so a single-hash collision cannot
    silently alter counts. h1 matches ``shingle_hashes`` exactly.
    """
    data, offsets = flat_utf8(arr)
    starts, ends, row_id = token_spans(data, offsets)
    th = token_hashes(data, starts, ends)
    if len(th) < k:
        z = np.zeros(0, dtype=np.uint64)
        return z, z.copy(), np.zeros(0, dtype=np.int64)
    th2 = splitmix64(th ^ np.uint64(0xA5A5A5A55A5A5A5A))
    with np.errstate(over="ignore"):
        h = th[: len(th) - k + 1].copy()
        g = th2[: len(th2) - k + 1].copy()
        for j in range(1, k):
            h = h * np.uint64(0x100000001B3) + th[j : len(th) - k + 1 + j]
            g = g * np.uint64(0xD6E8FEB86659FD93) + th2[j : len(th2) - k + 1 + j]
    valid = row_id[: len(th) - k + 1] == row_id[k - 1 :]
    return splitmix64(h[valid]), splitmix64(g[valid]), row_id[: len(th) - k + 1][valid]


def window_hashes(
    arr, w: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Hashes of each row's NON-OVERLAPPING w-token windows.

    Windows are the token ranges ``[j*w, min((j+1)*w, n_tokens))`` of
    the row's whitespace tokens — the last window of a row may be
    shorter. Returns ``(h1, h2, wlen, win_ord, row_id)`` with one
    entry per window; ``(h1, h2, wlen)`` is an effectively
    collision-free 128-bit identity of the window's token SEQUENCE
    (two independent random-coefficient linear combinations of
    per-token hashes — order-dependent, same exactness standard as
    ``shingle_hashes2``), and window equality under it matches string
    equality of the tokens joined by single spaces (tokens contain no
    whitespace). ``win_ord`` is the window's ordinal within its row.
    One tokenization pass, no per-row Python."""
    data, offsets = flat_utf8(arr)
    starts, ends, row_id = token_spans(data, offsets)
    n = len(starts)
    if n == 0:
        z = np.zeros(0, dtype=np.uint64)
        zi = np.zeros(0, dtype=np.int64)
        return z, z.copy(), zi, zi.copy(), zi.copy()
    th = token_hashes(data, starts, ends)
    th2 = splitmix64(th ^ np.uint64(0xC3C3C3C35C5C5C5C))
    nrows = len(offsets) - 1
    cnt = np.bincount(row_id, minlength=nrows)
    first = _excl_cumsum(cnt)  # first[r] = index of row r's first token
    j_in_row = np.arange(n, dtype=np.int64) - first[row_id]
    jw = j_in_row % w
    ws_idx = np.flatnonzero(jw == 0)  # window segment starts (rows
    # always start a new window: j_in_row resets to 0 per row)
    with np.errstate(over="ignore"):
        pw1 = np.empty(w, dtype=np.uint64)
        pw1[0] = 1
        pw2 = np.empty(w, dtype=np.uint64)
        pw2[0] = 1
        if w > 1:
            pw1[1:] = np.multiply.accumulate(
                np.full(w - 1, np.uint64(0x100000001B3), dtype=np.uint64))
            pw2[1:] = np.multiply.accumulate(
                np.full(w - 1, np.uint64(0xD6E8FEB86659FD93), dtype=np.uint64))
        h1 = splitmix64(np.add.reduceat(th * pw1[jw], ws_idx))
        h2 = splitmix64(np.add.reduceat(th2 * pw2[jw], ws_idx))
    wlen = np.diff(np.append(ws_idx, n)).astype(np.int64)
    win_ord = (j_in_row[ws_idx] // w).astype(np.int64)
    return h1, h2, wlen, win_ord, row_id[ws_idx].astype(np.int64)


def chunk_rows(
    arr, w: int = 64
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Split every row into consecutive w-token chunks (the last
    chunk of a row may be shorter). Returns ``(chunks, row_id,
    chunk_ord, n_tok)`` — one entry per chunk, ``chunks`` a
    StringArray of the chunk's tokens joined by single spaces
    (whitespace-normalizing), ``chunk_ord`` the chunk's ordinal
    within its row. Rows with zero tokens emit nothing. One
    tokenization pass; chunk text assembled with a single numpy
    gather/scatter over the batch's flat utf-8 buffer — no per-row
    Python."""
    data, offsets = flat_utf8(arr)
    starts, ends, row_id = token_spans(data, offsets)
    n = len(starts)
    if n == 0:
        zi = np.zeros(0, dtype=np.int64)
        return pa.array([], pa.string()), zi, zi.copy(), zi.copy()
    nrows = len(offsets) - 1
    cnt = np.bincount(row_id, minlength=nrows)
    first = _excl_cumsum(cnt)
    j_in_row = np.arange(n, dtype=np.int64) - first[row_id]
    is_cs = (j_in_row % w) == 0  # chunk-start tokens (rows always
    # start a new chunk: j_in_row resets to 0 per row)
    cs_idx = np.flatnonzero(is_cs)
    chunk_of_tok = np.cumsum(is_cs) - 1
    nchunks = len(cs_idx)
    lens = (ends - starts).astype(np.int64)
    wlen = np.diff(np.append(cs_idx, n)).astype(np.int64)
    chunk_bytes = (
        np.bincount(chunk_of_tok, weights=lens, minlength=nchunks).astype(np.int64)
        + wlen - 1
    )
    out_offsets = _excl_cumsum(chunk_bytes)
    out = np.full(int(out_offsets[-1]), 32, np.uint8)  # gaps = separators
    seq = lens + 1
    gex = np.cumsum(seq) - seq  # global exclusive cumsum over tokens
    base_per_chunk = gex[cs_idx]
    dst_start = out_offsets[:-1][chunk_of_tok] + (gex - base_per_chunk[chunk_of_tok])
    total = int(lens.sum())
    if total:
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        out[np.repeat(dst_start, lens) + intra] = data[np.repeat(starts, lens) + intra]
    if int(out_offsets[-1]) >= 2**31:  # utf8 offsets are int32; Ray's
        # 128 MB block cap keeps real blocks far below this
        raise ValueError(
            "chunk_rows: block output exceeds 2 GiB; lower the input "
            "block size (DataContext.target_max_block_size)")
    chunks = pa.Array.from_buffers(
        pa.utf8(), nchunks,
        [None, pa.py_buffer(out_offsets.astype(np.int32).tobytes()),
         pa.py_buffer(out.tobytes())],
    )
    chunk_ord = (j_in_row[cs_idx] // w).astype(np.int64)
    return chunks, row_id[cs_idx].astype(np.int64), chunk_ord, wlen


N_SYM = 257  # 256 byte values + the reference's virtual boundary marker
_BOUND = 256


def _boundary_stream(data: np.ndarray, offsets: np.ndarray):
    """Concatenated symbol stream ``B ⊕ row0 ⊕ B ⊕ row1 ⊕ … ⊕ B``
    (B = boundary marker): its adjacent pairs are EXACTLY the
    reference EntropyDetector's per-value pairs — including the
    virtual before-first and after-last characters, and a (B, B)
    pair for an empty value (EntropyDetector.py:128-193) — with
    nothing crossing rows. Returns (stream, row pair-start offsets):
    row i owns the ``len_i + 1`` pairs starting at pair index
    ``offsets_rel[i] + i``."""
    n_rows = len(offsets) - 1
    lo, hi = int(offsets[0]), int(offsets[-1])
    total = hi - lo
    s = np.full(total + n_rows + 1, _BOUND, dtype=np.int32)
    if total:
        rel = offsets - lo
        # per-row slice assignment: memcpy-bound O(total) — the
        # per-BYTE searchsorted this replaces was the fused pass's
        # hottest kernel (O(total·log n_rows) over ~2 KB/row text)
        for i in range(n_rows):
            a, b = int(offsets[i]), int(offsets[i + 1])
            if b > a:
                dst = int(rel[i]) + i + 1
                s[dst : dst + (b - a)] = data[a:b]
    return s, offsets - lo


def bigram_counts(arr) -> np.ndarray:
    """257×257-bin count table of adjacent symbol pairs across all
    rows, boundary-marker pairs included — bit-for-bit the learned
    frequency table of the reference EntropyDetector (P(second|first)
    with virtual start/end characters). Mergeable by addition."""
    data, offsets = flat_utf8(arr)
    if len(offsets) <= 1:
        return np.zeros(N_SYM * N_SYM, dtype=np.int64)
    s, _ = _boundary_stream(data, offsets)
    idx = s[:-1] * N_SYM + s[1:]
    return np.bincount(idx, minlength=N_SYM * N_SYM).astype(np.int64)


def mean_pair_prob(arr, table: np.ndarray) -> np.ndarray:
    """Per-row mean conditional pair probability P(c2|c1) under a
    learned 257-symbol bigram table — the EntropyDetector anomaly
    score (reference: aminer/analysis/EntropyDetector.py:128-165
    ``critical_val``; below prob_thresh ⇒ anomaly). Every row has
    ≥1 pair (the boundary pair), matching the reference exactly."""
    data, offsets = flat_utf8(arr)
    n_rows = len(offsets) - 1
    if n_rows == 0:
        return np.zeros(0, dtype=np.float64)
    tbl = table.reshape(N_SYM, N_SYM).astype(np.float64)
    row_tot = tbl.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        cond = tbl / row_tot[:, None]
    cond = np.nan_to_num(cond)
    s, rel = _boundary_stream(data, offsets)
    probs = cond[s[:-1], s[1:]]
    cs = _excl_cumsum(probs, dtype=np.float64)
    starts = rel[:-1] + np.arange(n_rows)  # first pair index of each row
    ends = rel[1:] + np.arange(1, n_rows + 1)  # one past last pair
    pcnt = (ends - starts).astype(np.float64)
    return (cs[ends] - cs[starts]) / pcnt


def char_class_fractions(arr) -> dict[str, np.ndarray]:
    """Per-row quality signals from one buffer pass: fractions of
    alpha / digit / punct / whitespace / non-ascii bytes and total
    byte length. Feeds the quality-score stage."""
    data, offsets = flat_utf8(arr)
    length = (offsets[1:] - offsets[:-1]).astype(np.float64)
    classes = {
        "alpha": ((data >= 65) & (data <= 90)) | ((data >= 97) & (data <= 122)),
        "digit": (data >= 48) & (data <= 57),
        "space": np.isin(data, _WS_BYTES),
        "punct": np.isin(
            data,
            np.frombuffer(b"!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~", dtype=np.uint8),
        ),
        "non_ascii": data >= 128,
    }
    out: dict[str, np.ndarray] = {}
    safe_len = np.maximum(length, 1.0)
    for name, ind in classes.items():
        cs = _excl_cumsum(ind)
        out[name + "_frac"] = _row_sums(cs, offsets) / safe_len
    out["n_bytes"] = length.astype(np.int64)
    return out


def char_entropy(arr) -> np.ndarray:
    """Per-row Shannon entropy (base 2) of the row's CHARACTER
    (codepoint) distribution — the per-value entropy signal of the
    EntropyDetector family (reference:
    aminer/analysis/EntropyDetector.py:128-193 scores character
    randomness). One utf-32 decode of the whole buffer + one
    np.unique over (row, codepoint) keys; no per-row Python.
    Empty rows score 0. Matches SQL ``entropy()`` over the
    char-split column exactly (up to float summation noise)."""
    data, offsets = flat_utf8(arr)
    n_rows = len(offsets) - 1
    lo, hi = int(offsets[0]), int(offsets[-1])
    out = np.zeros(n_rows, dtype=np.float64)
    if hi <= lo or n_rows == 0:
        return out
    buf = data[lo:hi]
    s = bytes(buf).decode("utf-8", "replace")
    cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    # chars per row = non-continuation bytes per row
    noncont = (buf & 0xC0) != 0x80
    cs = _excl_cumsum(noncont)
    row_chars = cs[offsets[1:] - lo] - cs[offsets[:-1] - lo]
    row_id = np.repeat(np.arange(n_rows, dtype=np.int64), row_chars)
    key = row_id * np.int64(0x110000) + cps
    uk, cnt = np.unique(key, return_counts=True)
    urow = uk // 0x110000
    clog = cnt * np.log2(cnt)
    sum_clog = np.zeros(n_rows, dtype=np.float64)
    np.add.at(sum_clog, urow, clog)
    n = row_chars.astype(np.float64)
    nz = n > 0
    out[nz] = np.log2(n[nz]) - sum_clog[nz] / n[nz]
    return out


def codepoint_set(arr, max_codepoint: int = 0x10000) -> np.ndarray:
    """Bitmap (bool array) of which codepoints < max_codepoint occur
    anywhere in the column chunk — the CharsetDetector learned state
    (reference: aminer/analysis/CharsetDetector.py:74-140), as a
    mergeable bitmap instead of a Python set. Decodes via numpy
    utf-32 view (one C-level decode per batch)."""
    data, offsets = flat_utf8(arr)
    lo, hi = int(offsets[0]), int(offsets[-1])
    bitmap = np.zeros(max_codepoint, dtype=bool)
    if hi > lo:
        # rows are valid utf-8 and boundaries align with char
        # boundaries, so ONE decode of the whole buffer suffices
        s = bytes(data[lo:hi]).decode("utf-8", "replace")
        cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        cps = cps[cps < max_codepoint]
        bitmap[cps] = True
    return bitmap


def pretoken_counts(arr) -> np.ndarray:
    """BPE-style pretokenizer token count per row: maximal runs of
    letters / digits / other-non-space — the RE2-safe GPT-2-family
    pretokenization ``[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+`` (count
    equals ``len(regexp_extract_all(...))`` in the SQL oracle).
    Byte-level: UTF-8 continuation bytes extend the 'other' class, so
    multi-byte runs count once, exactly like the char-level regex.
    One vectorized class-transition pass, no materialized tokens."""
    data, offsets = flat_utf8(arr)
    n = len(data)
    if n == 0:
        return np.zeros(len(offsets) - 1, dtype=np.int64)
    cls = np.full(n, 3, dtype=np.int8)  # other (incl. non-ASCII)
    cls[np.isin(data, _WS_BYTES)] = 0
    letter = ((data >= 65) & (data <= 90)) | ((data >= 97) & (data <= 122))
    cls[letter] = 1
    cls[(data >= 48) & (data <= 57)] = 2
    prev = np.empty(n, dtype=np.int8)
    prev[:1] = 0
    prev[1:] = cls[:-1]
    prev[offsets[:-1][offsets[:-1] < n]] = 0  # row boundary breaks runs
    starts = (cls != 0) & (cls != prev)
    cs = _excl_cumsum(starts)
    return _row_sums(cs, offsets)


def normalize_nfc_lower(arr) -> pa.Array:
    """Canonical Unicode normalization for corpus text: NFC
    composition followed by Unicode lowercasing — the first cleaning
    step of CCNet-style pipelines, and the transform that makes
    byte-identical text comparisons meaningful across crawls that
    emit decomposed (NFD) sequences.

    ASCII rows are NFC by definition, so the fast path is one
    vectorized ``string_is_ascii`` check + ``utf8_lower``; only a
    block that actually contains non-ASCII rows pays a per-row
    ``unicodedata.normalize`` pass (the same rare-block fallback
    discipline as html.binary_to_utf8). pyarrow's own
    ``utf8_normalize`` is NOT used: in this Arrow build its
    form="NFC"/"NFKC" options actually apply NFD/NFKD (composition
    never runs — verified against unicodedata, which implements the
    official UCD algorithm and agrees with DuckDB's
    ``nfc_normalize``, so the SQL oracle reproduces the output
    bit-exactly)."""
    import unicodedata

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    mask = pc.string_is_ascii(arr).to_numpy(zero_copy_only=False)
    if not mask.all():
        arr = pa.array(
            [v if v is None or ok else unicodedata.normalize("NFC", v)
             for v, ok in zip(arr.to_pylist(), mask)],
            pa.string(),
        )
    out = pc.utf8_lower(arr)
    return out if isinstance(out, pa.Array) else out.combine_chunks()

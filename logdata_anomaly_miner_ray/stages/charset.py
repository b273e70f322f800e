"""Per-group character-set constraints (CharsetDetector recast).

Reference semantics (aminer/analysis/CharsetDetector.py:74-140):
per id-tuple a learned set of bytes; a value containing characters
outside it is an anomaly. Batch recast: fit = per-(block, group)
codepoint bitmaps OR-merged in a tiny reduce (the bitmap is the
mergeable state, 8 KiB per group at 64Ki codepoints); validate =
vectorized membership of each row's codepoints in its group's
bitmap.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.text import flat_utf8
from ..schema import violations_table
from ._taskcache import cached_task_fn

MAX_CP = 0x10000


def _row_codepoints(arr) -> tuple[np.ndarray, np.ndarray]:
    """(codepoints, row_id) for every char of every row — one utf-8
    decode of the whole buffer, then a vectorized row assignment via
    cumulative char counts per row."""
    data, offsets = flat_utf8(arr)
    lo, hi = int(offsets[0]), int(offsets[-1])
    if hi <= lo:
        return np.zeros(0, dtype=np.uint32), np.zeros(0, dtype=np.int64)
    # char count per row = bytes that are NOT utf-8 continuation bytes
    is_start = (data & 0xC0) != 0x80
    cs = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(is_start, out=cs[1:])
    chars_per_row = cs[offsets[1:]] - cs[offsets[:-1]]
    s = bytes(data[lo:hi]).decode("utf-8", "replace")
    cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    row_id = np.repeat(np.arange(len(chars_per_row), dtype=np.int64), chars_per_row)
    return cps, row_id


class CharsetFitPartials:
    """map_batches callable → one (group, bitmap) row per group per
    block; bitmaps are np.packbits-packed bools."""

    def __init__(self, group_col: str, value_col: str):
        self.group_col = group_col
        self.value_col = value_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        groups = pc.cast(batch[self.group_col], pa.string())
        cps, row_id = _row_codepoints(batch[self.value_col])
        gnp = np.asarray(groups.to_numpy(zero_copy_only=False), dtype=object)
        uniq, ginv = np.unique(gnp.astype(str), return_inverse=True)
        out_g, out_b = [], []
        cp_groups = ginv[row_id] if len(row_id) else np.zeros(0, dtype=np.int64)
        cps = np.minimum(cps, MAX_CP - 1)
        for gi, gname in enumerate(uniq):
            bm = np.zeros(MAX_CP, dtype=bool)
            sel = cps[cp_groups == gi]
            bm[sel] = True
            out_g.append(str(gname))
            out_b.append(np.packbits(bm).tobytes())
        return pa.table(
            {"group": pa.array(out_g, pa.string()), "bitmap": pa.array(out_b, pa.binary())}
        )


def fit_charsets(
    ds: "ray.data.Dataset", group_col: str, value_col: str
) -> dict[str, np.ndarray]:
    """Learned {group: codepoint bool bitmap}; reduce is driver-side
    over (#blocks × #groups) small packed bitmaps."""
    partials = ds.map_batches(
        CharsetFitPartials(group_col, value_col),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    out: dict[str, np.ndarray] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for g, blob in zip(b["group"].to_pylist(), b["bitmap"].to_pylist()):
            bm = np.unpackbits(np.frombuffer(blob, dtype=np.uint8)).astype(bool)
            if g in out:
                out[g] |= bm
            else:
                out[g] = bm
    return out


def charset_violations(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    charsets_ref: "ray.ObjectRef",
    key_col: str | None = None,
    check_name: str = "CharsetDetector",
) -> "ray.data.Dataset":
    """Rows containing codepoints outside their group's learned set."""

    class CharsetCheck:
        def __init__(self):
            cs: dict[str, np.ndarray] = ray.get(charsets_ref)
            self.names = np.array(sorted(cs.keys()))
            self.bitmaps = (
                np.stack([cs[n] for n in self.names])
                if len(self.names)
                else np.zeros((0, MAX_CP), dtype=bool)
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            groups = np.asarray(
                pc.cast(batch[group_col], pa.string()).to_numpy(zero_copy_only=False),
                dtype=object,
            ).astype(str)
            pos = np.searchsorted(self.names, groups)
            pos_c = np.clip(pos, 0, max(len(self.names) - 1, 0))
            known = len(self.names) > 0
            cps, row_id = _row_codepoints(batch[value_col])
            if len(cps) == 0 or not known:
                return violations_table(check_name, "", [], [], [], "")
            cps = np.minimum(cps, MAX_CP - 1)
            gidx = pos_c[row_id]
            in_set = self.bitmaps[gidx, cps]
            known_row = self.names[pos_c] == groups
            bad_char = (~in_set) & known_row[row_id]
            if not bad_char.any():
                return violations_table(check_name, "", [], [], [], "")
            bad_rows, first_idx = np.unique(row_id[bad_char], return_index=True)
            bad_cps = cps[bad_char]
            keys = (
                np.asarray(
                    pc.cast(batch[key_col], pa.string()).to_numpy(zero_copy_only=False),
                    dtype=object,
                ).astype(str)
                if key_col
                else groups
            )
            # new chars per offending row
            vals = []
            for r in bad_rows:
                sel = bad_cps[row_id[bad_char] == r]
                vals.append([ "".join(chr(c) for c in np.unique(sel)) ])
            return violations_table(
                check=check_name,
                message="new character(s) outside learned charset",
                keys=keys[bad_rows],
                affected_paths=[group_col, value_col],
                affected_values=vals,
                expected='{"charset": "learned"}',
            )

    return ds.map_batches(
        cached_task_fn(CharsetCheck, cache_on=(charsets_ref, group_col, value_col, key_col, check_name)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )

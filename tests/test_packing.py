"""pack_sequences vs a sequential brute force.

The brute force walks documents in id order accumulating a global
token offset; the engine computes the same offsets via per-block sums
+ a driver exclusive scan over range-sorted narrow rows, so any block
-boundary or base-offset bug shows as offset mismatches. Input block
ORDER must not matter (packing is defined by id order, not arrival
order)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.stages.packing import pack_sequences

_SPLIT = re.compile(r"\s+", re.ASCII)


def _brute(rows, L, sep=1):
    out = {}
    start = 0
    for i, t in sorted(rows):
        n = len([x for x in _SPLIT.split(t.strip()) if x])
        if n == 0:
            continue
        out[i] = (n, start, start // L, (start + n - 1) // L, start % L)
        start += n + sep
    return out


def _run(rows, L, sep=1, nparts=4):
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string())}
        )
    ).repartition(nparts)
    out = pack_sequences(ds, "text", "doc_id", seq_len=L, sep_tokens=sep)
    res = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            res[r["doc_id"]] = (
                r["n_tok"], r["tok_start"], r["seq_first"],
                r["seq_last"], r["off_in_first"],
            )
    return res


def test_pack_matches_brute_force():
    rng = np.random.default_rng(7)
    rows = []
    for i in range(200):
        n = int(rng.integers(0, 40))  # includes zero-token docs
        rows.append((i, " ".join(f"t{j}" for j in range(n))))
    want = _brute(rows, 16)
    assert _run(rows, 16) == want
    # long docs straddle many sequences
    rows2 = [(0, " ".join(["a"] * 100)), (1, "b"), (2, " ".join(["c"] * 50))]
    want2 = _brute(rows2, 8)
    assert want2[0][2] == 0 and want2[0][3] == 12  # 100 tokens over L=8
    assert _run(rows2, 8) == want2


def test_pack_invariant_to_input_order_and_partitioning():
    rng = np.random.default_rng(11)
    rows = [(i, " ".join(f"w{int(x)}" for x in rng.integers(0, 9, size=int(rng.integers(1, 25)))))
            for i in range(150)]
    want = _brute(rows, 32)
    shuffled = list(rows)
    rng.shuffle(shuffled)
    assert _run(shuffled, 32, nparts=1) == want
    assert _run(shuffled, 32, nparts=7) == want


def test_pack_sep_tokens_zero_and_empty_input():
    rows = [(3, "a b c"), (1, "d e"), (2, "")]
    want = _brute(rows, 4, sep=0)
    got = _run(rows, 4, sep=0)
    assert got == want
    assert got[1] == (2, 0, 0, 0, 0)
    assert got[3] == (3, 2, 0, 1, 2)  # packs immediately after doc 1
    assert _run([(0, " "), (1, "")], 4) == {}

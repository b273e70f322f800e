"""chunk_rows / chunk_documents vs a string brute force."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.functions.text import chunk_rows
from logdata_anomaly_miner_ray.stages.text_analysis import chunk_documents

_SPLIT = re.compile(r"\s+", re.ASCII)


def _brute(texts, w):
    out = []
    for i, t in enumerate(texts):
        toks = [x for x in _SPLIT.split(t.strip()) if x]
        for o, p in enumerate(range(0, len(toks), w)):
            seg = toks[p : p + w]
            out.append((i, o, len(seg), " ".join(seg)))
    return out


def test_chunk_rows_matches_brute():
    texts = [
        "a b c d e f g",
        "",
        "  x   y\tz  ",
        "one",
        " ".join(f"t{i}" for i in range(20)),
    ]
    for w in (1, 3, 8, 64):
        chunks, rid, cord, wlen = chunk_rows(pa.array(texts, pa.string()), w)
        got = list(zip(rid.tolist(), cord.tolist(), wlen.tolist(),
                       chunks.to_pylist()))
        assert got == _brute(texts, w), w


def test_chunk_rows_randomized():
    rng = np.random.default_rng(21)
    texts = [" ".join(f"w{int(x)}" for x in
                      rng.integers(0, 50, size=int(rng.integers(0, 40))))
             for _ in range(120)]
    for w in (2, 7, 16):
        chunks, rid, cord, wlen = chunk_rows(pa.array(texts, pa.string()), w)
        got = list(zip(rid.tolist(), cord.tolist(), wlen.tolist(),
                       chunks.to_pylist()))
        assert got == _brute(texts, w), w


def test_chunk_documents_dataset():
    texts = ["a b c d e", "f g", ""]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([10, 20, 30], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(2)
    out = chunk_documents(ds, "text", "doc_id", max_tokens=2)
    rows = sorted(
        (r["doc_id"], r["chunk_ord"], r["n_tok"], r["chunk_text"])
        for b in out.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    assert rows == [
        (10, 0, 2, "a b"), (10, 1, 2, "c d"), (10, 2, 1, "e"),
        (20, 0, 2, "f g"),
    ]

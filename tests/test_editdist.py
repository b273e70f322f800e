"""Edit-distance near-dup pairs (stages/editdist): Myers bit-parallel
Levenshtein vs a DP reference, candidate bucketing, hard cap."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from logdata_anomaly_miner_ray.stages.editdist import (
    editdist_verified_pairs,
    myers_distance,
)


def _dp(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[len(b)]


def test_myers_matches_dp_fuzz():
    rng = random.Random(11)
    for _ in range(300):
        a = bytes(rng.randint(97, 101) for _ in range(rng.randint(0, 50)))
        b = bytes(rng.randint(97, 101) for _ in range(rng.randint(0, 50)))
        assert myers_distance(a, b) == _dp(a, b)


def test_myers_long_pattern_over_64():
    rng = random.Random(5)
    a = bytes(rng.randint(65, 90) for _ in range(200))
    b = bytearray(a)
    del b[17]
    b[100] = (b[100] - 64) % 26 + 65
    b.insert(150, 66)
    assert myers_distance(a, bytes(b)) == _dp(a, bytes(b)) == 3


def _docs(rows, nblocks=3):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(nblocks)


def test_pairs_same_mingram_verified():
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base, "en"),
        (2, base + " iota", "en"),          # near dup, shares min gram
        (3, base, "de"),                    # same text, other lang: no pair
        (4, "totally different words here now", "en"),
        (5, "xy", "en"),                    # < 3 tokens: no fingerprint
    ]
    out = editdist_verified_pairs(_docs(rows), max_dist=10).to_pandas()
    got = set(zip(out["id_a"], out["id_b"], out["dist"]))
    assert (1, 2, 5) in got                 # " iota" = 5 byte edits
    assert all(a != 3 and b != 3 for a, b, _ in got)
    assert all(a != 5 and b != 5 for a, b, _ in got)


def test_threshold_excludes_far_pairs():
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, base, "en"), (2, base + " " + "q" * 40, "en")]
    out = editdist_verified_pairs(_docs(rows), max_dist=10).to_pandas()
    assert out.empty


def test_hard_cap_errors():
    rows = [(i, "same three tokens", "en") for i in range(6)]
    with pytest.raises(Exception, match="hard_cap"):
        editdist_verified_pairs(_docs(rows), hard_cap=5).to_pandas()


def test_null_lang_never_pairs():
    base = "alpha beta gamma delta epsilon zeta"
    rows = [(1, base, None), (2, base, None), (3, base, "en"),
            (4, base, "en")]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(2)
    out = editdist_verified_pairs(ds, max_dist=5).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == {(3, 4)}  # SQL NULL = NULL is NULL: no null-lang pair

"""Bloom-prefiltered incremental dedup vs brute force.

The brute-force oracle compares raw TEXT membership (the engine keys
on 128-bit md5 halves), so a hashing or bitmap bug shows as an
id-set mismatch. Both verification tiers are forced and must agree;
an adversarially tiny bitmap (every probe positive) must still be
exact — the bloom is a prefilter only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from logdata_anomaly_miner_ray.stages.bloom import (
    _pair_member_mask,
    _sorted_pairs,
    bloom_new_ids,
    build_bloom_bitmap,
)


def _mk(rows: list[tuple[int, str]]) -> "rd.Dataset":
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(3)


def _fixture(seed: int = 7, n_snap: int = 120, n_batch: int = 90):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]

    def doc(r):
        return " ".join(rng.choice(vocab, size=r))

    snap = [(i, doc(rng.integers(3, 9))) for i in range(n_snap)]
    batch = []
    for j in range(n_batch):
        if j % 3 == 0:  # exact re-ingest of a snapshot doc
            batch.append((1000 + j, snap[int(rng.integers(0, n_snap))][1]))
        else:
            batch.append((1000 + j, doc(rng.integers(3, 9)) + f" uniq{j}"))
    # within-batch duplicate pair (both new): must BOTH be reported
    batch.append((2000, "only in the new batch"))
    batch.append((2001, "only in the new batch"))
    return snap, batch


def _brute_new(snap, batch) -> set:
    seen = {t for _, t in snap}
    return {i for i, t in batch if t not in seen}


def _run_ids(snap, batch, **kw) -> set:
    out = bloom_new_ids(_mk(batch), _mk(snap), "text", "doc_id", **kw)
    return set(
        int(x)
        for b in out.iter_batches(batch_format="pyarrow")
        for x in b["doc_id"].to_pylist()
    )


def test_bloom_new_ids_matches_brute_force_both_tiers():
    snap, batch = _fixture()
    want = _brute_new(snap, batch)
    assert want  # fixture has new rows
    assert len(want) < len(batch)  # ...and re-ingested rows
    got_broadcast = _run_ids(snap, batch, broadcast_candidate_limit=10**6)
    got_shuffle = _run_ids(snap, batch, broadcast_candidate_limit=0)
    assert got_broadcast == want
    assert got_shuffle == want


def test_bloom_exact_under_saturated_bitmap():
    # 2^6 bits for 120 docs: the bitmap saturates and nearly every row
    # becomes a candidate — the exact verify tier must still be exact
    snap, batch = _fixture(seed=11)
    want = _brute_new(snap, batch)
    assert _run_ids(snap, batch, num_bits=64) == want
    assert _run_ids(snap, batch, num_bits=64, broadcast_candidate_limit=0) == want


def test_bloom_empty_snapshot_all_new():
    _, batch = _fixture(seed=3)
    assert _run_ids([], batch) == {i for i, _ in batch}


def test_bloom_no_false_negatives_prefilter():
    # every snapshot member must test bloom-positive (no false
    # negatives by construction): re-probe the bitmap with the
    # snapshot's own hashes
    from logdata_anomaly_miner_ray.functions.hashing import md5_u64_pair
    from logdata_anomaly_miner_ray.stages.bloom import _bloom_member_mask

    snap, _ = _fixture(seed=5)
    texts = pa.array([t for _, t in snap], pa.string())
    h1, h2 = md5_u64_pair(texts)
    ds = rd.from_arrow(
        pa.table({"h1": pa.array(h1, pa.uint64()), "h2": pa.array(h2, pa.uint64())})
    )
    words = build_bloom_bitmap(ds, 1 << 16)
    assert _bloom_member_mask(words, h1, h2, 1 << 16).all()


def test_pair_member_mask_exact_on_collisions():
    # handcrafted h1 collision: same h1, different h2 — the widened
    # searchsorted window must still distinguish them
    pairs = _sorted_pairs(
        np.array([5, 5, 9], np.uint64), np.array([1, 2, 7], np.uint64)
    )
    h1 = np.array([5, 5, 5, 9, 9, 4], np.uint64)
    h2 = np.array([1, 2, 3, 7, 8, 1], np.uint64)
    assert _pair_member_mask(pairs, h1, h2).tolist() == [
        True, True, False, True, False, False,
    ]

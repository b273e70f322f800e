"""stages/importance (DSIR weights) vs a readable brute force: md5
bucketing, exact-integer ratio scores, float log-LLR, zero-token
docs, block-layout invariance."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.stages.importance import (
    dsir_bucket_scores,
    dsir_weights,
)

B = 64
DOCS = [
    (0, "the quick brown fox", "en"),
    (1, "the the the lazy dog", "en"),
    (2, "le chat le chien", "fr"),
    (3, "", "fr"),                      # zero tokens
    (4, "fox dog chat", "de"),
    (5, "日本語 テスト the", "ja"),       # multibyte tokens hash too
]


def _bk(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % B


def _brute():
    ct = np.zeros(B, dtype=np.int64)
    cr = np.zeros(B, dtype=np.int64)
    for _, text, lang in DOCS:
        for tok in text.split():
            b = _bk(tok)
            cr[b] += 1
            if lang == "en":
                ct[b] += 1
    tt, tr = int(ct.sum()), int(cr.sum())
    s = np.array(
        [((int(c) + 1) * (tr + B) * 10**6) // ((int(r) + 1) * (tt + B))
         for c, r in zip(ct, cr)], dtype=np.int64)
    llr = [math.log((int(c) + 1) / (tt + B)) - math.log(
        (int(r) + 1) / (tr + B)) for c, r in zip(ct, cr)]
    rows = {}
    for d, text, _ in DOCS:
        toks = text.split()
        rows[d] = (len(toks),
                   int(sum(int(s[_bk(t)]) for t in toks)),
                   float(sum(llr[_bk(t)] for t in toks)))
    return s, ct, cr, rows


def _ds(n_blocks: int) -> "rd.Dataset":
    t = pa.table({
        "doc_id": pa.array([d for d, _, _ in DOCS], pa.int64()),
        "text": pa.array([x for _, x, _ in DOCS], pa.string()),
        "lang": pa.array([g for _, _, g in DOCS], pa.string())})
    return rd.from_arrow(t).repartition(n_blocks)


def test_bucket_scores_match_brute_force():
    s, ct, cr = dsir_bucket_scores(_ds(3), n_buckets=B)
    bs, bct, bcr, _ = _brute()
    assert np.array_equal(ct, bct) and np.array_equal(cr, bcr)
    assert np.array_equal(s, bs)


def test_dsir_weights_match_brute_force():
    out = dsir_weights(_ds(3), n_buckets=B).to_pandas()
    _, _, _, rows = _brute()
    got = {int(r.doc_id): (int(r.n_tok), int(r.weight), float(r.w_llr))
           for r in out.itertuples(index=False)}
    assert set(got) == set(rows)
    for d, (n, w, llr) in rows.items():
        gn, gw, gllr = got[d]
        assert (gn, gw) == (n, w)
        assert abs(gllr - llr) < 1e-9
    # zero-token doc emits zeros
    assert got[3] == (0, 0, 0.0)
    # an all-target-vocab doc must outrank a non-target doc per token
    assert got[1][1] / max(1, got[1][0]) > got[2][1] / max(1, got[2][0])


def test_dsir_weights_block_layout_invariance():
    a = dsir_weights(_ds(1), n_buckets=B).to_pandas()
    b = dsir_weights(_ds(6), n_buckets=B).to_pandas()
    cols = ["doc_id", "n_tok", "weight"]
    at = sorted(map(tuple, a[cols].itertuples(index=False)))
    bt = sorted(map(tuple, b[cols].itertuples(index=False)))
    assert at == bt


def test_dsir_fast_hash_tier_plumbing():
    """The vectorized fast-hash tier shares every downstream step:
    same token counts, weights consistent with its own bucket scores,
    layout-invariant."""
    a = dsir_weights(_ds(1), n_buckets=B, hash_mode="fast").to_pandas()
    b = dsir_weights(_ds(6), n_buckets=B, hash_mode="fast").to_pandas()
    cols = ["doc_id", "n_tok", "weight"]
    assert sorted(map(tuple, a[cols].itertuples(index=False))) == \
        sorted(map(tuple, b[cols].itertuples(index=False)))
    md5 = dsir_weights(_ds(3), n_buckets=B).to_pandas()
    assert a.sort_values("doc_id")["n_tok"].tolist() == \
        md5.sort_values("doc_id")["n_tok"].tolist()

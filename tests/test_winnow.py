"""Robust winnowing (functions/hashing.winnow_select) vs a brute
per-window reference: min hash per window, rightmost tie, dedup."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from logdata_anomaly_miner_ray.functions.hashing import winnow_select


def brute(texts, k=3, w=4):
    out = []
    for r, t in enumerate(texts):
        if t is None:
            continue
        toks = t.split()
        if len(toks) < k:
            continue
        H = [hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
             for i in range(len(toks) - k + 1)]
        sel = set()
        for s in range(max(len(H) - w + 1, 1)):
            win = H[s:s + w]
            m = min(win)
            p = max(i for i, h in enumerate(win, start=s) if h == m)
            sel.add((r, p + 1, m))
        out.extend(sorted(sel))
    return out


def got(texts, k=3, w=4):
    rid, pos, fp = winnow_select(pa.array(texts, pa.string()), k=k, w=w)
    return sorted(zip(rid.tolist(), pos.tolist(), fp))


def test_matches_brute_on_random_texts():
    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "dd", "e"]  # tiny vocab → many hash ties
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
        for _ in range(200)
    ]
    texts += [None, "", "one two", "x y z", "  pad  ded   spaces  "]
    assert got(texts) == brute(texts)


def test_short_doc_clamped_window():
    # exactly k tokens → 1 gram → one clamped window selects it
    out = got(["p q r"])
    assert len(out) == 1 and out[0][:2] == (0, 1)


def test_all_identical_grams_rightmost_once_per_window():
    # 'a a a a a a a a' → all gram hashes equal; window at s picks
    # rightmost gram s+w-1 → selections are every gram from pos w on,
    # plus nothing earlier
    toks = 8
    out = got([" ".join(["a"] * toks)])
    ng = toks - 2
    assert [p for _, p, _ in out] == list(range(4, ng + 1))


def test_window_params_respected():
    texts = ["m n o p q r s t u v w x"]
    assert got(texts, k=2, w=3) == brute(texts, k=2, w=3)
    assert got(texts, k=4, w=2) == brute(texts, k=4, w=2)

"""dup_span_rewrite vs a string brute force.

The brute force recomputes the C4-style window dedup on raw token
strings (the engine keys on 128-bit window hashes), so a hash or
byte-assembly bug shows as text/count mismatches. Both tiers are
forced and must agree; within-doc-only repeats must survive;
all-duplicate docs must vanish; whitespace must normalize.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.functions.text import window_hashes
from logdata_anomaly_miner_ray.stages.decontam import dup_span_rewrite

_SPLIT = re.compile(r"\s+", re.ASCII)


def _windows(text: str, w: int) -> list[str]:
    toks = [t for t in _SPLIT.split(text.strip()) if t]
    return [" ".join(toks[i : i + w]) for i in range(0, len(toks), w)]


def _brute(rows: list[tuple[int, str]], w: int) -> dict[int, tuple[str, int, int]]:
    from collections import defaultdict

    docs_of = defaultdict(set)
    for i, t in rows:
        for g in _windows(t, w):
            docs_of[g].add(i)
    out = {}
    for i, t in rows:
        wins = _windows(t, w)
        kept = [g for g in wins if len(docs_of[g]) < 2]
        if kept:
            out[i] = (" ".join(kept), len(wins), len(wins) - len(kept))
    return out


def _run(rows, w, **kw) -> dict[int, tuple[str, int, int]]:
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string())}
        )
    ).repartition(3)
    out = dup_span_rewrite(ds, "text", "doc_id", w=w, **kw)
    res = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for i, t, nw, nd in zip(
            b["doc_id"].to_pylist(), b["clean_text"].to_pylist(),
            b["n_win"].to_pylist(), b["n_dup"].to_pylist(),
        ):
            res[int(i)] = (t, int(nw), int(nd))
    return res


def _fixture(w: int = 3):
    boiler = "cookie notice banner"  # exactly w tokens
    rows = [
        (0, boiler + " alpha beta gamma delta one"),
        (1, boiler + " epsilon zeta eta theta two"),
        (2, "iota kappa lam mu nu xi three"),  # untouched
        (3, boiler),                     # all windows dup -> dropped
        (4, "rep rep rep rep rep rep"),  # within-doc repeat only: kept
        (5, "  spaced   out\ttokens  here  "),  # whitespace normalizes
        (6, ""),                         # zero tokens -> dropped
        (7, "short tail"),               # single partial window
        (8, "short tail"),               # dup partial window pair -> both dropped
    ]
    return rows


def test_rewrite_matches_brute_force_both_tiers():
    rows = _fixture()
    want = _brute(rows, 3)
    assert 3 not in want and 6 not in want and 8 not in want
    assert want[4][2] == 0  # within-doc repeat kept
    got_b = _run(rows, 3, broadcast_dup_limit=10**6)
    got_s = _run(rows, 3, broadcast_dup_limit=0)
    assert got_b == want
    assert got_s == want


def test_rewrite_no_dups_is_whitespace_normalized_identity():
    rows = [(0, "a  b   c d e"), (1, "f g\nh i j")]
    got = _run(rows, 2)
    assert got == _brute(rows, 2)
    assert got[0][0] == "a b c d e"


def test_rewrite_randomized_vs_brute():
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(60):
        toks = list(rng.choice(vocab, size=int(rng.integers(1, 20))))
        rows.append((i, " ".join(toks)))
    for w in (2, 4, 7):
        assert _run(rows, w) == _brute(rows, w), w


def test_window_hashes_identity_matches_strings():
    texts = ["a b c d e", "a b c", "x a b", "a b c d e", ""]
    arr = pa.array(texts, pa.string())
    h1, h2, wl, wo, rid = window_hashes(arr, w=3)
    key_of = {}
    for s, t, L, o, r in zip(h1, h2, wl, wo, rid):
        g = " ".join(texts[r].split()[o * 3 : o * 3 + 3])
        key_of.setdefault((int(s), int(t), int(L)), set()).add(g)
    # equal 128-bit keys <=> equal window strings
    for k, gs in key_of.items():
        assert len(gs) == 1, (k, gs)
    # and distinct strings got distinct keys
    all_strings = [next(iter(v)) for v in key_of.values()]
    assert len(set(all_strings)) == len(key_of)

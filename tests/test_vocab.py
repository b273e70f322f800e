"""stages/vocab.bpe_pair_counts vs a readable Python brute force:
occurrence-weighted adjacent codepoint pairs, multibyte-safe,
block-layout invariant, deterministic (cnt DESC, pair ASC) ties."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.stages.vocab import bpe_pair_counts

DOCS = [
    "low low lower",          # classic BPE example: 'lo'/'ow' weighted
    "日本語 日本 ab",           # multibyte codepoint pairs
    "x  y",                   # empty split pieces must not pair
    "",                       # empty doc
    "aaaa",                   # overlapping pairs: 3x 'aa' in one token
]


def _brute(k: int) -> list[tuple[str, int, int]]:
    c: Counter = Counter()
    for text in DOCS:
        for tok in text.split():
            for i in range(len(tok) - 1):
                c[tok[i : i + 2]] += 1
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(p, n, r) for r, (p, n) in enumerate(ranked, 1)]


def _ds(n_blocks: int) -> "rd.Dataset":
    return rd.from_arrow(
        pa.table({"text": pa.array(DOCS, pa.string())})
    ).repartition(n_blocks)


def test_bpe_pair_counts_matches_brute_force():
    got = bpe_pair_counts(_ds(2), k=8)
    rows = list(zip(got["pair"].to_pylist(), got["cnt"].to_pylist(),
                    got["rnk"].to_pylist()))
    assert rows == _brute(8)
    # overlapping-pair sanity: 'aa' appears 3 times in one token
    assert dict(zip(got["pair"].to_pylist(), got["cnt"].to_pylist()))[
        "aa"] == 3


def test_bpe_pair_counts_block_layout_invariance():
    a = bpe_pair_counts(_ds(1), k=5)
    b = bpe_pair_counts(_ds(5), k=5)
    assert a.equals(b)

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


# ---- pmi_collocations ----


def _pmi_brute(texts: list[str], k: int, min_count: int):
    import re
    from collections import Counter

    ug, bg = Counter(), Counter()
    for t in texts:
        toks = [w for w in re.split(r"\s+", t) if w]
        ug.update(toks)
        bg.update(zip(toks, toks[1:]))
    rows = []
    for (w1, w2), nab in bg.items():
        if nab < min_count:
            continue
        rows.append((w1, w2, nab, ug[w1], ug[w2],
                     (10**12 * nab) // (ug[w1] * ug[w2])))
    rows.sort(key=lambda r: (-r[5], -r[2], r[0], r[1]))
    return [r + (i + 1,) for i, r in enumerate(rows[:k])]


def _pmi_fixture():
    return (
        ["strong coffee please", "strong coffee now", "strong coffee",
         "strong tea", "tea strong coffee strong coffee",
         "a b a b a b a b", "x  y\tx y", ""]
        * 3
    )


def test_pmi_collocations_matches_brute_force():
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.vocab import pmi_collocations

    texts = _pmi_fixture()
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(4)
    got = pmi_collocations(ds, k=10, min_count=3).to_pandas()
    want = _pmi_brute(texts, k=10, min_count=3)
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_pmi_collocations_large_vocab_tier_agrees():
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.vocab import pmi_collocations

    texts = _pmi_fixture()
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(4)
    a = pmi_collocations(ds, k=10, min_count=3).to_pandas()
    b = pmi_collocations(
        ds, k=10, min_count=3, broadcast_vocab_limit=0).to_pandas()
    assert a.equals(b)


def test_pmi_no_cross_document_bigrams():
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.vocab import pmi_collocations

    # 'b a' only ever occurs across row boundaries -> never a bigram
    ds = rd.from_arrow(pa.table({"text": pa.array(["a b"] * 6)}))
    t = pmi_collocations(ds, k=10, min_count=1).to_pandas()
    assert list(zip(t["w1"], t["w2"])) == [("a", "b")]
    assert t["n_ab"].tolist() == [6]


def test_pmi_collocations_empty_result_keeps_schema():
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.vocab import pmi_collocations

    ds = rd.from_arrow(pa.table({"text": pa.array(["a b", "c d", ""])}))
    for lim in (10**6, 0):
        t = pmi_collocations(ds, k=5, min_count=3, broadcast_vocab_limit=lim)
        assert t.num_rows == 0
        assert t.column_names == [
            "w1", "w2", "n_ab", "n_a", "n_b", "assoc_e12", "rnk"]


def test_token_novelty_brute_force_and_partition_invariance():
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.vocab import token_novelty

    docs = [
        "a b c",        # all 3 novel
        "a b d",        # d novel
        "a a a",        # nothing novel, 1 type
        "",             # empty: 0/0 -> 0
        "e e f c",      # e f novel (3 types)
    ]
    ids = np.arange(len(docs), dtype=np.int64)
    exp = {
        0: (3, 3, 1_000_000),
        1: (3, 1, 333_333),
        2: (1, 0, 0),
        3: (0, 0, 0),
        4: (3, 2, 666_666),
    }
    for nb in (1, 4):
        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": ids, "text": docs})).repartition(nb)
        out = (token_novelty(ds).to_pandas()
               .sort_values("doc_id", ignore_index=True))
        got = {int(r.doc_id): (int(r.n_types), int(r.n_novel),
                               int(r.novelty_e6))
               for r in out.itertuples()}
        assert got == exp

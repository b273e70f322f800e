"""BPE merge learning (stages/vocab.bpe_learn): greedy semantics,
tie-breaking, tier parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.stages.vocab import (
    _apply_merges,
    bpe_learn,
)


def _docs(texts, nblocks=2):
    df = pd.DataFrame({"text": texts})
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(nblocks)


def test_greedy_overlap_and_sequence():
    # hand-derived: types aaab×2 ab×1 aa×2 → merges (a,a,6), (a,b,3),
    # (aa,ab,2)  [greedy left-to-right on runs of 'a']
    out = bpe_learn(_docs(["aaab aaab ab", "aa aa"])).to_pandas()
    assert list(zip(out["step"], out["s1"], out["s2"], out["cnt"])) == [
        (1, "a", "a", 6), (2, "a", "b", 3), (3, "aa", "ab", 2)]


def test_tie_breaks_lexicographic():
    # 'ba' and 'ab' once each → pairs (b,a) and (a,b) count 1 each;
    # smallest (s1, s2) wins
    out = bpe_learn(_docs(["ba ab"]), n_merges=1).to_pandas()
    assert (out["s1"][0], out["s2"][0]) == ("a", "b")


def test_apply_merges_left_to_right():
    assert _apply_merges(list("aaaa"), [("a", "a")]) == ["aa", "aa"]
    assert _apply_merges(list("aaaaa"), [("a", "a")]) == ["aa", "aa", "a"]
    assert _apply_merges(list("abab"), [("a", "b"), ("ab", "ab")]) == ["abab"]


def test_stops_when_no_pairs():
    out = bpe_learn(_docs(["a b c", "d e"]), n_merges=5).to_pandas()
    assert out.empty  # all single-char words: no adjacent pairs


def test_tier_parity():
    texts = ["the quick brown fox the the", "quick quick brown",
             "aaab aaab ab", "aa aa"]
    fast = bpe_learn(_docs(texts), n_merges=4).to_pandas()
    scale = bpe_learn(_docs(texts), n_merges=4,
                      driver_type_limit=0).to_pandas()
    pd.testing.assert_frame_equal(fast, scale)


def test_bpe_encode_counts_and_tokens():
    from logdata_anomaly_miner_ray.stages.vocab import bpe_encode

    texts = ["aaab aaab ab", "aa aa", "", "zz"]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": texts})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(2)
    merges = [("a", "a"), ("a", "b"), ("aa", "ab")]
    out = bpe_encode(ds, merges, return_tokens=True).to_pandas() \
        .set_index("doc_id").sort_index()
    # doc0: aaab -> [aa, ab] -> [aaab]; ab -> [ab]
    assert out.loc[0, "n_words"] == 3 and out.loc[0, "n_bpe_tokens"] == 3
    assert list(out.loc[0, "tokens"]) == ["aaab", "aaab", "ab"]
    # doc1: aa -> [aa] twice
    assert out.loc[1, "n_bpe_tokens"] == 2
    assert list(out.loc[1, "tokens"]) == ["aa", "aa"]
    # doc2 (empty) emits nothing; doc3 unmergeable chars stay chars
    assert 2 not in out.index
    assert out.loc[3, "n_bpe_tokens"] == 2
    assert list(out.loc[3, "tokens"]) == ["z", "z"]


def test_bpe_encode_matches_per_word_replay():
    from logdata_anomaly_miner_ray.stages.vocab import bpe_encode, bpe_learn

    texts = ["the cat sat on the mat", "the bat and the cat",
             "banana bandana", "aa aaa aaaa"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(3)
    learned = bpe_learn(ds, n_merges=4).to_pandas()
    merges = list(zip(learned["s1"], learned["s2"]))
    out = bpe_encode(ds, merges).to_pandas().set_index("doc_id").sort_index()
    for i, t in enumerate(texts):
        words = [w for w in t.split() if w]
        exp = sum(len(_apply_merges(list(w), merges)) for w in words)
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "n_bpe_tokens"] == exp

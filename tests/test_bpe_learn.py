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


def test_bpe_encode_carry_cols_and_word_bytes():
    from logdata_anomaly_miner_ray.stages.vocab import bpe_encode

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["ab ab", "", "café x", "zz"],   # doc 1 has no words
        "lang": ["en", "en", "fr", None],
    })
    out = (bpe_encode(rd.from_pandas(df).repartition(2),
                      [("a", "b")], carry_cols=("lang",), word_bytes=True)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert out["doc_id"].tolist() == [0, 2, 3]     # empty doc dropped
    assert out["lang"].tolist() == ["en", "fr", None]
    # 'café' is 5 UTF-8 bytes + 'x' 1; 'ab ab' = 4; 'zz' = 2
    assert out["n_word_bytes"].tolist() == [4, 6, 2]
    # merge (a,b): 'ab' -> 1 token each; 'café'->4, 'x'->1; 'zz'->2
    assert out["n_bpe_tokens"].tolist() == [2, 5, 2]


def test_fertility_stats_matches_brute_force():
    from logdata_anomaly_miner_ray.stages.vocab import fertility_stats

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["ab ab cd", "ab", "café café", "x y z", "", "ab cd"],
        "lang": ["en", "en", "fr", "fr", "fr", None],
    })
    merges = [("a", "b"), ("c", "d")]
    got = fertility_stats(rd.from_pandas(df).repartition(3), merges)
    assert got["lang"].tolist() == ["(null)", "en", "fr"]
    # en: docs 0,1 -> words 4, tokens: ab=1,ab=1,cd=1,ab=1 -> 4, bytes 2+2+2+2=8
    en = got[got["lang"] == "en"].iloc[0]
    assert (en["n_docs"], en["n_words"], en["n_bpe_tokens"],
            en["n_word_bytes"]) == (2, 4, 4, 8)
    assert en["fertility_e6"] == 4 * 10**6 // 4
    # fr: docs 2,3 (doc 4 empty drops) -> words 5; café=4 tokens each
    fr = got[got["lang"] == "fr"].iloc[0]
    assert (fr["n_docs"], fr["n_words"], fr["n_bpe_tokens"],
            fr["n_word_bytes"]) == (2, 5, 11, 13)
    assert fr["bytes_per_token_e6"] == 13 * 10**6 // 11
    # null lang groups under the sentinel
    nl = got[got["lang"] == "(null)"].iloc[0]
    assert (nl["n_docs"], nl["n_words"], nl["n_bpe_tokens"]) == (1, 2, 2)


def test_fertility_stats_empty_corpus_typed():
    from logdata_anomaly_miner_ray.stages.vocab import fertility_stats

    df = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                       "text": pd.Series(dtype=str),
                       "lang": pd.Series(dtype=str)})
    out = fertility_stats(rd.from_pandas(df), [("a", "b")])
    assert len(out) == 0 and "fertility_e6" in out.columns

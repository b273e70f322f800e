import collections
import re

import numpy as np
import pyarrow as pa
import pytest

from logdata_anomaly_miner_ray.functions import hashing as H
from logdata_anomaly_miner_ray.functions import text as T
from logdata_anomaly_miner_ray.functions.windows import modulo_seconds, window_id

ROWS = [
    "hello world  foo",
    "",
    "one",
    "a b c d",
    None,
    "  leading and trailing  ",
    "tab\tsep\nnewline",
    "ümlaut über alles",
]


def test_token_counts_matches_regex_split():
    arr = pa.array(ROWS, pa.string())
    got = T.token_counts(arr).tolist()
    want = [
        len(re.split(r"\s+", r.strip())) if r and r.strip() else 0
        for r in ["" if x is None else x for x in ROWS]
    ]
    assert got == want


def test_token_hashes_consistent():
    arr = pa.array(ROWS, pa.string())
    data, off = T.flat_utf8(arr)
    s, e, rid = T.token_spans(data, off)
    toks = [bytes(data[a:b]).decode() for a, b in zip(s, e)]
    th = T.token_hashes(data, s, e)
    seen: dict[str, int] = {}
    for t, h in zip(toks, th):
        assert seen.setdefault(t, int(h)) == int(h)
    assert len(set(seen.values())) == len(seen)


def test_shingles_per_row_and_equality():
    sh, rid = T.shingle_hashes(pa.array(["a b c d e", "a b c d e", "x y z"]), k=3)
    assert np.bincount(rid).tolist() == [3, 3, 1]
    assert set(sh[rid == 0]) == set(sh[rid == 1])


def _ref_pairs(r: str):
    """Reference EntropyDetector pair enumeration: virtual boundary
    marker (-1 → index 256) before the first and after the last
    character (EntropyDetector.py:128-145)."""
    syms = [256] + [ord(c) for c in r] + [256]
    return list(zip(syms, syms[1:]))


def test_bigram_counts_matches_counter():
    rows = ["abab", "ba", None, "x", "zz"]
    bg = T.bigram_counts(pa.array(rows))
    exp = collections.Counter()
    for r in rows:
        for a, b in _ref_pairs(r or ""):
            exp[(a, b)] += 1
    assert bg.sum() == sum(exp.values())
    for (a, b), c in exp.items():
        assert bg[a * T.N_SYM + b] == c


def test_mean_pair_prob_matches_manual():
    rows = ["abab", "ba", "", "x"]
    arr = pa.array(rows)
    table = T.bigram_counts(arr).astype(np.float64)
    mp = T.mean_pair_prob(arr, table)
    tbl = table.reshape(T.N_SYM, T.N_SYM)
    rt = tbl.sum(1)

    def manual(r):
        ps = [tbl[a, b] / rt[a] if rt[a] > 0 else 0.0 for a, b in _ref_pairs(r)]
        return sum(ps) / len(ps)

    for got, r in zip(mp, rows):
        assert got == pytest.approx(manual(r))


def test_char_class_fractions():
    cf = T.char_class_fractions(pa.array(["ab1 .", "ümlaut"]))
    assert cf["n_bytes"].tolist() == [5, 7]
    assert cf["alpha_frac"][0] == pytest.approx(2 / 5)
    assert cf["digit_frac"][0] == pytest.approx(1 / 5)
    assert cf["punct_frac"][0] == pytest.approx(1 / 5)
    assert cf["non_ascii_frac"][1] == pytest.approx(2 / 7)


def test_codepoint_set():
    bm = T.codepoint_set(pa.array(["abc", "ü#"]))
    assert bm[ord("a")] and bm[ord("ü")] and bm[ord("#")] and not bm[ord("z")]


def test_md5_matches_hashlib():
    import hashlib

    arr = pa.array(["hello", "", "wörld"])
    got = H.md5_hex(arr)
    assert got[0] == hashlib.md5(b"hello").hexdigest()
    assert got[1] == hashlib.md5(b"").hexdigest()
    assert got[2] == hashlib.md5("wörld".encode()).hexdigest()


def test_minhash_similarity_ordering():
    docs = pa.array(
        [
            "the quick brown fox jumps over the lazy dog again and again",
            "the quick brown fox jumps over the lazy dog again and once",
            "completely unrelated text about distributed dataset engines",
        ]
    )
    sig = H.minhash_signatures(docs, num_perm=64, k=3)
    assert H.minhash_jaccard(sig[0], sig[1]) > H.minhash_jaccard(sig[0], sig[2])
    bands = H.minhash_bands(sig, num_bands=16)
    assert (bands[0] == bands[1]).sum() >= 1
    assert (bands[0] == bands[2]).sum() == 0


def test_simhash_hamming_ordering():
    docs = pa.array(
        [
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",
            "one two three four five six seven eight nine",
        ]
    )
    sh = H.simhash64(docs, k=2)
    d_near = H.hamming64(sh[:1], sh[1:2])[0]
    d_far = H.hamming64(sh[:1], sh[2:3])[0]
    assert d_near < d_far


def test_window_id_integer_exact():
    ts = pa.array([0, 599_999_999, 600_000_000, 1_800_000_001], pa.int64()).cast(
        pa.timestamp("us")
    )
    assert window_id(ts).to_pylist() == [0, 0, 1, 3]
    assert modulo_seconds(ts, 600).to_pylist() == [0, 599, 0, 0]


def test_repetition_stats_unit():
    """Hand-built docs: duplicate lines and repeated 2-grams count
    exactly; unicode NBSP is NOT a token separator (ASCII \\s only,
    matching the RE2 oracle)."""
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.text_analysis import repetition_stats

    docs = [
        "a b\na b\nc d",          # 3 lines, 1 dup; grams: (a,b)x2,(b,a),(b,c),(c,d)
        "x y z",              # NBSP binds: tokens ["x\xa0y","z"] → 1 gram
        "",                        # empty
        "one",                     # 1 token → 0 grams, 1 line
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": docs})
    out = repetition_stats(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_lines"] == 3 and out.loc[0, "n_dup_lines"] == 1
    assert out.loc[0, "n_2grams"] == 5 and out.loc[0, "top_2gram_n"] == 2
    assert out.loc[1, "n_2grams"] == 1
    assert out.loc[2].tolist() == [0, 0, 0, 0]
    assert out.loc[3].tolist() == [1, 0, 0, 0]


def test_pretoken_counts_matches_duckdb():
    import duckdb

    from logdata_anomaly_miner_ray.functions.text import pretoken_counts

    texts = ["Hello's  world, 42 cats!", "café—rocks 2x", "", "  \n ",
             "abc123def", "日本語 text", "a", "!!!"]
    tbl = pa.table({"t": pa.array(texts, pa.string())})
    py = pretoken_counts(tbl["t"])
    want = duckdb.sql(
        r"SELECT len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS n FROM tbl"
    ).df()["n"].to_numpy()
    assert (py == want).all()


def test_c4_line_filter_rules_and_rebuild():
    import pandas as pd
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.text_analysis import c4_line_filter

    docs = {
        0: "Good line one here.\nshort.\nThis has javascript inside.\n"
           "Another fine line!\nno terminal punct\nA third keeper?",
        1: "Only one good line.\nbad\nalso bad",          # gated out (<2 kept)
        2: "Alpha beta gamma.\nDelta epsilon zeta!\ncurly { brace here.",
        3: "",                                             # gated out
    }
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())})).repartition(2)
    out = c4_line_filter(ds, min_words=3, min_lines=2).to_pandas()
    out = out.set_index("doc_id")
    assert sorted(out.index) == [0, 2]
    assert out.loc[0, "clean_text"] == (
        "Good line one here.\nAnother fine line!\nA third keeper?")
    assert out.loc[0, "n_lines"] == 6 and out.loc[0, "n_kept"] == 3
    assert out.loc[2, "clean_text"] == "Alpha beta gamma.\nDelta epsilon zeta!"
    assert out.loc[2, "n_kept"] == 2


def test_c4_line_filter_case_insensitive_blocklist_and_quote_terminal():
    import pandas as pd
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.text_analysis import c4_line_filter

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [0],
        "text": 'He said "stop right there."\nEnable JavaScript to view.\n'
                'She replied with a word "ok"',
    }))
    out = c4_line_filter(ds, min_words=3, min_lines=1).to_pandas()
    assert out.loc[0, "clean_text"] == (
        'He said "stop right there."\nShe replied with a word "ok"')


# ---- gopher_rules ----


def test_gopher_rules_each_gate_flips_keep():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.stages.text_analysis import gopher_rules

    good = ("the data and that flow be to of have with " * 6).strip()  # 60 words
    docs = {
        0: good,                                   # passes everything
        1: "the be short",                         # < 50 words
        2: good + " " + "#" * 40,                  # hash ratio (1 big token)
        3: good + " ..." * 10,                     # ellipsis ratio
        4: "\n".join(["- b point"] * 10) + "\n" + good,  # >90%? 10/11 bullets
        5: good.replace("the", "000").replace("and", "111")
             .replace("that", "222").replace("be", "333")
             .replace("to", "444").replace("of", "555")
             .replace("have", "666").replace("with", "777"),  # no stopwords+alpha
        6: ("supercalifragilistic " * 60).strip(),  # mean word len > 10
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
    }))
    out = gopher_rules(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "keep"] == 1
    assert out.loc[1, "keep"] == 0 and out.loc[1, "n_words"] == 3
    assert out.loc[2, "keep"] == 0 and out.loc[2, "n_hash"] == 40
    assert out.loc[3, "keep"] == 0 and out.loc[3, "n_ell"] == 10
    assert out.loc[4, "keep"] == 0 and out.loc[4, "n_bullet"] == 10 \
        and out.loc[4, "n_lines"] == 11
    assert out.loc[5, "keep"] == 0 and out.loc[5, "n_stop"] == 0
    assert out.loc[6, "keep"] == 0 \
        and out.loc[6, "word_chars"] > 10 * out.loc[6, "n_words"]

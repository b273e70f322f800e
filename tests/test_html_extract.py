"""HTML → visible-text extraction (functions/html.py).

Pins the vectorized RE2 chain against handcrafted pages, verifies the
builder/extractor round-trip the oracle query relies on, and proves
the north-star per-row invariant on the pages generator: extracting
the generated ``html`` column reproduces the ``text`` column
byte-identically for every row.
"""

from __future__ import annotations

import pyarrow as pa

from logdata_anomaly_miner_ray.functions.html import (
    binary_to_utf8,
    build_page_html,
    extract_text_array,
)

CASES = [
    # invisible subtrees dropped whole (content never leaks)
    (b"<p>a</p><script>if (x<y) alert('<p>no</p>')</script><p>b</p>", "a b"),
    (b"<style>a > b { color: red }</style>plain", "plain"),
    (b"<head><title>T</title></head><body>x</body>", "x"),
    (b"<noscript><p>off</p></noscript>on", "on"),
    (b"a<!-- hidden & <b>bold</b> -->b", "ab"),
    # block tags break words, inline tags don't
    (b"<div>a</div><div>b</div>", "a b"),
    (b"w<b>x</b>y", "wxy"),
    (b"a<br>b", "a b"),
    (b"<ul><li>one</li><li>two</li></ul>", "one two"),
    # attributes removed with the tag
    (b'<a href="/x?a=1&amp;b=2" class="z">link</a>', "link"),
    # entities: single-pass, &amp; last
    (b"fish &amp; chips", "fish & chips"),
    (b"&lt;tag&gt;", "<tag>"),
    (b"&amp;lt;", "&lt;"),
    (b"a&nbsp;b", "a b"),
    (b"it&#39;s &quot;q&quot; &apos;a&apos;", "it's \"q\" 'a'"),
    # whitespace collapse + trim
    (b"  <p>\n\t a \r\n  b </p>\f", "a b"),
    (b"", ""),
    (b"plain text", "plain text"),
    # uppercase tags
    (b"<P>a</P><SCRIPT>x</SCRIPT>b", "a b"),
    # DOCTYPE / processing-ish tags vanish
    (b"<!DOCTYPE html><html><body>z</body></html>", "z"),
]


def test_handcrafted_cases():
    got = extract_text_array(
        pa.array([c[0] for c in CASES], pa.binary())).to_pylist()
    for (raw, want), out in zip(CASES, got):
        assert out == want, (raw, out, want)


def test_nulls_and_invalid_utf8():
    arr = pa.array([None, b"\xff\xfe<p>ok</p>", b"fine"], pa.binary())
    out = extract_text_array(arr).to_pylist()
    assert out[0] is None
    assert out[1].endswith("ok")  # lossy decode, extraction still runs
    assert out[2] == "fine"
    s = binary_to_utf8(pa.array([b"ab", None], pa.binary()))
    assert s.to_pylist() == ["ab", None]
    # string input passes through binary_to_utf8 untouched
    st = pa.array(["x"], pa.string())
    assert binary_to_utf8(st) is st


def test_builder_round_trip_matches_oracle_expression():
    ids = list(range(0, 40)) + [7 * 13, 10**9 + 7]
    texts = [f"w{i} the and the w{i * 3}" for i in ids]
    html = build_page_html(
        pa.array(ids, pa.int64()), pa.array(texts, pa.string()))
    # serialize to binary like the query does
    out = extract_text_array(html.cast(pa.binary())).to_pylist()
    for i, t, o in zip(ids, texts, out):
        want = f"home Doc {i} {t}" + (" & more" if i % 7 == 0 else "")
        assert o == want, (i, o, want)


def test_builder_handles_chunked_inputs():
    ids = pa.chunked_array([pa.array([1, 2], pa.int64()),
                            pa.array([3], pa.int64())])
    texts = pa.chunked_array([pa.array(["a b", "c"], pa.string()),
                              pa.array(["d the e"], pa.string())])
    html = build_page_html(ids, texts)
    out = extract_text_array(html).to_pylist()
    assert out == ["home Doc 1 a b", "home Doc 2 c", "home Doc 3 d the e"]


def test_pages_generator_extraction_identity():
    """North-star invariant: extracted text == text column, every row
    of the synthetic crawl table (sources/pages.py html wrapper)."""
    from logdata_anomaly_miner_ray.sources.pages import make_pages_block

    t = make_pages_block(0, 2000, seed=42)
    got = extract_text_array(t["html"])
    assert got.to_pylist() == t["text"].to_pylist()


def test_normalize_nfc_lower():
    """NFC must actually COMPOSE (pyarrow's utf8_normalize form='NFC'
    applies NFD in this build — the kernel works around it), ASCII
    rows take the vectorized fast path unchanged, and lowercasing is
    Unicode-aware."""
    import unicodedata

    import pyarrow as pa

    from logdata_anomaly_miner_ray.functions.text import normalize_nfc_lower

    deco = "CafÉ Àx"          # decomposed E-acute, A-grave
    comp = "café àx"            # the composed lowercase target
    out = normalize_nfc_lower(
        pa.array(["Hello WORLD", deco, None, "ÉΣ"])
    ).to_pylist()
    assert out[0] == "hello world"
    assert out[1] == comp
    assert [unicodedata.name(c, "?") for c in out[1]] == [
        unicodedata.name(c, "?") for c in comp]
    assert out[2] is None
    assert out[3] == "éσ"


def test_extract_links_vs_stdlib_htmlparser():
    """Cross-engine check: the RE2 chain's anchor extraction must
    agree with Python's stdlib html.parser on the deterministic link
    pages (a genuinely independent implementation — tokenizer-based,
    entity-decoding, script-aware)."""
    from html.parser import HTMLParser

    import pyarrow as pa

    from logdata_anomaly_miner_ray.functions.html import (
        build_link_page_html,
        extract_links_table,
    )

    class LinkParser(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.links = []
            self._skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style", "noscript", "template", "svg",
                       "head"):
                self._skip += 1
            if tag == "a" and not self._skip:
                for k, v in attrs:
                    if k == "href":
                        self.links.append(v)

        def handle_endtag(self, tag):
            if tag in ("script", "style", "noscript", "template", "svg",
                       "head") and self._skip:
                self._skip -= 1

    n = 53
    ids = pa.array(list(range(n)), pa.int64())
    pages = build_link_page_html(ids, n).to_pylist()
    got = extract_links_table(ids, pages).to_pandas()
    for i in range(n):
        p = LinkParser()
        p.feed(pages[i])
        mine = list(got[got["doc_id"] == i].sort_values("pos")["href"])
        assert mine == p.links, f"doc {i}: {mine} != {p.links}"


def test_extract_text_entity_single_pass():
    """'&amp;lt;' must decode to the literal '&lt;' (single-pass
    rule), and '&amp;' inside attribute-adjacent text decodes once."""
    import pyarrow as pa

    from logdata_anomaly_miner_ray.functions.html import extract_text_array

    out = extract_text_array(pa.array([
        "<p>a &amp;lt; b</p>",
        "<p>x &amp;amp; y</p>",
        "<p>5 &lt; 6 &gt; 4 &quot;q&quot; &#39;s&#39;</p>",
    ])).to_pylist()
    assert out == ["a &lt; b", "x &amp; y", "5 < 6 > 4 \"q\" 's'"]

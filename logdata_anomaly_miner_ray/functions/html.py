"""HTML → visible-text extraction for web-crawl corpora.

The north-star invariant for this engine is *byte-identical extracted
text per url* preserved through every stage (BASELINE.json
``input_hint``): the input table carries both ``html:binary`` and
``text:string``, and the ``text`` column is defined as the visible
text extracted from ``html``. ``extract_text_array`` is that
extraction, recast as a chain of vectorized RE2 kernels over an Arrow
string array (the same transform class WET-file extraction applies to
WARC payloads):

1. drop invisible subtrees whole: ``<script>``, ``<style>``,
   ``<noscript>``, ``<template>``, ``<svg>``, the entire ``<head>``,
   and ``<!-- comments -->``;
2. block-level tags (``p div br li ul ol h1-h6 table tr td th
   blockquote pre hr form section article header footer nav``) →
   ``\n`` (they introduce a line break in rendered text);
3. every remaining tag (inline markup: ``a b i em strong span code
   ...``) → ``''`` (inline tags do not break words);
4. decode the core named character references (``&nbsp; &lt; &gt;
   &quot; &#39; &apos; &amp;`` — ``&amp;`` strictly last, so
   ``&amp;lt;`` decodes to the literal ``&lt;`` per the HTML spec's
   single-pass rule);
5. collapse every ASCII-whitespace run to one space and trim — the
   HTML whitespace-collapsing display rule.

Known regex-extractor limitation (shared with every non-DOM
extractor): a ``>`` inside a quoted attribute value terminates the
tag early. Real-world prevalence is low enough that WET-style
pipelines accept it; the unit tests pin the behavior.

Everything is RE2 via ``pyarrow.compute.replace_substring_regex`` /
plain ``replace_substring`` — no per-row Python on the hot path, so a
DuckDB oracle built from the same ``regexp_replace(..., 'g')`` chain
reproduces the output bit-exactly. ``binary_to_utf8`` is the lossy
decode shim for crawl payloads with invalid UTF-8 (fallback per-row
decode only runs for blocks that fail validation — rare).

Reference anchors (behavioral, not structural): the reference engine
treats each log atom's bytes as the unit whose parsed projection must
be reproduced exactly (aminer/input/ByteStreamLineAtomizer.py,
aminer/parsing/MatchContext.py); here the "atom" is an HTML payload
and the projection is its visible text.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "binary_to_utf8",
    "extract_text_array",
    "build_page_html",
    "build_link_page_html",
    "extract_links_table",
]

# subtrees whose content is never visible text
_DROP_SUBTREES = ("script", "style", "noscript", "template", "svg", "head")

# tags that terminate a text line when rendered
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h[1-6]|table|tr|td|th|blockquote|pre|hr|form"
    "|section|article|header|footer|nav|main|aside|figure|figcaption|dl|dt|dd"
)

# single-pass named/numeric references we decode (order matters:
# &amp; last so "&amp;lt;" → "&lt;" stays literal)
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def binary_to_utf8(arr) -> pa.Array:
    """Binary → string with a lossy fallback for invalid UTF-8.

    The fast path is a zero-copy cast (validates UTF-8); only when a
    block actually contains invalid bytes does the per-row
    ``decode(errors="replace")`` fallback run — on crawl data that is
    a tiny fraction of payloads, so the hot path stays vectorized.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    try:
        return arr.cast(pa.string())
    except pa.ArrowInvalid:
        return pa.array(
            [None if v is None else v.decode("utf-8", errors="replace")
             for v in arr.to_pylist()],
            pa.string(),
        )


def extract_text_array(html) -> pa.Array:
    """Extract visible text from an array of HTML payloads
    (binary or string); see module docstring for the exact chain."""
    if not isinstance(html, (pa.Array, pa.ChunkedArray)):
        html = pa.array(html)
    s = binary_to_utf8(html)
    for tag in _DROP_SUBTREES:
        s = pc.replace_substring_regex(
            s, rf"(?is)<{tag}\b.*?</{tag}\s*>", "")
    s = pc.replace_substring_regex(s, r"(?s)<!--.*?-->", "")
    s = pc.replace_substring_regex(
        s, rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*>", "\n")
    s = pc.replace_substring_regex(s, r"(?s)<[^>]*>", "")
    for ent, ch in _ENTITIES:
        s = pc.replace_substring(s, ent, ch)
    s = pc.replace_substring_regex(s, "[ \t\r\n\f\v]+", " ")
    s = pc.replace_substring_regex(s, "^ | $", "")
    return s if isinstance(s, pa.Array) else s.combine_chunks()


def build_page_html(doc_id, text) -> pa.Array:
    """Deterministic page builder used by the round-trip oracle query:
    wraps each document's text in a realistic HTML page — head with
    title/style/script (entity- and angle-bracket-laden), comments,
    block structure, inline markup injected mid-text, whitespace
    noise, and (for ``doc_id % 7 == 0``) an entity-encoded visible
    suffix. By construction, ``extract_text_array(build_page_html(id,
    text))`` must equal ``'Doc ' || id || ' ' || text`` plus
    ``' & more'`` on the ``% 7`` rows, byte-identically — the same
    expression a SQL oracle states directly over the table.

    Every step is an Arrow kernel (element-wise join + one RE2
    replace), so the builder itself is block-parallel and the
    round-trip query stays a single zero-copy ``map_batches`` pass.
    """
    if not isinstance(doc_id, (pa.Array, pa.ChunkedArray)):
        doc_id = pa.array(doc_id, pa.int64())
    if not isinstance(text, (pa.Array, pa.ChunkedArray)):
        text = pa.array(text, pa.string())
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    ids = pc.cast(doc_id, pa.string())
    # inline markup mid-text: every standalone "the" gets bolded —
    # extraction strips inline tags without inserting whitespace
    body_text = pc.replace_substring_regex(
        text, r" the ", " <b>the</b> ")
    n = len(ids)

    def const(v: str) -> pa.Array:
        return pa.array([v] * n, pa.string())

    id_np = doc_id.to_numpy(zero_copy_only=False)
    suffix = pc.if_else(
        pa.array(id_np % 7 == 0),
        const("\n  <p>&amp; more</p>"),
        const(""),
    )
    html = pc.binary_join_element_wise(
        const("<!DOCTYPE html>\n<html lang=\"en\">\n<head>\n  <title>Doc "),
        ids,
        const(
            "</title>\n  <meta charset=\"utf-8\">\n"
            "  <style>\n    body { color: #333; }\n"
            "    a:hover > span { color: red; }\n  </style>\n"
            "  <script type=\"text/javascript\">\n"
            "    var x = 1 < 2 && \"a&b\";\n"
            "    document.write(\"<p>injected</p>\");\n  </script>\n"
            "</head>\n<body>\n"
            "<!-- build & <b>meta</b> comment -->\n"
            "<nav><a href=\"/?q=1&amp;p=2\">home</a></nav>\n"
            "<div class=\"main\">\n  <h1>Doc "),
        ids,
        const("</h1>\n  <p>\n    "),
        body_text,
        const("\n  </p>"),
        suffix,
        const("\n</div>\n<footer></footer>\n</body>\n</html>\n"),
        "",
    )
    return html if isinstance(html, pa.Array) else html.combine_chunks()


def build_link_page_html(doc_id, n_docs: int) -> pa.Array:
    """Deterministic link-bearing page builder for the link-graph
    round-trip oracle: each page carries

    - a ``<script>`` containing a fake anchor and a comment with an
      href (both must be EXCLUDED by extraction — invisible subtrees);
    - one external anchor ``https://example.com/?id=<id>&amp;ref=nav``
      (the ``&amp;`` exercises entity decoding inside attribute
      values) — extracted position 1;
    - ``k = 1 + id % 4`` internal anchors ``/doc/<t_j>`` with
      ``t_j = (id*31 + 7*j + 1) % n_docs`` for ``j = 0..k-1`` —
      positions 2..k+1. These targets define the synthetic link graph
      the PageRank oracle re-derives arithmetically in SQL.

    Vectorized: the 4 candidate internal anchors are built for every
    row and blanked where ``j >= k`` (if_else), then one element-wise
    join assembles the page — no per-row Python.
    """
    import numpy as np

    if not isinstance(doc_id, (pa.Array, pa.ChunkedArray)):
        doc_id = pa.array(doc_id, pa.int64())
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    ids_np = doc_id.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids_np)
    ids = pc.cast(doc_id, pa.string())

    def const(v: str) -> pa.Array:
        return pa.array([v] * n, pa.string())

    k = 1 + ids_np % 4
    links = []
    for j in range(4):
        t = (ids_np * 31 + 7 * j + 1) % np.int64(n_docs)
        t_s = pc.cast(pa.array(t, pa.int64()), pa.string())
        anchor = pc.binary_join_element_wise(
            const('  <li><a href="/doc/'), t_s, const('">Doc '),
            t_s, const("</a></li>\n"), "")
        links.append(pc.if_else(pa.array(j < k), anchor, const("")))

    html = pc.binary_join_element_wise(
        const(
            "<!DOCTYPE html>\n<html>\n<head>\n"
            "  <script>var a = '<a href=\"/not-a-link\">x</a>';</script>\n"
            "</head>\n<body>\n"
            "<!-- <a href=\"/commented-out\">nope</a> -->\n"
            '<p><a href="https://example.com/?id='),
        ids,
        const('&amp;ref=nav">site</a></p>\n<ul>\n'),
        links[0], links[1], links[2], links[3],
        const("</ul>\n</body>\n</html>\n"),
        "",
    )
    return html if isinstance(html, pa.Array) else html.combine_chunks()


def extract_links_table(doc_id, html, with_text: bool = False) -> pa.Table:
    """All anchor hrefs per document, in document order →
    ``(doc_id, pos, href)`` with ``pos`` 1-based among extracted
    links. Invisible subtrees (``<script>`` etc.) and comments are
    dropped first, so their anchors never surface; entity references
    inside attribute values decode with the same single-pass chain as
    visible text. Vectorized end-to-end: one RE2 split on ``<a\\b``,
    a flat ``extract_regex`` over the fragments, and numpy segment
    arithmetic for positions — no per-row Python.

    ``with_text=True`` adds an ``anchor`` column: the element's inner
    text (up to the matching ``</a>``) with inner tags stripped,
    entities decoded and whitespace collapsed — the anchor-text
    signal web pipelines aggregate per link target. Anchors with no
    close tag in the fragment yield ``''``.
    """
    import numpy as np

    if not isinstance(doc_id, (pa.Array, pa.ChunkedArray)):
        doc_id = pa.array(doc_id, pa.int64())
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    if not isinstance(html, (pa.Array, pa.ChunkedArray)):
        html = pa.array(html)
    s = binary_to_utf8(html)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    for tag in _DROP_SUBTREES:
        s = pc.replace_substring_regex(
            s, rf"(?is)<{tag}\b.*?</{tag}\s*>", "")
    s = pc.replace_substring_regex(s, r"(?s)<!--.*?-->", "")
    frags = pc.split_pattern_regex(s, r"(?i)<a\b")
    if isinstance(frags, pa.ChunkedArray):
        frags = frags.combine_chunks()
    lens = pc.list_value_length(frags).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(frags)
    rep_ids = np.repeat(doc_id.to_numpy(zero_copy_only=False), lens)
    # fragment index within its document; index 0 = text before the
    # first <a>, so only indices >= 1 follow an anchor open tag
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    fidx = np.arange(len(rep_ids), dtype=np.int64) - np.repeat(starts, lens)
    m = pc.extract_regex(flat, r'^(?P<href>[^>]*)')
    head = m.field("href") if len(m) else pa.array([], pa.string())
    h = pc.extract_regex(head, r'href\s*=\s*"(?P<href>[^"]*)"')
    href = h.field("href") if len(h) else pa.array([], pa.string())
    valid = (pc.is_valid(href).to_numpy(zero_copy_only=False)
             & (fidx >= 1))
    ids_v = rep_ids[valid]
    href_v = href.filter(pa.array(valid))
    for ent, ch in _ENTITIES:
        href_v = pc.replace_substring(href_v, ent, ch)
    if with_text:
        tm = pc.extract_regex(flat, r"(?is)^[^>]*>(?P<txt>.*?)</a\s*>")
        txt = tm.field("txt") if len(tm) else pa.array([], pa.string())
        txt = pc.fill_null(txt, "").filter(pa.array(valid))
        txt = pc.replace_substring_regex(txt, r"(?s)<[^>]*>", "")
        for ent, ch in _ENTITIES:
            txt = pc.replace_substring(txt, ent, ch)
        txt = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(txt, r"\s+", " "))
    # 1-based position among the extracted links, per document (the
    # valid rows stay in document order, docs contiguous)
    if len(ids_v):
        seg_start = np.flatnonzero(np.r_[True, ids_v[1:] != ids_v[:-1]])
        seg = np.repeat(seg_start, np.diff(np.r_[seg_start, len(ids_v)]))
        pos = np.arange(len(ids_v), dtype=np.int64) - seg + 1
    else:
        pos = np.array([], dtype=np.int64)
    cols = {
        "doc_id": pa.array(ids_v, pa.int64()),
        "pos": pa.array(pos, pa.int64()),
        "href": href_v if isinstance(href_v, pa.Array)
        else href_v.combine_chunks(),
    }
    if with_text:
        cols["anchor"] = (txt if isinstance(txt, pa.Array)
                          else txt.combine_chunks())
    return pa.table(cols)

"""URL canonicalization for web-corpus dedup keys.

``normalize_url_array`` maps raw URLs to a canonical form so that
exact dedup / uniqueness keys don't split on cosmetic variation —
the standard web-crawl normalization set (cf. RFC 3986 §6 syntax-
based normalization; the same transforms CommonCrawl-derived corpus
pipelines apply before URL dedup):

1. fragment dropped (``#...`` never reaches the server);
2. ``utm_*`` tracking query parameters dropped (and a now-empty
   query's ``?`` with them);
3. scheme and host lowercased (case-insensitive per RFC 3986);
4. leading ``www.`` dropped from the host;
5. default port dropped (``:80`` for http, ``:443`` for https);
6. a bare root path ``/`` dropped (``http://x.com/`` ≡ ``http://x.com``).

Everything is either an RE2 ``replace_substring_regex`` or a
lower+rebuild over ``extract_regex`` groups, so a DuckDB oracle using
``regexp_replace(..., 'g')`` + ``lower(regexp_extract(...))`` — also
RE2 — reproduces the output bit-exactly. URLs that don't parse as
``scheme://host...`` pass through steps 1-2 and skip 3-6 unchanged.
Vectorized end-to-end; no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://host split; host = everything before the first /?#
_PARTS = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)(?P<rest>.*)$"


def host_of_array(arr) -> pa.Array:
    """Host key per URL for domain-level curation (the group key of
    per-domain stats / blocklist filtering in web-corpus pipelines,
    cf. RefinedWeb's URL filtering stage): lowercased authority with
    a leading ``www.`` and any ``:port`` suffix stripped. URLs that
    don't parse as ``scheme://host...`` yield null. Vectorized RE2
    end-to-end (extract + lower + replace), so a DuckDB
    ``lower(regexp_extract(...))`` oracle reproduces it bit-exactly.
    """
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr, pa.string())
    parts = pc.extract_regex(pc.cast(arr, pa.string()), _PARTS)
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    host = pc.replace_substring_regex(host, r"^www\.", "")
    host = pc.replace_substring_regex(host, r":[0-9]*$", "")
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    return host


def normalize_url_array(arr) -> pa.Array:
    """Canonicalize a string array of URLs (see module docstring)."""
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr, pa.string())
    u = pc.cast(arr, pa.string())
    # 1. fragment
    u = pc.replace_substring_regex(u, r"#.*$", "")
    # 2. utm_* params: interior (utm_...&) then a trailing [?&]utm_...
    u = pc.replace_substring_regex(u, r"utm_[^&#]*&", "")
    u = pc.replace_substring_regex(u, r"[?&]utm_[^&#]*$", "")
    # 3-6 need the parsed parts
    parts = pc.extract_regex(u, _PARTS)
    ok = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    host = pc.replace_substring_regex(host, r"^www\.", "")
    is_http = pc.equal(scheme, "http")
    is_https = pc.equal(scheme, "https")
    host = pc.if_else(
        is_http, pc.replace_substring_regex(host, r":80$", ""), host)
    host = pc.if_else(
        is_https, pc.replace_substring_regex(host, r":443$", ""), host)
    rest = pc.struct_field(parts, "rest")
    rest = pc.replace_substring_regex(rest, r"^/$", "")
    rebuilt = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    out = pc.if_else(ok, rebuilt, u)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def path_of_array(arr) -> pa.Array:
    """Path-and-query per URL for robots-style prefix rules: the
    ``rest`` group of the scheme://host split (everything from the
    first ``/``, ``?`` or ``#`` after the authority), with the empty
    rest canonicalized to ``/`` (robots semantics: an empty path IS
    the root). Unparseable URLs yield null. Same RE2 as
    :func:`host_of_array`, so DuckDB regexp_extract mirrors it."""
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr, pa.string())
    parts = pc.extract_regex(pc.cast(arr, pa.string()), _PARTS)
    rest = pc.struct_field(parts, "rest")
    rest = pc.if_else(pc.equal(rest, ""), "/", rest)
    if isinstance(rest, pa.ChunkedArray):
        rest = rest.combine_chunks()
    return rest


def registrable_domain_of_array(hosts, suffixes) -> pa.Array:
    """eTLD+1 per canonical host: the last THREE labels when the last
    two form a listed public suffix (``co.uk``-style), else the last
    TWO labels, else the host itself (single-label / null). The
    domain-diversity grouping key web-corpus reports use (grouping by
    raw host over-counts subdomain farms). ``suffixes`` is the
    broadcast public-suffix subset (small by definition — the full
    PSL is ~9k rows). Fully vectorized: two RE2 tail extractions +
    one ``is_in`` — DuckDB mirrors with regexp_extract + IN."""
    if not isinstance(hosts, (pa.Array, pa.ChunkedArray)):
        hosts = pa.array(hosts, pa.string())
    h = pc.cast(hosts, pa.string())
    last2 = pc.struct_field(
        pc.extract_regex(h, r"(?P<t>[^.]+\.[^.]+)$"), "t")
    last3 = pc.struct_field(
        pc.extract_regex(h, r"(?P<t>[^.]+\.[^.]+\.[^.]+)$"), "t")
    is_sfx = pc.is_in(last2, value_set=pa.array(sorted(suffixes),
                                                pa.string()))
    out = pc.if_else(
        pc.and_kleene(pc.fill_null(is_sfx, False), pc.is_valid(last3)),
        last3,
        pc.if_else(pc.is_valid(last2), last2, h))
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out

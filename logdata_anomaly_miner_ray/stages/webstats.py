"""Domain-level corpus curation: per-host stats and blocklist filtering.

Web-corpus pipelines curate at the DOMAIN granularity before any
per-document work — per-host document counts / byte totals feed crawl
QA and domain-mix reports, and a host blocklist (adult/spam/SEO-farm
domains, cf. the URL-filtering stage of RefinedWeb (Penedo et al.
2023) and CCNet's domain filters) removes entire sites up front. The
reference engine's analogue is value-cardinality accounting per
parsed path (NewMatchPathValueDetector / ParserCount,
reference analysis/ParserCount.py:23-108) keyed here on the URL host.

Scale shape:

- ``host_stats``: one shuffle-free ``map_batches`` pass folds each
  block to ≤ |distinct hosts in block| narrow partial rows (host,
  n_docs, sums). The merge is two-tier (the standing CLAUDE.md
  pattern): a bounded driver fold below ``driver_fold_limit`` partial
  rows, else ONE dataset groupby over a coarse ``crc32(host) % P``
  key with pandas sub-bucketing inside each group — hosts at 100 TB
  (~10^8) stay far below the narrow-row shuffle's capacity, and raw
  URLs/text never shuffle.

- ``blocklist_filter``: the blocklist is small by definition (a
  curated denylist), so it broadcasts once via ``ray.put`` and the
  corpus streams through one shuffle-free filter pass
  (``pc.is_in`` on the derived host key).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ._taskcache import cached_task_fn

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _host_partial(batch: pa.Table, url_col: str, sum_cols) -> pa.Table:
    from ..functions.url import host_of_array

    host = host_of_array(batch[url_col])
    d = {"host": host.to_pandas()}
    for c in sum_cols:
        d[c] = batch[c].to_pandas()
    df = pd.DataFrame(d)
    agg = {"n_docs": ("host", "size")}
    for c in sum_cols:
        agg[f"sum_{c}"] = (c, "sum")
    g = df.groupby("host", sort=True, dropna=False).agg(**agg).reset_index()
    for c in g.columns[1:]:
        g[c] = g[c].astype(np.int64)
    return pa.Table.from_pandas(g, preserve_index=False)


def host_stats(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    sum_cols: Sequence[str] = ("n_chars",),
    driver_fold_limit: int = 200_000,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Per-host (n_docs, sum_<c>...) over the corpus — see module
    docstring for the two-tier merge. Returns a pandas frame sorted
    by host (unparseable URLs group under host=None)."""
    sum_cols = tuple(sum_cols)

    parts = ds.map_batches(
        cached_task_fn(
            _HostPartial, cache_on=(url_col, sum_cols, "host_stats"),
            url_col=url_col, sum_cols=sum_cols,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).materialize()  # narrow partial rows only; reused by count + merge
    s_cols = ["n_docs"] + [f"sum_{c}" for c in sum_cols]
    if parts.count() <= driver_fold_limit:
        df = parts.to_pandas()
        if df.empty:
            return pd.DataFrame(
                {"host": pd.Series(dtype=object),
                 **{c: pd.Series(dtype=np.int64) for c in s_cols}})
        out = df.groupby("host", sort=True, dropna=False)[s_cols].sum()
        out = out.reset_index()
    else:  # scale tier: coarse-key groupby, sub-bucket inside pandas
        import zlib

        from ._shuffle import shuffle_parallelism

        def key(batch: pa.Table) -> pa.Table:
            hs = batch["host"].to_pandas()
            bk = np.array(
                [zlib.crc32(h.encode()) if isinstance(h, str) else 0
                 for h in hs], dtype=np.int64) % np.int64(n_buckets)
            return batch.append_column("bk", pa.array(bk, pa.int64()))

        def merge(g: pd.DataFrame) -> pa.Table:
            m = g.groupby("host", sort=True, dropna=False)[s_cols].sum()
            return pa.Table.from_pandas(m.reset_index(), preserve_index=False)

        out = (
            parts.map_batches(key, batch_format="pyarrow", batch_size=None)
            .repartition(shuffle_parallelism())
            .groupby("bk")
            .map_groups(merge, batch_format="pandas")
            .to_pandas()  # ≤ |distinct hosts| narrow rows
            .sort_values("host", ignore_index=True)
        )
    for c in s_cols:
        out[c] = out[c].astype(np.int64)
    return out


class _HostPartial:
    def __init__(self, url_col, sum_cols):
        self.url_col, self.sum_cols = url_col, sum_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _host_partial(batch, self.url_col, self.sum_cols)


def blocklist_filter(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    blocked_hosts: Sequence[str] = (),
    host_out_col: str | None = "host",
) -> "ray.data.Dataset":
    """Drop every row whose URL host (lowercased, www./port-stripped)
    is in ``blocked_hosts``; rows whose URL doesn't parse are KEPT
    (null host never matches a blocklist entry — the conservative
    choice: malformed URLs fail later, more specific gates, not the
    domain denylist). Optionally appends the derived host as
    ``host_out_col``. One shuffle-free broadcast-filter pass."""
    blocked_ref = ray.put(pa.array(sorted(set(blocked_hosts)), pa.string()))

    class Filt:
        def __init__(self, blocked_ref, url_col, host_out_col):
            self.blocked = ray.get(blocked_ref)
            self.url_col, self.host_out_col = url_col, host_out_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..functions.url import host_of_array

            host = host_of_array(batch[self.url_col])
            bad = pc.is_in(host, value_set=self.blocked)
            keep = pc.fill_null(pc.invert(bad), True)
            if self.host_out_col:
                batch = batch.append_column(self.host_out_col, host)
            return batch.filter(keep)

    return ds.map_batches(
        cached_task_fn(
            Filt, cache_on=(blocked_ref, url_col, host_out_col),
            blocked_ref=blocked_ref, url_col=url_col,
            host_out_col=host_out_col,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


def robots_filter(
    ds: "ray.data.Dataset",
    url_col: str,
    rules: Sequence[tuple],
) -> "ray.data.Dataset":
    """Robots-exclusion-style URL filtering: drop a row when its URL
    host equals a rule's host AND its path-and-query starts with the
    rule's prefix (the robots.txt ``Disallow`` longest-prefix match,
    applied as any-match — an allowlist layer is a second rule set).
    Curated crawl pipelines apply exactly this before fetch/ingest
    (RFC 9309 path-prefix matching). Unparseable URLs (null host)
    are conservatively KEPT, same as :func:`blocklist_filter`.

    Scale shape: the rule set is small by definition — it broadcasts
    once (ray.put) and the corpus streams through ONE shuffle-free
    vectorized pass (per rule: host equality AND utf8 starts_with,
    OR-folded; rules is a short list, each test is a full-block Arrow
    kernel, never a per-row loop)."""
    rules = [(str(h), str(p)) for h, p in rules]
    rules_ref = ray.put(rules)

    from ._taskcache import cached_task_fn

    class _Keep:
        def __init__(self, rules_ref, url_col):
            self.rules = ray.get(rules_ref)
            self.url_col = url_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from ..functions.url import host_of_array, path_of_array

            host = host_of_array(batch[self.url_col])
            path = path_of_array(batch[self.url_col])
            drop = pa.array(np.zeros(batch.num_rows, dtype=bool))
            for h, p in self.rules:
                m = pc.and_kleene(pc.equal(host, h),
                                  pc.starts_with(path, p))
                drop = pc.or_kleene(drop, m)
            return batch.filter(pc.fill_null(pc.invert(drop), True))

    return ds.map_batches(
        cached_task_fn(_Keep, cache_on=(rules_ref, url_col, "robots"),
                       rules_ref=rules_ref, url_col=url_col),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

def host_cap(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    id_col: str = "doc_id",
    order_col: str = "n_chars",
    k: int = 3,
    ascending: bool = False,
    host_out_col: str = "host_key",
    rank_col: str = "host_rank",
) -> "ray.data.Dataset":
    """Per-domain retention cap: keep at most ``k`` documents per URL
    host, preferring the highest ``order_col`` (ties break on
    ``id_col`` ascending — deterministic and SQL-reproducible as
    ``row_number() OVER (PARTITION BY host ORDER BY order_col DESC,
    id) <= k``). Web-corpus pipelines cap per-domain document counts
    so template-heavy sites can't dominate the training mix (the
    domain-level curation stage of RefinedWeb (Penedo et al. 2023);
    the reference engine's analogue is per-path value-cardinality
    capping in EventTypeDetector's ring buffers,
    reference analysis/EventTypeDetector.py:237-286).

    Scale shape: ONE shuffle-free narrow pass derives (host, id,
    order) rows — raw URLs/text never shuffle — then
    ``stages/_agg.topk_per_group`` folds mergeable per-block local
    top-k partials under a bounded coarse bucket key (output bounded
    by k x |hosts|; no global sort). Unparseable URLs (null host)
    group under the ``'(none)'`` sentinel so they are capped as one
    family rather than silently dropped (pandas groupby would drop
    null keys). Returns the KEEP manifest dataset (host, id, order,
    rank) — at 10^12 rows write it to parquet and apply it with
    ``stages/referential.filter_not_in`` / a semi-join, never a
    driver gather."""
    from ._agg import topk_per_group

    class _Key:
        def __init__(self, url_col, id_col, order_col, host_out_col):
            self.url_col, self.id_col = url_col, id_col
            self.order_col, self.host_out_col = order_col, host_out_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..functions.url import host_of_array

            host = pc.fill_null(host_of_array(batch[self.url_col]), "(none)")
            return pa.table({
                self.host_out_col: host,
                self.id_col: batch[self.id_col],
                self.order_col: batch[self.order_col],
            })

    narrow = ds.map_batches(
        cached_task_fn(
            _Key, cache_on=(url_col, id_col, order_col, host_out_col,
                            "host_cap"),
            url_col=url_col, id_col=id_col, order_col=order_col,
            host_out_col=host_out_col,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    return topk_per_group(
        narrow, [host_out_col], order_col, k,
        tiebreak_cols=(id_col,), ascending=ascending, rank_col=rank_col,
    )


def url_dedup_latest(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    id_col: str = "doc_id",
    ts_col: str = "ts_s",
    url_out_col: str = "url_norm",
    count_col: str = "n_captures",
) -> "ray.data.Dataset":
    """Latest-capture collapse per canonical URL (the CDX-index dedup
    every Common-Crawl-derived corpus applies first): canonicalize
    each URL (RFC 3986 syntax normalization, ``functions/url.
    normalize_url_array``), then keep ONE row per canonical URL — the
    capture with the greatest ``ts_col``, ties broken by ``id_col``
    ascending — and report how many raw captures collapsed into it.
    SQL-reproducible as ``row_number() OVER (PARTITION BY url_norm
    ORDER BY ts DESC, id) = 1`` + ``count(*) OVER (PARTITION BY
    url_norm)``. The reference engine's analogue is
    NewMatchPathValueDetector's first/latest-value bookkeeping per
    learned key (reference analysis/NewMatchPathValueDetector.py:
    20-84) keyed here on the canonical URL.

    Scale shape: ONE shuffle-free narrow pass derives (url_norm, id,
    ts) and folds each block to ≤ |distinct canonical urls in block|
    PARTIAL rows (local winner + local capture count — argmax-by-(ts,
    -id) and count are both mergeable semigroups), so raw URLs/html
    never shuffle and shuffle volume is bounded by distinct-urls, not
    captures. Partials merge under ``coarse_grouped``'s bounded
    bucket key. Unparseable URLs canonicalize to themselves (the raw
    string is its own identity), so they dedup too rather than being
    dropped."""
    from ._agg import coarse_grouped

    class _Partial:
        def __init__(self, url_col, id_col, ts_col, url_out_col, count_col):
            self.url_col, self.id_col, self.ts_col = url_col, id_col, ts_col
            self.url_out_col, self.count_col = url_out_col, count_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..functions.url import normalize_url_array

            df = pd.DataFrame({
                self.url_out_col: np.asarray(
                    normalize_url_array(batch[self.url_col])),
                self.id_col: batch[self.id_col].to_numpy(
                    zero_copy_only=False),
                self.ts_col: batch[self.ts_col].to_numpy(
                    zero_copy_only=False),
            })
            return pa.Table.from_pandas(
                _fold_latest(df, self.url_out_col, self.id_col,
                             self.ts_col, self.count_col),
                preserve_index=False)

    def _fold_latest(df, ukey, idc, tsc, cntc):
        cnt_src = df[cntc] if cntc in df.columns else None
        best = (df.sort_values([tsc, idc], ascending=[False, True],
                               kind="mergesort")
                  .groupby(ukey, sort=True, as_index=False)
                  .first())
        sizes = (df.groupby(ukey, sort=True)[cntc].sum()
                 if cnt_src is not None
                 else df.groupby(ukey, sort=True).size()).to_numpy()
        best = best[[ukey, idc, tsc]].copy()
        best[cntc] = sizes.astype(np.int64)
        return best

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return _fold_latest(df, url_out_col, id_col, ts_col, count_col)

    partials = ds.map_batches(
        cached_task_fn(
            _Partial,
            cache_on=(url_col, id_col, ts_col, url_out_col, count_col,
                      "url_dedup_latest"),
            url_col=url_col, id_col=id_col, ts_col=ts_col,
            url_out_col=url_out_col, count_col=count_col,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    return coarse_grouped(partials, [url_out_col], final)


def robots_parse(
    ds: "ray.data.Dataset",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> "ray.data.Dataset":
    """Parse robots.txt bodies into the ``(host, prefix)`` Disallow
    rule rows :func:`robots_filter` consumes — the missing half of
    the robots chain (fetch → PARSE → filter). RFC 9309 group
    semantics, scoped to the ``*`` product token the way corpus
    crawlers apply it: lines are ``\\n``-split (``\\r`` and ``#``
    comments stripped, fields case-insensitive); consecutive
    ``User-agent`` lines open ONE group; a group's ``Disallow``
    rules apply iff one of its agents is ``*``; empty Disallow
    (allow-all) and ``Allow`` lines emit nothing; rules before any
    group are ignored. Output is distinct (host, prefix).

    Scale shape: ONE shuffle-free vectorized pass — flat line
    explode with parent indices, group ids by masked cumsum (groups
    never span documents; document boundaries reset the
    previous-line test), star-group membership by bincount — then
    one coarse-bucket distinct over the tiny rule rows. No per-row
    Python. SQL-reproducible: the oracle replays the same group
    arithmetic with lag()/windowed sums."""
    from ._agg import coarse_grouped
    from ._taskcache import cached_task_fn

    class _Parse:
        def __init__(self, host_col, body_col):
            self.host_col, self.body_col = host_col, body_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            body = batch[self.body_col]
            if isinstance(body, pa.ChunkedArray):
                body = body.combine_chunks()
            lines = pc.split_pattern(body.cast(pa.string()), "\n")
            parent = pc.list_parent_indices(lines).to_numpy(
                zero_copy_only=False)
            flat = pc.list_flatten(lines)
            # strip comments + surrounding whitespace + \r
            flat = pc.utf8_trim_whitespace(
                pc.replace_substring_regex(flat, r"#.*$", ""))
            low = pc.utf8_lower(flat)
            is_ua = pc.starts_with(low, "user-agent:").to_numpy(
                zero_copy_only=False)
            is_dis = pc.starts_with(low, "disallow:").to_numpy(
                zero_copy_only=False)
            val = np.asarray(
                pc.utf8_trim_whitespace(
                    pc.replace_substring_regex(
                        flat, r"^[A-Za-z\-]+:", "")),
                dtype=object)
            n = len(parent)
            if n == 0:
                return pa.table({"host": pa.array([], pa.string()),
                                 "prefix": pa.array([], pa.string())})
            doc_start = np.concatenate(
                [[True], parent[1:] != parent[:-1]])
            prev_is_ua = np.concatenate([[False], is_ua[:-1]])
            prev_is_ua[doc_start] = False
            grp_start = is_ua & ~prev_is_ua
            gid = np.cumsum(grp_start)  # global group numbering (≥1)
            # per-document baseline: rules are governed only by
            # groups opened WITHIN their document — without this, a
            # pre-group rule in doc N inherits doc N-1's last group
            # (and its star flag) whenever both docs share a block
            base = np.maximum.accumulate(
                np.where(doc_start, gid - grp_start, 0))
            star = np.zeros(int(gid[-1]) + 1, dtype=bool)
            ua_star = is_ua & (val == "*")
            star[gid[ua_star]] = True
            keep = is_dis & (gid > base) & star[gid] & (val != "")
            hosts = np.asarray(
                batch[self.host_col].to_numpy(zero_copy_only=False),
                dtype=object)
            out = pd.DataFrame({
                "host": hosts[parent[keep]],
                "prefix": val[keep],
            }).drop_duplicates()
            return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(
        cached_task_fn(_Parse, cache_on=(host_col, body_col, "robotsp"),
                       host_col=host_col, body_col=body_col),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates().sort_values(
            ["host", "prefix"], kind="mergesort")

    return coarse_grouped(parts, ["host", "prefix"], distinct)


def domain_stats(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    suffixes: Sequence[str] = (),
) -> "pd.DataFrame":
    """Per-REGISTRABLE-domain (eTLD+1) document counts — the domain-
    diversity report grouped the way web-corpus QA actually groups
    (by ``site.co.uk``, not by every subdomain of a farm). Hosts
    derive as in :func:`host_stats`; the eTLD+1 key applies the
    broadcast public-suffix subset (``functions/url.
    registrable_domain_of_array``); null hosts count under
    ``'(none)'``. Returns (domain, n_docs) sorted by domain.

    Scale shape: suffix set broadcasts once via ``ray.put``; ONE
    shuffle-free pass folds each block to ≤ |distinct domains in
    block| Arrow partial rows; one tiny groupby merges (domain
    cardinality ≪ host cardinality ≪ corpus)."""
    from ray.data.aggregate import Sum

    sfx_ref = ray.put(sorted(str(s) for s in suffixes))

    class _Part:
        def __init__(self, sfx_ref, url_col):
            self.sfx = ray.get(sfx_ref)
            self.url_col = url_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..functions.url import (
                host_of_array,
                registrable_domain_of_array,
            )

            host = host_of_array(batch[self.url_col])
            dom = pc.fill_null(
                registrable_domain_of_array(host, self.sfx), "(none)")
            t = pa.table({"domain": dom})
            agg = t.group_by(["domain"]).aggregate([([], "count_all")])
            return agg.rename_columns(["domain", "n_docs"])

    out = (
        ds.map_batches(
            cached_task_fn(_Part, cache_on=(sfx_ref, url_col, "domstats"),
                           sfx_ref=sfx_ref, url_col=url_col),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("domain")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values("domain", kind="mergesort").reset_index(drop=True)

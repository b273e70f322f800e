"""Deterministic synthetic web-pages tables (FIXTURES.md F1/F2).

Generates the BASELINE.json ``input_hint`` shape
``(url, warc_ts, html, text, lang)`` with seeded anomalies:

- Zipf-skewed domains (hot-domain skew for shuffle tests);
- ~0.1% duplicated urls (uniqueness violations);
- 0.1% out-of-order timestamp swaps + 0.05% nulls (ordering checks);
- lang "xx" rows carrying out-of-domain values (domain checks);
- a partner ``ts_index`` table missing a seeded 0.2% of urls and
  carrying 0.1% dangling extras (referential checks).

Generation is itself a Ray Data pipeline (``range`` →
``map_batches``) so large bench fixtures are produced in parallel;
each block derives its rows purely from the row index + seed, so the
table is byte-deterministic at any parallelism.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data as rd

LANGS = np.array(["en", "de", "fr", "es", "zh", "xx"])
LANG_P = np.array([0.70, 0.10, 0.08, 0.06, 0.04, 0.02])
_WORDS = np.array(
    (
        "the of and to in a is that for with data web page site news article "
        "report table index value system model result content time world home "
        "user search link image member service price market science history "
        "group number public company question school health music sport play"
    ).split()
)
BASE_TS_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds
STEP_US = 137_000  # 137 ms


def _domains(n: int = 1000) -> np.ndarray:
    return np.array([f"site{i:04d}.example.org" for i in range(n)])


def _zipf_domain_ids(rng: np.random.Generator, n: int, n_dom: int = 1000) -> np.ndarray:
    ranks = np.arange(1, n_dom + 1, dtype=np.float64)
    p = 1.0 / ranks
    p /= p.sum()
    return rng.choice(n_dom, size=n, p=p)


def make_pages_block(start: int, count: int, seed: int = 42, total_rows: int | None = None) -> pa.Table:
    """Rows [start, start+count) of the deterministic pages table.
    Each row i derives from default_rng(seed*10^9 + i-free block
    hash) — actually from a per-row-index substream so any block
    partitioning yields identical rows."""
    idx = np.arange(start, start + count, dtype=np.int64)
    # one RNG per block is NOT order-stable across partitionings, so
    # derive per-row randomness from counter-based hashing instead
    from ..state.sketches import hash_int64

    def u01(stream: int, base: np.ndarray = idx) -> np.ndarray:
        h = hash_int64(base, seed=seed * 1_000_003 + stream)
        return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    # ~0.1% duplicated urls: those rows reuse the url of row i-1;
    # domain derives from url_idx so duplicates copy it exactly
    dup = u01(2) < 0.001
    url_idx = np.where(dup & (idx > 0), idx - 1, idx)
    dom_ranks = np.arange(1, 1001, dtype=np.float64)
    dom_p = 1.0 / dom_ranks
    dom_cdf = np.cumsum(dom_p / dom_p.sum())
    dom_id = np.searchsorted(dom_cdf, np.clip(u01(1, url_idx), 0, 1 - 1e-12))
    domains = _domains()[dom_id]
    urls = np.array([f"https://{d}/p/{i}" for d, i in zip(domains, url_idx)])

    ts = BASE_TS_US + idx * STEP_US
    # 0.1% out-of-order swaps: subtract a few minutes
    swap = u01(3) < 0.001
    ts = np.where(swap, ts - 300_000_000, ts)
    ts_null = u01(4) < 0.0005

    lang_cdf = np.cumsum(LANG_P)
    lang = LANGS[np.searchsorted(lang_cdf, np.clip(u01(5), 0, lang_cdf[-1] - 1e-12))]

    # seeded word-salad text, 20-120 words — fully vectorized picks:
    # word j of row i hashes (i << 20 | j), then one C-level join/row
    n_words = (20 + (u01(6) * 100)).astype(np.int64)
    tot = int(n_words.sum())
    row_word_start = np.cumsum(n_words) - n_words
    word_j = np.arange(tot, dtype=np.int64) - np.repeat(row_word_start, n_words)
    word_row = np.repeat(idx, n_words)
    wh = hash_int64(word_row * np.int64(1 << 20) + word_j, seed=seed * 31 + 7)
    picks = (wh % np.uint64(len(_WORDS))).astype(np.int64)
    flat_words = _WORDS[picks]
    bounds = np.concatenate([row_word_start, [tot]])
    texts = [
        " ".join(flat_words[bounds[i] : bounds[i + 1]]) for i in range(count)
    ]
    # "xx" rows carry out-of-domain junk (domain-constraint targets)
    xx = lang == "xx"
    for i in np.flatnonzero(xx):
        texts[i] = texts[i] + " zzqxkjv" + str(int(idx[i]))

    htmls = [f"<html><head><title>p{i}</title></head><body><p>{t}</p></body></html>".encode()
             for i, t in zip(idx, texts)]

    ts_arr = pa.Array.from_pandas(
        np.where(ts_null, np.int64(-1), ts), mask=ts_null, type=pa.int64()
    ).cast(pa.timestamp("us"))
    return pa.table(
        {
            "url": pa.array(urls.tolist(), pa.string()),
            "warc_ts": ts_arr,
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang.tolist(), pa.string()),
            "row_idx": pa.array(idx, pa.int64()),
        }
    )


def pages_dataset(n_rows: int, seed: int = 42, block_rows: int = 50_000) -> "rd.Dataset":
    """Parallel deterministic pages Dataset (generation inside Ray
    tasks, one block per ``block_rows`` index range)."""

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return make_pages_block(int(ids[0]), len(ids), seed=seed)

    return rd.range(n_rows, override_num_blocks=max(1, n_rows // block_rows)).map_batches(
        gen, batch_format="pyarrow", batch_size=block_rows, zero_copy_batch=True
    )


def ts_index_block(start: int, count: int, seed: int = 42) -> pa.Table:
    """F2 referential partner: all F1 urls except a seeded 0.2%
    (missing refs) plus 0.1% dangling extras."""
    pages = make_pages_block(start, count, seed=seed)
    from ..state.sketches import hash_int64

    idx = pages["row_idx"].to_numpy()
    h = hash_int64(idx, seed=seed * 7 + 99)
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    keep = u >= 0.002
    t = pages.select(["url", "warc_ts"]).filter(pa.array(keep))
    extra_n = max(1, int(count * 0.001))
    extra_urls = [f"https://ghost.example.org/p/{start + i}" for i in range(extra_n)]
    extra = pa.table(
        {
            "url": pa.array(extra_urls, pa.string()),
            "warc_ts": pa.array([BASE_TS_US] * extra_n, pa.int64()).cast(pa.timestamp("us")),
        }
    )
    return pa.concat_tables([t, extra])


def materialize_pages_parquet(
    n_rows: int, out_dir: str, seed: int = 42, block_rows: int = 50_000
) -> str:
    """Write (and cache) the pages table as partitioned Parquet under
    ``out_dir``; returns the directory. Skips work if already
    present with the right row count marker."""
    marker = os.path.join(out_dir, f".complete-{n_rows}-{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ds = pages_dataset(n_rows, seed=seed, block_rows=block_rows)
    ds.write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir

"""Lexical ranking over the document corpus: term/document frequency,
TF-IDF-ordered top terms per document, and term search.

The inverted-index statistics every retrieval / corpus-analysis
pipeline needs, recast Ray-Data-first:

- ``term_doc_table``: one stateless zero-copy pass → (doc, term, tf).
  Tokenization is RE2 ``\\s+`` (Arrow and DuckDB share RE2, so a SQL
  oracle tokenizes identically); a document's rows are wholly
  contained in its block, so per-doc term counts need NO shuffle.
- ``doc_frequency``: per-block partial term→doc-counts (each doc
  lives in exactly one block, so block partials sum exactly), then
  ONE groupby over narrow (term, count) rows repartitioned to the
  cluster-sized shuffle matrix (stages/_shuffle.py).
- ``tfidf_top_terms``: top-k terms per document ordered by the exact
  integer key (tf DESC, df ASC, term ASC) — the TF-IDF ordering with
  the monotone log removed, so the result is bit-exact and
  SQL-reproducible (no float idf in the oracle-checked output; a
  downstream user derives idf from the emitted df). Two tiers:
  - broadcast (vocab ≤ ``max_broadcast_terms``): the (term, df)
    table ships once via ``ray.put`` and joins per batch with
    Arrow's C++ hash join; doc rows never shuffle — per-block
    head-k IS the global answer because docs are block-local.
  - scale (unbounded vocab): union + ONE coarse-keyed
    (hash(term) mod P) groupby-merge to attach df — NOT
    ``Dataset.join``, which (a) deadlocks when ``num_partitions``
    exceeds cluster CPUs (its aggregator actors all demand a CPU)
    and (b) crashes on the zero-column empty blocks a hash-shuffle
    groupby emits (CLAUDE.md; stages/dedup.py uses the same
    pattern) — then mergeable per-doc top-k partials
    (stages/_agg.topk_per_group), no global sort.
- ``term_search_topk``: given a small broadcast query-term set, the
  top-k documents per term ordered by (tf DESC, doc_len ASC, doc_id)
  — the exact-integer core of a BM25 ranker (BM25's per-term score
  is monotone ↑tf and ↓doc_len for fixed term); float BM25 scores
  stay out of the oracle-checked columns by design.

Reference anchors (behavioral): per-path value-frequency analysis is
the reference's EventFrequencyDetector / ParserCount family
(aminer/analysis/EventFrequencyDetector.py, ParserCount.py); here the
"path" is a corpus term and the count tables are distributed sketches
instead of in-process dicts.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._agg import topk_per_group
from ._shuffle import shuffle_parallelism

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

__all__ = [
    "term_doc_table",
    "doc_frequency",
    "tfidf_top_terms",
    "term_search_topk",
    "corpus_token_stats",
    "bm25_topk",
]

_WS = r"\s+"  # RE2 ASCII class — identical in Arrow and DuckDB


def _tokens_flat(ids: pa.Array, text: pa.Array) -> pa.Table:
    """Flatten (id, text) to one row per token, dropping the empty
    tokens a leading/trailing separator produces (SQL mirrors with
    ``WHERE term <> ''``)."""
    toks = pc.split_pattern_regex(text, _WS)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).fill_null(0).to_numpy(
        zero_copy_only=False)
    flat = pc.list_flatten(toks)
    rep = np.repeat(
        ids.to_numpy(zero_copy_only=False), lens.astype(np.int64))
    t = pa.table({"doc_id": pa.array(rep, pa.int64()), "term": flat})
    return t.filter(pc.not_equal(t["term"], ""))


def term_doc_table(
    ds: "ray.data.Dataset", *, text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(doc_id, term, tf) — per-document term frequencies in one
    stateless pass (docs are block-local; no shuffle)."""

    def tf_block(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = _tokens_flat(ids.cast(pa.int64()), text)
        t = flat.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return t.rename_columns(["doc_id", "term", "tf"])

    return ds.map_batches(
        tf_block, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)


def doc_frequency(td: "ray.data.Dataset") -> "ray.data.Dataset":
    """(term, df) from a term-doc table: per-block partials (docs are
    block-local, so block doc-counts sum exactly) + one narrow
    groupby sized to the cluster's shuffle matrix."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["term"]).group_by(["term"]).aggregate(
            [([], "count_all")])
        return t.rename_columns(["term", "df_part"])

    partials = td.map_batches(
        partial, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    out = partials.repartition(shuffle_parallelism()).groupby(
        "term").aggregate(Sum("df_part", alias_name="df"))
    return out


def _rank_table(t: pa.Table, k: int) -> pa.Table:
    """Per-doc (tf DESC, df ASC, term ASC) head-k + rank column, for
    a table whose docs are complete within it. Vectorized: one
    multi-key sort + run-length segment ranks."""
    if t.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "term": pa.array([], pa.string()),
             "tf": pa.array([], pa.int64()),
             "df": pa.array([], pa.int64()),
             "rnk": pa.array([], pa.int64())})
    idx = pc.sort_indices(
        t, sort_keys=[("doc_id", "ascending"), ("tf", "descending"),
                      ("df", "ascending"), ("term", "ascending")])
    s = t.take(idx)
    d = s["doc_id"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    seg = np.repeat(starts, np.diff(np.r_[starts, len(d)]))
    rnk = np.arange(len(d), dtype=np.int64) - seg + 1
    keep = rnk <= k
    out = s.filter(pa.array(keep)).append_column(
        "rnk", pa.array(rnk[keep], pa.int64()))
    return out.select(["doc_id", "term", "tf", "df", "rnk"])


def tfidf_top_terms(
    ds: "ray.data.Dataset", *, k: int = 5, text_col: str = "text",
    id_col: str = "doc_id", max_broadcast_terms: int = 2_000_000,
) -> "ray.data.Dataset":
    """Top-k terms per document by the exact TF-IDF ordering key
    (tf DESC, df ASC, term ASC) → (doc_id, term, tf, df, rnk).

    The term-doc table is materialized once (narrow ints + terms —
    the text never re-tokenizes for the second consumer; a CLI-scale
    run would ``write_parquet`` it instead, which is also the
    resumable inverted-index artifact). Join tier picked by vocab
    size; see module docstring.
    """
    import ray

    td = term_doc_table(ds, text_col=text_col, id_col=id_col).materialize()
    # materialize: count() + the broadcast gather below would
    # otherwise execute twice, and iter_batches on an unmaterialized
    # pipeline pulls MB-scale outputs at driver pace (CLAUDE.md)
    df = doc_frequency(td).materialize()
    n_terms = df.count()
    if n_terms <= max_broadcast_terms:
        df_tbl = pa.concat_tables(
            [b for b in df.iter_batches(batch_format="pyarrow")]
        ) if n_terms else pa.table(
            {"term": pa.array([], pa.string()),
             "df": pa.array([], pa.int64())})
        ref = ray.put(df_tbl.combine_chunks())

        def attach_rank(batch: pa.Table) -> pa.Table:
            side = ray.get(ref)
            j = batch.join(side, keys=["term"], join_type="inner")
            return _rank_table(j, k)

        return td.map_batches(
            attach_rank, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True)
    # scale tier: attach df via union + coarse-keyed groupby-merge
    # (see module docstring for why Dataset.join is unusable here)
    import pandas as pd

    def _ck(term_col: pa.ChunkedArray | pa.Array) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.Series(term_col.to_pandas()), index=False).to_numpy()
        return pa.array(
            (h % np.uint64(shuffle_parallelism())).astype(np.int64))

    def tag_td(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "ck": _ck(batch["term"]),
            "is_df": pa.array(np.zeros(n, dtype=np.bool_)),
            "doc_id": batch["doc_id"],
            "term": batch["term"],
            "tf": batch["tf"],
            "df": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
        })

    def tag_df(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "ck": _ck(batch["term"]),
            "is_df": pa.array(np.ones(n, dtype=np.bool_)),
            "doc_id": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
            "term": batch["term"],
            "tf": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
            "df": batch["df"].cast(pa.int64()),
        })

    def attach(g: pd.DataFrame) -> pa.Table:
        side = g[g["is_df"]]
        rows = g[~g["is_df"]]
        m = rows[["doc_id", "term", "tf"]].merge(
            side[["term", "df"]], on="term", how="inner")
        return pa.table({
            "doc_id": pa.array(m["doc_id"].to_numpy(np.int64), pa.int64()),
            "term": pa.array(m["term"].tolist(), pa.string()),
            "tf": pa.array(m["tf"].to_numpy(np.int64), pa.int64()),
            "df": pa.array(m["df"].to_numpy(np.int64), pa.int64()),
        })

    a = td.map_batches(tag_td, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
    b = df.map_batches(tag_df, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
    joined = a.union(b).groupby("ck").map_groups(
        attach, batch_format="pandas")
    # the compound TF-IDF ordering key (tf DESC, df ASC, term ASC)
    # maps directly onto order_col + ascending tiebreaks; rnk is
    # appended in the final fold where each doc's rows are complete
    return topk_per_group(
        joined, ["doc_id"], "tf", k, tiebreak_cols=("df", "term"),
        ascending=False, rank_col="rnk")


def corpus_token_stats(
    ds: "ray.data.Dataset", *, text_col: str = "text",
) -> tuple[int, int]:
    """(n_docs, n_tokens) for a text corpus in ONE narrow partial
    pass: each block emits two ints (its row count and its non-empty
    whitespace-token count — the same RE2 ``\\s+`` tokenization as
    the rest of this module, so a DuckDB oracle reproduces the totals
    with ``regexp_split_to_array``); the driver folds the per-block
    pairs (bounded by block count, never by data)."""

    def part(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern_regex(text, _WS)
        flat = pc.list_flatten(toks)
        n_tok = int(pc.sum(
            pc.cast(pc.not_equal(flat, ""), pa.int64())).as_py() or 0)
        return pa.table({
            "nd": pa.array([batch.num_rows], pa.int64()),
            "nt": pa.array([n_tok], pa.int64())})

    parts = ds.map_batches(
        part, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).to_pandas()
    return int(parts["nd"].sum()), int(parts["nt"].sum())


def bm25_topk(
    ds: "ray.data.Dataset", query_terms: list[str], *, k: int = 10,
    scale: int = 10**9, text_col: str = "text", id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Okapi BM25 per-term top-k with NO float in any checked column
    — the tf/doc-length saturation trade-off ``term_search_topk``'s
    lexicographic (tf DESC, dl ASC) order deliberately omits.

    For a fixed term, BM25 (k1=1.2, b=0.75) ranks by
    ``tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl·N/T)`` — idf is constant
    within the term and drops out. Score DESC is EXACTLY integer key
    ASC for ``sat_key = (3·T + 9·N·dl)·scale // tf`` (multiply the
    denominator/tf rational through by 10·T; the constant factor
    cancels). Both this engine and the DuckDB oracle compute the SAME
    floor division on the same integers, so ranks are bit-identical
    by construction; the floored key preserves the TRUE BM25 order
    whenever ``tf_max² ≤ scale`` (distinct rationals n1/t1 ≠ n2/t2
    differ by ≥ 1/(t1·t2)); beyond that, equal keys tie-break
    (doc_id ASC) identically in both engines. ``scale`` is a
    precision dial: the int64 envelope requires
    ``(3·T + 9·N·dl_max)·scale < 2^63`` (asserted per block with a
    clear error) — at 100-TB token counts pass a smaller scale, or
    pre-shard the corpus; the distributed shape (broadcast query set,
    per-block keys, mergeable per-term top-k partials — at most k
    rows per term per block ever shuffle) is scale-ready.

    ONE tokenize pass over the text (not stats-pass + score-pass):
    each block emits its query hits (doc_id, term, tf, doc_len) PLUS
    one sentinel meta row (term = null) carrying the block's
    (n_docs, n_tokens); the narrow result materializes (hits only —
    raw text never moves again), corpus totals fold on the driver
    from the ≤ 1-per-block meta rows, and sat_key is computed on the
    narrow hits before ``topk_per_group``. Returns (term, doc_id,
    tf, doc_len, sat_key, rnk) with rnk 1-based per term.
    """
    qset = pa.array(sorted(set(query_terms)), pa.string())
    lim = (2**63 - 1) // scale

    def hits_block(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.cast(pa.int64())
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # doc lengths by bincount over parent indices and tf grouped
        # over ONLY the query-term hits — no full-block group_by/join
        toks = pc.split_pattern_regex(text, _WS)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        dl_row = np.bincount(
            parent[nonempty], minlength=batch.num_rows).astype(np.int64)
        ishit = pc.is_in(flat, value_set=qset).to_numpy(zero_copy_only=False)
        ishit &= nonempty
        hits = pa.table({
            "r": pa.array(parent[ishit], pa.int64()),
            "term": flat.filter(pa.array(ishit)),
        })
        tf = hits.group_by(["r", "term"]).aggregate([([], "count_all")])
        r = tf["r"].to_numpy(zero_copy_only=False)
        tfv = tf["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        # sentinel meta row: term=null, tf=block n_docs, doc_len=block
        # n_tokens — folded on the driver, filtered out of the hits
        return pa.table({
            "doc_id": pa.array(
                np.concatenate([ids.take(pa.array(r, pa.int64()))
                                .to_numpy(zero_copy_only=False),
                                [-1]]), pa.int64()),
            "term": pa.concat_arrays(
                [tf["term"].combine_chunks()
                 if isinstance(tf["term"], pa.ChunkedArray) else tf["term"],
                 pa.array([None], pa.string())]),
            "tf": pa.array(np.concatenate(
                [tfv, [batch.num_rows]]), pa.int64()),
            "doc_len": pa.array(np.concatenate(
                [dl_row[r], [int(dl_row.sum())]]), pa.int64()),
        })

    narrow = ds.map_batches(
        hits_block, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).materialize()  # hits + 1 meta row per block; text is released

    def meta_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_null(batch["term"]))

    metas = narrow.map_batches(
        meta_only, batch_format="pyarrow", batch_size=None).to_pandas()
    n_docs = int(metas["tf"].sum())
    n_tokens = int(metas["doc_len"].sum())

    def add_key(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["term"]))
        dlv = batch["doc_len"].to_numpy(zero_copy_only=False)
        tfv = batch["tf"].to_numpy(zero_copy_only=False)
        num = 3 * n_tokens + 9 * n_docs * dlv
        if num.size and int(num.max()) > lim:
            raise ValueError(
                "bm25_topk int64 envelope exceeded: "
                f"(3*T + 9*N*dl_max)={int(num.max())} > 2^63/scale={lim}; "
                "pass a smaller `scale` (precision dial) for this corpus")
        key = num * np.int64(scale) // tfv
        return batch.append_column("sat_key", pa.array(key, pa.int64()))

    scored = narrow.map_batches(
        add_key, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    return topk_per_group(
        scored, ["term"], "sat_key", k, tiebreak_cols=("doc_id",),
        ascending=True, rank_col="rnk")


def term_search_topk(
    ds: "ray.data.Dataset", query_terms: list[str], *, k: int = 10,
    text_col: str = "text", id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Exact lexical search: for each query term, the top-k documents
    by (tf DESC, doc_len ASC, doc_id ASC) → (term, doc_id, tf,
    doc_len, rnk). doc_len = token count. The query set broadcasts
    once; per-block local top-k partials merge under a coarse key
    (mergeable semigroup — no global sort), so the shuffle carries at
    most k × |terms| rows per block."""
    qset = pa.array(sorted(set(query_terms)), pa.string())

    def score_block(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = _tokens_flat(ids.cast(pa.int64()), text)
        # doc_len per doc (docs block-local, contiguous in flat order)
        dl = flat.group_by(["doc_id"]).aggregate([([], "count_all")])
        dl = dl.rename_columns(["doc_id", "doc_len"])
        hit = flat.filter(pc.is_in(flat["term"], value_set=qset))
        tf = hit.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        tf = tf.rename_columns(["doc_id", "term", "tf"])
        return tf.join(dl, keys=["doc_id"], join_type="inner")

    scored = ds.map_batches(
        score_block, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    return topk_per_group(
        scored, ["term"], "tf", k, tiebreak_cols=("doc_len", "doc_id"),
        ascending=False, rank_col="rnk")

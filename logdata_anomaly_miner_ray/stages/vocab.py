"""Tokenizer-vocabulary induction statistics: corpus-wide adjacent
codepoint-pair frequencies — the exact counting step a BPE trainer
(Sennrich et al. 2016; GPT-2's byte-level variant) runs to pick its
first merge, recast Ray-Data-first:

- tokens are the corpus's non-empty whitespace pretokens (the same
  RE2 ``\\s+`` split as stages/ranking, so a DuckDB oracle tokenizes
  identically with ``regexp_split_to_array``);
- every token INSTANCE contributes each adjacent codepoint pair once
  per occurrence (occurrence-weighted, exactly how BPE counts —
  duplicate words weigh by frequency automatically because the
  explode is per instance);
- pair extraction is vectorized: one ``utf8_slice_codeunits(i, i+2)``
  per offset ``i`` up to the block's max token length (codepoint
  semantics identical to DuckDB ``substr``), never a per-token Python
  loop;
- counts are per-block partials (pair → count via Arrow group_by)
  merged under ONE narrow groupby sized to the cluster's shuffle
  matrix, then a mergeable local-top-k partial per block + a bounded
  driver fold — no global sort, and no stage ever materializes more
  than (distinct pairs in a block) rows.

At 100 TB the shuffled rows are bounded by distinct pairs per block
(≤ alphabet², independent of corpus size), so the wide step stays
tiny; the scan dominates, as it should.

Reference anchor (behavioral): the reference's per-path value
frequency analysis (aminer/analysis/ParserCount.py,
EventFrequencyDetector.py) is the same partial-count/merge shape over
parsed paths; here the "path" is a codepoint pair.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._shuffle import shuffle_parallelism

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

__all__ = ["bpe_pair_counts"]

_WS = r"\s+"  # RE2 ASCII class — identical in Arrow and DuckDB


def _pair_counts_block(text: pa.Array) -> pa.Table:
    """(pair, cnt) partial for one block's text column: flatten
    pretokens, slice every adjacent codepoint pair offset-vectorized,
    count with Arrow's C++ group_by."""
    toks = pc.split_pattern_regex(text, _WS)
    flat = pc.list_flatten(toks)
    flat = flat.filter(pc.greater_equal(pc.utf8_length(flat), 2))
    if len(flat) == 0:
        return pa.table({"pair": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    lens = pc.utf8_length(flat)
    max_len = int(pc.max(lens).as_py())
    pieces = []
    for i in range(max_len - 1):
        # tokens shorter than i+2 slice to <2 codepoints — drop them
        sl = pc.utf8_slice_codeunits(flat, i, i + 2)
        pieces.append(sl.filter(pc.greater(lens, i + 1)))
    pairs = pa.chunked_array(pieces).combine_chunks()
    t = pa.table({"pair": pairs}).group_by(["pair"]).aggregate(
        [([], "count_all")])
    return t.rename_columns(["pair", "cnt"])


def bpe_pair_counts(
    ds: "ray.data.Dataset", *, k: int = 20, text_col: str = "text",
) -> "pa.Table":
    """Top-k adjacent codepoint pairs by corpus-wide occurrence count
    → Arrow table (pair, cnt, rnk), ordered (cnt DESC, pair ASC) —
    the first BPE merge candidates. Distributed shape documented in
    the module docstring; the final fold gathers only k rows per
    post-shuffle block."""
    from ray.data.aggregate import Sum

    def part(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return _pair_counts_block(col)

    partials = ds.map_batches(
        part, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    totals = partials.repartition(shuffle_parallelism()).groupby(
        "pair").aggregate(Sum("cnt", alias_name="cnt"))

    def local_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch, sort_keys=[("cnt", "descending"), ("pair", "ascending")])
        return batch.take(idx[:k])

    head = totals.map_batches(
        local_topk, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # bounded: k rows per post-shuffle block
    head = head.sort_values(
        ["cnt", "pair"], ascending=[False, True], kind="mergesort").head(k)
    return pa.table({
        "pair": pa.array(head["pair"].tolist(), pa.string()),
        "cnt": pa.array(head["cnt"].to_numpy(np.int64), pa.int64()),
        "rnk": pa.array(np.arange(1, len(head) + 1, dtype=np.int64)),
    })


def _token_partials_block(text: pa.Array) -> pa.Table:
    """One block's (gram, cnt) partials for BOTH unigrams and
    adjacent word bigrams (bigram gram = 'w1 w2'; tokens cannot
    contain whitespace, so the key spaces never collide and ONE
    groupby merges both kinds — the composite-reduction idiom).
    Adjacency is within a document over the EMPTY-FILTERED token
    sequence (mirrors the SQL row_number recount)."""
    toks = pc.split_pattern_regex(text, _WS)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    nz = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(nz)
    flat = flat.take(pa.array(keep, pa.int64()))
    parent = parent[keep]
    if len(flat) == 0:
        return pa.table({"gram": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    adj = parent[:-1] == parent[1:]
    n = len(flat)
    w1 = flat.slice(0, n - 1).filter(pa.array(adj))
    w2 = flat.slice(1, n - 1).filter(pa.array(adj))
    pairs = pc.binary_join_element_wise(w1, w2, " ")
    grams = pa.chunked_array([flat, pairs]).combine_chunks()
    t = pa.table({"gram": grams}).group_by(["gram"]).aggregate(
        [([], "count_all")])
    return t.rename_columns(["gram", "cnt"])


def pmi_collocations(
    ds: "ray.data.Dataset",
    *,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    broadcast_vocab_limit: int = 5_000_000,
    n_merge_buckets: int = 64,
) -> "pa.Table":
    """Top-k word collocations by pointwise mutual information
    (Church & Hanks 1990) over adjacent whitespace-token bigrams —
    the association-mining step of phrase/collocation extraction in
    corpus pipelines. Within a fixed corpus, PMI(a,b) =
    log(n_ab·T²/(n_a·n_b·B)) orders exactly like the rational
    n_ab/(n_a·n_b) (T²/B is constant), so the emitted ranking key is
    the EXACT integer ``assoc_e12 = 10^12·n_ab // (n_a·n_b)`` —
    no transcendental ever enters an oracle-checked column
    (CLAUDE.md: ln() is 1 ulp off numpy). Ordering: assoc_e12 DESC,
    n_ab DESC, w1 ASC, w2 ASC (bytewise, = DuckDB binary collation).

    Scale shape: ONE map_batches pass emits per-block (gram, cnt)
    partials for unigrams AND bigrams merged by ONE cluster-sized
    groupby (bigram keys contain a space, unigram keys cannot —
    composite reduction without a kind column). Bigrams below
    ``min_count`` drop immediately after the merge. Unigram-count
    attach is two-tier: vocabularies ≤ ``broadcast_vocab_limit``
    broadcast once (sorted-array searchsorted, task-cached); larger
    vocabularies use union + coarse-key groupby-merge twice (once
    per bigram side) — the standing Dataset.join replacement. The
    integer key is computed with Python ints (candidate bigrams are
    metadata-scale after min_count) and asserted into the int64
    envelope. Final top-k = mergeable per-block local top-k + a
    bounded driver fold (≤ k rows per post-shuffle block).

    Reference anchor (behavioral): the reference's co-occurrence
    rule mining (aminer/analysis/EventCorrelationDetector.py
    hypothesis→support counting) is the same pair-support/
    single-support ratio shape over event types; here the "events"
    are adjacent tokens and the ratio is exact."""
    import pandas as pd
    from ray.data.aggregate import Sum

    import ray

    from ._taskcache import cached_task_fn

    def part(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return _token_partials_block(col)

    totals = ds.map_batches(
        part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).repartition(shuffle_parallelism()).groupby("gram").aggregate(
        Sum("cnt", alias_name="cnt"))

    is_bigram = lambda t: pc.match_substring(t["gram"], " ")  # noqa: E731

    def split_bg(batch: pa.Table) -> pa.Table:
        m = is_bigram(batch)
        bg = batch.filter(pc.and_(m, pc.greater_equal(
            batch["cnt"], min_count)))
        sp = pc.split_pattern(bg["gram"], " ")
        return pa.table({
            "w1": pc.list_element(sp, 0),
            "w2": pc.list_element(sp, 1),
            "n_ab": bg["cnt"],
        })

    def split_ug(batch: pa.Table) -> pa.Table:
        u = batch.filter(pc.invert(is_bigram(batch)))
        return pa.table({"w": u["gram"], "n": u["cnt"]})

    totals = totals.materialize()  # narrow (gram, cnt) rows, reused twice
    bg = totals.map_batches(split_bg, batch_format="pyarrow", batch_size=None)
    ug = totals.map_batches(split_ug, batch_format="pyarrow", batch_size=None)
    n_vocab = ug.count()

    def score_rows(w1, w2, n_ab, n_a, n_b) -> pa.Table:
        assoc = [
            (10**12 * int(ab)) // (int(a) * int(b))
            for ab, a, b in zip(n_ab, n_a, n_b)
        ]
        if any(v >= 2**63 for v in assoc):  # precision dial: lower the
            raise ValueError(  # 10^12 scale if a corpus ever trips this
                "pmi_collocations: assoc_e12 exceeds int64; lower the scale")
        return pa.table({
            "w1": pa.array(list(w1), pa.string()),
            "w2": pa.array(list(w2), pa.string()),
            "n_ab": pa.array(np.asarray(n_ab, np.int64), pa.int64()),
            "n_a": pa.array(np.asarray(n_a, np.int64), pa.int64()),
            "n_b": pa.array(np.asarray(n_b, np.int64), pa.int64()),
            "assoc_e12": pa.array(assoc, pa.int64()),
        })

    if n_vocab <= broadcast_vocab_limit:
        u = ug.to_pandas()
        order = np.argsort(u["w"].to_numpy())
        words = u["w"].to_numpy()[order]
        counts = u["n"].to_numpy(np.int64)[order]
        blob = ray.put((words, counts))

        class Attach:
            def __init__(self, blob_ref):
                self.words, self.counts = ray.get(blob_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                w1 = np.asarray(batch["w1"].to_pylist(), object)
                w2 = np.asarray(batch["w2"].to_pylist(), object)
                n_a = self.counts[np.searchsorted(self.words, w1)]
                n_b = self.counts[np.searchsorted(self.words, w2)]
                return score_rows(
                    w1, w2, batch["n_ab"].to_numpy(zero_copy_only=False),
                    n_a, n_b)

        scored = bg.map_batches(
            cached_task_fn(Attach, cache_on=(blob, "pmi"), blob_ref=blob),
            batch_format="pyarrow", batch_size=None)
    else:
        # large-vocab tier: union + coarse-key groupby-merge, once per
        # bigram side (groupby UDFs return ARROW tables — CLAUDE.md)
        def merge_side(bg_ds, side: str, out_col: str):
            bg_names = bg_ds.schema().names  # resolved on the driver —
            # never capture a Dataset handle inside a worker closure

            def tag_bg(batch: pa.Table) -> pa.Table:
                key = batch[side]
                t = batch.append_column("key", key)
                return t.append_column(
                    "n", pa.array(np.zeros(batch.num_rows, np.int64)))

            def tag_ug(batch: pa.Table) -> pa.Table:
                z = pa.array([None] * batch.num_rows, pa.string())
                cols = {"key": batch["w"], "n": batch["n"]}
                for c in bg_names:
                    cols[c] = (
                        pa.array(np.zeros(batch.num_rows, np.int64))
                        if c not in ("w1", "w2") else z)
                t = pa.table(cols)  # ug rows: w1/w2 both null
                return t.select(bg_names + ["key", "n"])

            def bucket(batch: pa.Table) -> pa.Table:
                h = pd.util.hash_pandas_object(
                    pd.Series(batch["key"].to_pylist()), index=False
                ).to_numpy(np.uint64)
                return batch.append_column(
                    "kb", pa.array((h % n_merge_buckets).astype(np.int64)))

            def attach(g: pd.DataFrame) -> pa.Table:
                is_ug = g["w1"].isna()  # bigram rows always carry w1
                ud = g[is_ug][["key", "n"]].rename(columns={"n": out_col})
                bd = g[~is_ug].drop(columns=["n", "kb"])
                m = bd.merge(ud, on="key", how="left").drop(columns=["key"])
                return pa.Table.from_pandas(
                    m, preserve_index=False).cast(pa.schema(
                        [(c, pa.string() if c in ("w1", "w2")
                          else pa.int64()) for c in m.columns]))

            tagged = bg_ds.map_batches(
                tag_bg, batch_format="pyarrow", batch_size=None
            ).union(ug.map_batches(
                tag_ug, batch_format="pyarrow", batch_size=None))
            return tagged.map_batches(
                bucket, batch_format="pyarrow", batch_size=None
            ).groupby("kb").map_groups(attach, batch_format="pandas")

        with_a = merge_side(bg, "w1", "n_a")
        with_ab = merge_side(with_a, "w2", "n_b")

        def finish(batch: pa.Table) -> pa.Table:
            return score_rows(
                batch["w1"].to_pylist(), batch["w2"].to_pylist(),
                batch["n_ab"].to_numpy(zero_copy_only=False),
                batch["n_a"].to_numpy(zero_copy_only=False),
                batch["n_b"].to_numpy(zero_copy_only=False))

        scored = with_ab.map_batches(
            finish, batch_format="pyarrow", batch_size=None)

    sort_keys = [("assoc_e12", "descending"), ("n_ab", "descending"),
                 ("w1", "ascending"), ("w2", "ascending")]

    def local_topk(batch: pa.Table) -> pa.Table:
        return batch.take(pc.sort_indices(batch, sort_keys=sort_keys)[:k])

    head = scored.map_batches(
        local_topk, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # bounded: k rows per block
    if head.empty:  # empty Datasets lose their schema through to_pandas
        cols = ("w1", "w2", "n_ab", "n_a", "n_b", "assoc_e12")
        head = pd.DataFrame({c: pd.Series(
            dtype=object if c in ("w1", "w2") else np.int64) for c in cols})
    head = head.sort_values(
        ["assoc_e12", "n_ab", "w1", "w2"],
        ascending=[False, False, True, True], kind="mergesort").head(k)
    out = {c: pa.array(head[c].to_numpy(np.int64), pa.int64())
           if c not in ("w1", "w2")
           else pa.array(head[c].tolist(), pa.string())
           for c in ("w1", "w2", "n_ab", "n_a", "n_b", "assoc_e12")}
    out["rnk"] = pa.array(np.arange(1, len(head) + 1, dtype=np.int64))
    return pa.table(out)


# ---------------------------------------------------------------- BPE learn

def _apply_merges(syms: list, merges: list) -> list:
    """Apply an ordered merge list to one symbol sequence, each merge
    greedy left-to-right non-overlapping (Sennrich et al. 2016)."""
    for s1, s2 in merges:
        out, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == s1 and syms[i + 1] == s2:
                out.append(s1 + s2)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _pair_fold(words: list, cnts: np.ndarray, merges: list) -> dict:
    """Occurrence-weighted adjacent-pair counts of the CURRENT
    segmentation (merges applied per word type)."""
    acc: dict = {}
    for w, c in zip(words, cnts):
        syms = _apply_merges(list(w), merges)
        for a, b in zip(syms, syms[1:]):
            k = (a, b)
            acc[k] = acc.get(k, 0) + int(c)
    return acc


def bpe_learn(
    ds: "ray.data.Dataset",
    *,
    n_merges: int = 3,
    text_col: str = "text",
    driver_type_limit: int = 500_000,
) -> "pa.Table":
    """Learn the first ``n_merges`` BPE merges (Sennrich et al. 2016,
    character-level): iteratively pick the most frequent adjacent
    symbol pair (occurrence-weighted over word TYPES; ties → smallest
    (s1, s2) bytewise, the DuckDB binary collation) and merge it
    greedy left-to-right in every word. Returns (step, s1, s2, cnt).

    Scale shape: the corpus-sized work is ONE narrow (word, cnt)
    type-table reduction — the merge loop runs over word TYPES, whose
    cardinality is corpus-size-independent (a vocabulary), never over
    the corpus. Two tiers: at or below ``driver_type_limit`` types
    the loop folds on the driver (pure-Python greedy, exact); above
    it the type table stays a Dataset and each iteration is one
    shuffle-free per-block partial pair-count pass + a tiny driver
    fold (pair alphabet is bounded), the kmeans_assign per-iteration
    pattern. Both tiers are bit-identical (tier-parity tested).
    """
    from ray.data.aggregate import Sum

    def wt_part(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(pc.split_pattern_regex(col, _WS))
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        t = pa.table({"word": flat}).group_by(["word"]).aggregate(
            [([], "count_all")])
        return t.rename_columns(["word", "cnt"])

    partials = ds.map_batches(
        wt_part, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).materialize()
    types = partials.repartition(shuffle_parallelism()).groupby(
        "word").aggregate(Sum("cnt", alias_name="cnt")).materialize()

    merges: list = []
    steps: list = []
    if types.count() <= driver_type_limit:
        df = types.to_pandas()
        words = df["word"].tolist()
        cnts = df["cnt"].to_numpy(np.int64)
        for _ in range(n_merges):
            acc = _pair_fold(words, cnts, merges)
            if not acc:
                break
            best = min(acc.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append(best[0])
            steps.append((len(steps) + 1, *best[0], best[1]))
    else:  # scale tier: per-iteration partial passes over the TYPE table
        for _ in range(n_merges):
            cur = tuple(merges)

            def pair_part(batch: pa.Table, _m=cur) -> pa.Table:
                acc = _pair_fold(
                    batch["word"].to_pylist(),
                    batch["cnt"].to_numpy(zero_copy_only=False), list(_m))
                if not acc:
                    return pa.table({"s1": pa.array([], pa.string()),
                                     "s2": pa.array([], pa.string()),
                                     "c": pa.array([], pa.int64())})
                ks = sorted(acc)
                return pa.table({
                    "s1": pa.array([k[0] for k in ks], pa.string()),
                    "s2": pa.array([k[1] for k in ks], pa.string()),
                    "c": pa.array([acc[k] for k in ks], pa.int64())})

            folded: dict = {}
            for b in types.map_batches(
                pair_part, batch_format="pyarrow", batch_size=None,
            ).iter_batches(batch_format="pyarrow"):
                for s1, s2, c in zip(b["s1"].to_pylist(),
                                     b["s2"].to_pylist(),
                                     b["c"].to_pylist()):
                    folded[(s1, s2)] = folded.get((s1, s2), 0) + c
            if not folded:
                break
            best = min(folded.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append(best[0])
            steps.append((len(steps) + 1, *best[0], best[1]))

    return pa.table({
        "step": pa.array([s[0] for s in steps], pa.int64()),
        "s1": pa.array([s[1] for s in steps], pa.string()),
        "s2": pa.array([s[2] for s in steps], pa.string()),
        "cnt": pa.array([s[3] for s in steps], pa.int64()),
    })


def bpe_encode(
    ds: "ray.data.Dataset",
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    return_tokens: bool = False,
    carry_cols: tuple = (),
    word_bytes: bool = False,
) -> "ray.data.Dataset":
    """Apply an ORDERED BPE merge list (``bpe_learn`` output) to every
    whitespace word of the corpus — the tokenizer-application half of
    BPE (Sennrich et al. 2016 §3: each merge rewrites all its
    occurrences greedy left-to-right, in learned order; applying in
    rank order equals lowest-rank-first because a pair's rank always
    exceeds its constituents' ranks).

    Returns one row per document with ≥1 word:
    ``(id_col, n_words, n_bpe_tokens)`` — and, with
    ``return_tokens=True``, a ``tokens`` list<string> column of the
    document's symbol sequence in word order. ``carry_cols`` ride the
    output row-aligned (the ccnet carry pattern — never join a
    corpus-sized encode output back onto the corpus);
    ``word_bytes=True`` adds ``n_word_bytes`` (total UTF-8 bytes of
    the whitespace words, SQL ``octet_length``) for fertility /
    compression-ratio stats.

    Scale shape: ONE shuffle-free pass; the merge list broadcasts via
    ``ray.put`` (vocabulary-sized); within each block every DISTINCT
    word encodes once (per-block type table via np.unique) and counts
    scatter back through the inverse index — the corpus-sized work is
    vectorized token splitting, never per-occurrence Python."""
    import ray

    from ._taskcache import cached_task_fn

    mref = ray.put([tuple(m) for m in merges])

    class Encode:
        def __init__(self, mref, text_col, id_col, return_tokens,
                     carry_cols=(), word_bytes=False):
            self.merges = ray.get(mref)
            self.text_col, self.id_col = text_col, id_col
            self.return_tokens = return_tokens
            self.carry_cols, self.word_bytes = tuple(carry_cols), word_bytes

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch[self.text_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            col = pc.fill_null(pc.cast(col, pa.string()), "")
            toks = pc.split_pattern_regex(col, _WS)
            flat = pc.list_flatten(toks)
            parent = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False)
            keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(
                zero_copy_only=False)
            words = np.asarray(flat.to_pylist(), dtype=object)[keep]
            parent = parent[keep]
            n = batch.num_rows
            if len(words):
                uniq, inv = np.unique(words, return_inverse=True)
                enc = [_apply_merges(list(w), self.merges) for w in uniq]
                ntok = np.array([len(e) for e in enc], dtype=np.int64)
                n_words = np.bincount(parent, minlength=n)
                n_bpe = np.bincount(parent, weights=ntok[inv],
                                    minlength=n).astype(np.int64)
            else:
                n_words = np.zeros(n, np.int64)
                n_bpe = np.zeros(n, np.int64)
            k = np.flatnonzero(n_words >= 1)
            k_idx = pa.array(k, pa.int64())
            out = {
                self.id_col: batch[self.id_col].cast(pa.int64()).take(k_idx),
                "n_words": pa.array(n_words[k].astype(np.int64), pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe[k], pa.int64()),
            }
            if self.word_bytes:
                if len(words):
                    wb = pc.binary_length(flat).to_numpy(
                        zero_copy_only=False).astype(np.int64)[keep]
                    n_wb = np.bincount(parent, weights=wb,
                                       minlength=n).astype(np.int64)
                else:
                    n_wb = np.zeros(n, np.int64)
                out["n_word_bytes"] = pa.array(n_wb[k], pa.int64())
            for c in self.carry_cols:
                out[c] = batch[c].take(k_idx)
            if self.return_tokens:
                # parent is non-decreasing (list_parent_indices order)
                bounds = np.searchsorted(parent, np.arange(n + 1))
                toks_out = []
                for row in k:
                    seq: list[str] = []
                    for wi in inv[bounds[row]:bounds[row + 1]]:
                        seq.extend(enc[wi])
                    toks_out.append(seq)
                out["tokens"] = pa.array(toks_out, pa.list_(pa.string()))
            return pa.table(out)

    return ds.map_batches(
        cached_task_fn(
            Encode, cache_on=(mref, text_col, id_col, return_tokens,
                              tuple(carry_cols), word_bytes),
            mref=mref, text_col=text_col, id_col=id_col,
            return_tokens=return_tokens, carry_cols=tuple(carry_cols),
            word_bytes=word_bytes,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


def vocab_growth(
    ds: "ray.data.Dataset",
    *,
    n_checkpoints: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_max: int | None = None,
) -> "pa.Table":
    """Heaps'-law vocabulary growth curve: distinct word types seen
    within each prefix of the corpus (by ``id_col`` order), at
    ``n_checkpoints`` equal id cutoffs. The classic corpus-QA probe —
    a vocabulary that stops growing signals template/boilerplate
    dominance; unbounded linear growth signals OCR noise or spam.

    Distributed recast: "distinct words in prefix ≤ c for every c"
    needs only each word's FIRST occurrence id — one narrow
    (word, min_id) reduction (the same type-table shuffle as
    ``bpe_learn``), then a tiny histogram of first-occurrence ids
    over the cutoffs and a cumulative sum on the driver. No
    per-prefix rescans, no corpus-sized gather.

    Cutoff c_j = floor((j+1)·(id_max+1)/n_checkpoints) - 1 for j in
    0..n-1 (the last cutoff covers every id); a word counts toward
    checkpoint j iff min_id <= c_j. Returns (cutoff, vocab) int64.
    """
    from ray.data.aggregate import Min

    if id_max is None:
        # a second (column-pruned, id-only) pass; pass id_max in when
        # the caller already knows the id domain to avoid it
        mx = ds.max(id_col)
        if mx is None:  # empty dataset: typed empty curve
            return pa.table({"cutoff": pa.array([], pa.int64()),
                             "vocab": pa.array([], pa.int64())})
        id_max = int(mx)

    def wt_part(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, _WS)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = batch[id_col].take(parent)
        keep = pc.greater(pc.utf8_length(flat), 0)
        t = pa.table({"word": flat.filter(keep),
                      "min_id": ids.filter(keep)})
        agg = t.group_by(["word"]).aggregate([("min_id", "min")])
        return agg.rename_columns(["word", "min_id"])

    firsts = (
        ds.map_batches(wt_part, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .repartition(shuffle_parallelism())
        .groupby("word")
        .aggregate(Min("min_id", alias_name="min_id"))
    )

    # unique ascending cutoffs — duplicates arise when id_max + 1 <
    # n_checkpoints; the SQL oracle dedupes them with SELECT DISTINCT
    # in its cutoff CTE (GROUP BY alone would multiply the LEFT JOIN
    # matches per duplicate cutoff row)
    cuts = np.unique(np.array(
        [(j + 1) * (id_max + 1) // n_checkpoints - 1
         for j in range(n_checkpoints)], dtype=np.int64))
    nc = len(cuts)

    def hist_part(batch: pa.Table) -> pa.Table:
        m = batch["min_id"].to_numpy(zero_copy_only=False)
        # first checkpoint covering each word: searchsorted over cuts
        j = np.searchsorted(cuts, m, side="left")
        h = np.bincount(j[j < nc], minlength=nc)
        return pa.table({"j": pa.array(np.arange(nc), pa.int64()),
                         "h": pa.array(h.astype(np.int64), pa.int64())})

    hist = np.zeros(nc, dtype=np.int64)
    for b in firsts.map_batches(
        hist_part, batch_format="pyarrow", batch_size=None,
    ).iter_batches(batch_format="pyarrow"):
        # iter_batches coalesces blocks → repeated j indices; += with
        # fancy indexing would keep only the last — np.add.at is the
        # unbuffered accumulate
        np.add.at(hist, b["j"].to_numpy(zero_copy_only=False),
                  b["h"].to_numpy(zero_copy_only=False))
    return pa.table({
        "cutoff": pa.array(cuts, pa.int64()),
        "vocab": pa.array(np.cumsum(hist).astype(np.int64), pa.int64()),
    })


def fertility_stats(
    ds: "ray.data.Dataset",
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    scale: int = 10**6,
) -> pd.DataFrame:
    """Per-language tokenizer fertility report: BPE tokens per
    whitespace word and UTF-8 bytes per BPE token — the standard
    multilingual tokenizer-quality metrics (fertility, cf. Ács 2019 /
    Rust et al. 2021: high fertility on a language means the
    vocabulary under-serves it; bytes-per-token is the compression
    ratio that fixes a token budget's byte reach per language).

    Ratios are emitted as EXACT scaled integers (``sum_tokens * scale
    // sum_words`` on Python ints — the repo's standing
    floor-divided-rational recast, never a float in an oracle-checked
    column) alongside the raw integer sums so downstream can
    re-derive any ratio.

    Scale shape: ONE shuffle-free :func:`bpe_encode` pass with
    ``lang`` riding as a carry column (never a corpus-sized join
    back), per-block Arrow group_by partials on the tiny lang key
    (≤ |langs| rows per block), driver fold. Docs with zero words
    drop on both engine and SQL sides (the encode emits no row)."""
    enc = bpe_encode(
        ds, merges, text_col=text_col, id_col=id_col,
        carry_cols=(lang_col,), word_bytes=True)

    def part(batch: pa.Table) -> pa.Table:
        lang = pc.fill_null(pc.cast(batch[lang_col], pa.string()), "(null)")
        t = pa.table({
            "lang": lang,
            "n_words": batch["n_words"],
            "n_bpe_tokens": batch["n_bpe_tokens"],
            "n_word_bytes": batch["n_word_bytes"],
        })
        return t.group_by(["lang"]).aggregate(
            [("n_words", "sum"), ("n_bpe_tokens", "sum"),
             ("n_word_bytes", "sum"), ([], "count_all")])

    parts = enc.map_batches(
        part, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).to_pandas()  # ≤ |langs| x blocks rows
    cols = ["n_docs", "n_words", "n_bpe_tokens", "n_word_bytes",
            "fertility_e6", "bytes_per_token_e6"]
    if parts.empty:
        return pd.DataFrame(
            {"lang": pd.Series(dtype=object),
             **{c: pd.Series(dtype=np.int64) for c in cols}})
    agg = (parts.groupby("lang", sort=True)
           .agg(n_docs=("count_all", "sum"),
                n_words=("n_words_sum", "sum"),
                n_bpe_tokens=("n_bpe_tokens_sum", "sum"),
                n_word_bytes=("n_word_bytes_sum", "sum"))
           .reset_index())
    # exact integer ratios (Python int //, matches SQL HUGEINT //)
    agg["fertility_e6"] = [
        int(t) * scale // int(w)
        for t, w in zip(agg["n_bpe_tokens"], agg["n_words"])]
    agg["bytes_per_token_e6"] = [
        int(b) * scale // int(t)
        for b, t in zip(agg["n_word_bytes"], agg["n_bpe_tokens"])]
    for c in cols:
        agg[c] = agg[c].astype(np.int64)
    return agg[["lang"] + cols]


def token_novelty(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Per-document novel-token-type fraction (the inter-document
    repetition QA of Lee et al. 2022: how much of each document's
    vocabulary appears for the FIRST time in the corpus, by id
    order): n_types = distinct words in the doc, n_novel = those
    whose corpus-wide min doc_id is this doc, novelty_e6 = exact
    ``10^6·n_novel // n_types`` (0 for empty docs). Boilerplate-
    dominated corpora decay to ~0 novelty fast; OCR noise pins it
    near 10^6.

    Scale shape: the corpus-sized work is the SAME narrow
    (word, min_id) type reduction as :func:`vocab_growth` (per-block
    Arrow partials → one vocabulary-bounded groupby); n_types is
    per-row block-local (shuffle-free), n_novel is a tiny
    (doc, count) reduction of the type table, and the two attach by
    union + coarse-key merge — never ``Dataset.join``
    (CLAUDE.md)."""
    from ray.data.aggregate import Min

    from ._agg import coarse_grouped
    from ._shuffle import shuffle_parallelism

    def wt_part(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, _WS)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = batch[id_col].take(parent)
        keep = pc.greater(pc.utf8_length(flat), 0)
        t = pa.table({"word": flat.filter(keep),
                      "min_id": ids.filter(keep)})
        agg = t.group_by(["word"]).aggregate([("min_id", "min")])
        return agg.rename_columns(["word", "min_id"])

    firsts = (
        ds.map_batches(wt_part, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .repartition(shuffle_parallelism())
        .groupby("word")
        .aggregate(Min("min_id", alias_name="min_id"))
    )

    def novel_part(batch: pa.Table) -> pa.Table:
        agg = batch.select(["min_id"]).group_by(["min_id"]).aggregate(
            [([], "count_all")])
        agg = agg.rename_columns(["doc", "v"])
        return pa.table({
            "doc": agg["doc"],
            "kind": pa.array(
                np.ones(agg.num_rows, dtype=np.int8), pa.int8()),
            "v": pc.cast(agg["v"], pa.int64()),
        })

    novel = firsts.map_batches(
        novel_part, batch_format="pyarrow", batch_size=None)

    def types_part(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, _WS)
        flat = pc.list_flatten(toks)
        parent = pa.array(pc.list_parent_indices(toks))
        keep = pc.greater(pc.utf8_length(flat), 0)
        tw = pa.table({"p": parent.filter(keep), "w": flat.filter(keep)})
        dw = tw.group_by(["p", "w"]).aggregate([])
        pcount = np.bincount(
            dw["p"].to_numpy(zero_copy_only=False),
            minlength=batch.num_rows).astype(np.int64)
        return pa.table({
            "doc": batch[id_col],
            "kind": pa.array(
                np.zeros(batch.num_rows, dtype=np.int8), pa.int8()),
            "v": pa.array(pcount, pa.int64()),
        })

    types = ds.map_batches(
        types_part, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)

    def fold(g: "pd.DataFrame") -> pa.Table:
        piv = g.pivot_table(index="doc", columns="kind", values="v",
                            aggfunc="sum", fill_value=0)
        docs = piv.index.to_numpy(np.int64)
        n_types = (piv[0].to_numpy(np.int64) if 0 in piv.columns
                   else np.zeros(len(docs), np.int64))
        n_novel = (piv[1].to_numpy(np.int64) if 1 in piv.columns
                   else np.zeros(len(docs), np.int64))
        safe = np.maximum(n_types, 1)
        ne6 = (1_000_000 * n_novel) // safe
        ne6[n_types == 0] = 0
        return pa.table({
            "doc_id": pa.array(docs, pa.int64()),
            "n_types": pa.array(n_types, pa.int64()),
            "n_novel": pa.array(n_novel, pa.int64()),
            "novelty_e6": pa.array(ne6, pa.int64()),
        })

    return coarse_grouped(types.union(novel), ["doc"], fold)

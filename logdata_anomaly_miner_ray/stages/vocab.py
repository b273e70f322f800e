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

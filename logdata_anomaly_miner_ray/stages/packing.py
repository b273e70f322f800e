"""Sequence packing: the concat-and-chunk manifest for LLM training.

``pack_sequences`` assigns every document a global token offset in
the corpus-order concatenation (documents ordered by id, an EOS-style
separator between consecutive documents) and derives which fixed
``seq_len`` training sequences the document lands in — the GPT-style
"concatenate everything, split every L tokens, documents may straddle
boundaries" packing used by most LLM pretraining loaders. The output
is a MANIFEST (doc → offset/sequence span), not materialized token
ids, which is what a 100-TB pipeline actually ships to the tokenizer
workers: each downstream shard worker reads only the documents whose
``seq_first..seq_last`` intersect its sequence range.

Scale shape — a distributed exclusive prefix scan, no all-to-all over
data:

1. one shuffle-free pass reduces each document to ``(id, n_tok)``
   (vectorized whitespace token counting; raw text never moves);
2. a range ``sort`` on the NARROW (id, n_tok) rows only (16 bytes a
   row — the only shuffle, and it is the cheapest possible one);
3. per-block ``(min_id, token_sum)`` metadata rows — one row per
   block — fold on the driver into exclusive base offsets (blocks of
   a range-sorted dataset have disjoint id ranges, so ``min_id``
   identifies a block independent of execution order);
4. the bases broadcast once (``ray.put``) and a final shuffle-free
   pass emits ``base + within-block exclusive cumsum``.

The driver holds one row per BLOCK, not per document — bounded by
partition count, the same contract as the suite's meta reduction.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

import ray

from ._taskcache import cached_task_fn

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _token_counts(texts) -> np.ndarray:
    """Whitespace token count per row — ASCII-whitespace semantics
    identical to ``functions.text.token_spans`` (and to RE2/DuckDB
    ``\\s+`` splitting), one pass over the flat utf-8 buffer."""
    from ..functions.text import flat_utf8, token_spans

    data, offsets = flat_utf8(texts)
    nrows = len(offsets) - 1
    _, _, row_id = token_spans(data, offsets)
    return np.bincount(row_id, minlength=nrows).astype(np.int64)


def pack_sequences(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    seq_len: int,
    sep_tokens: int = 1,
) -> "ray.data.Dataset":
    """Concat-and-chunk packing manifest over documents ordered by
    ``id_col`` (ids must be unique; zero-token documents are dropped
    and consume no separator).

    Returns ``(id_col, n_tok, tok_start, seq_first, seq_last,
    off_in_first)``: the document's whitespace token count, its global
    token offset in the concatenation (each kept document is followed
    by ``sep_tokens`` separator tokens), and the first/last ``seq_len``
    sequence indices it occupies plus its offset within the first.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def count(batch: pa.Table) -> pa.Table:
        n = _token_counts(batch[text_col])
        keep = n > 0
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "n_tok": pa.array(n[keep], pa.int64()),
            }
        )

    narrow = ds.map_batches(
        count, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).sort(id_col).materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        tot = int(batch["n_tok"].to_numpy(zero_copy_only=False).sum())
        return pa.table(
            {
                "min_id": pa.array([int(ids.min())], pa.int64()),
                "tok": pa.array([tot + sep_tokens * len(ids)], pa.int64()),
            }
        )

    metas = narrow.map_batches(
        block_meta, batch_format="pyarrow", batch_size=None
    ).take_all()  # one row per block — bounded by partition count
    metas.sort(key=lambda r: r["min_id"])
    base = 0
    bases = {}
    for m in metas:
        bases[int(m["min_id"])] = base
        base += int(m["tok"])
    bases_ref = ray.put(bases)

    class Emit:
        def __init__(self, bases_ref, id_col, seq_len, sep_tokens):
            self.bases = ray.get(bases_ref)
            self.id_col, self.L = id_col, seq_len
            self.sep = sep_tokens

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[self.id_col].to_numpy(zero_copy_only=False)
            n = batch["n_tok"].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")  # block is range-
            # sorted already; argsort guards against intra-block reorder
            ids, n = ids[order], n[order]
            span = n + self.sep
            start = self.bases[int(ids.min())] + np.cumsum(span) - span
            return pa.table(
                {
                    self.id_col: pa.array(ids, pa.int64()),
                    "n_tok": pa.array(n, pa.int64()),
                    "tok_start": pa.array(start, pa.int64()),
                    "seq_first": pa.array(start // self.L, pa.int64()),
                    "seq_last": pa.array((start + n - 1) // self.L, pa.int64()),
                    "off_in_first": pa.array(start % self.L, pa.int64()),
                }
            )

    return narrow.map_batches(
        cached_task_fn(
            Emit, cache_on=(bases_ref, id_col, seq_len, sep_tokens),
            bases_ref=bases_ref, id_col=id_col, seq_len=seq_len,
            sep_tokens=sep_tokens,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )

"""Composed corpus-cleaning pipeline (C4/Gopher-style).

The canonical LLM-training-data cleaning pass, assembled from the
engine's already-verified operators as ONE streaming pipeline:

1. length gate — char count within [min_chars, max_chars];
2. token gate — whitespace token count ≥ min_tokens
   (functions.text.token_counts);
3. repetition gates — duplicate-line fraction and top-2-gram
   fraction bounded as EXACT rationals: a doc fails when
   ``n_dup_lines·den > num·n_lines`` (integer math, no float
   thresholds; stages.text_analysis.repetition_arrays);
4. exact-dedup keep — only the min doc_id per md5(text) survives
   (stages.dedup.exact_dup_groups).

Execution shape: the dedup keep-set is the only wide step — a
pre-aggregated 16-byte-hash groupby whose (small) result is
``ray.put`` once and loaded per gate task; gates 1-3 plus the
keep-set membership test then run as ONE fused per-block
``map_batches`` pass — text never shuffles, and dropped rows are
visible via the per-gate flag columns (set ``keep_only=False``) so
nothing is silently truncated. At 100 TB the keep set is bounded by
#distinct-text hashes; if it outgrows the object store, swap the
broadcast for an anti-join on (hash, doc_id) (stages.referential) —
same result, one more shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ..stages._taskcache import cached_task_fn


def clean_corpus(
    ds: "rd.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 1,
    max_chars: int = 10**9,
    min_tokens: int = 1,
    max_dup_line_frac: tuple[int, int] = (1, 4),
    max_top_2gram_frac: tuple[int, int] = (1, 5),
    keep_only: bool = True,
) -> "rd.Dataset":
    """Kept doc ids (``keep_only=True``) or every id with its
    per-gate pass flags (``ok_len ok_tok ok_rep ok_dedup``)."""
    from ..functions.text import token_counts
    from ..stages.dedup import exact_dup_groups
    from ..stages.text_analysis import repetition_arrays

    keep = (
        exact_dup_groups(ds, text_col, id_col)
        .map_batches(
            lambda t: t.select(["keep_id"]),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
        .to_pandas()
    )
    keep_ref = ray.put(frozenset(int(x) for x in keep["keep_id"]))
    dl_num, dl_den = max_dup_line_frac
    tg_num, tg_den = max_top_2gram_frac

    class Gates:
        def __init__(self):
            self.keep_ids = ray.get(keep_ref)  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
            n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
            toks = token_counts(text)
            nl, nd, ng, tg = repetition_arrays(text)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            ok_len = (n_chars >= min_chars) & (n_chars <= max_chars)
            ok_tok = toks >= min_tokens
            ok_rep = (nd * dl_den <= dl_num * nl) & (tg * tg_den <= tg_num * ng)
            ok_dedup = np.fromiter(
                (int(i) in self.keep_ids for i in ids), dtype=bool, count=len(ids)
            )
            out = pa.table(
                {
                    id_col: batch[id_col],
                    "ok_len": pa.array(ok_len),
                    "ok_tok": pa.array(ok_tok),
                    "ok_rep": pa.array(ok_rep),
                    "ok_dedup": pa.array(ok_dedup),
                }
            )
            if keep_only:
                return out.filter(
                    pc.and_(
                        pc.and_(out["ok_len"], out["ok_tok"]),
                        pc.and_(out["ok_rep"], out["ok_dedup"]),
                    )
                ).select([id_col])
            return out

    return ds.map_batches(
        cached_task_fn(
            Gates,
            cache_on=(keep_ref, text_col, id_col, min_chars, max_chars, min_tokens,
                      dl_num, dl_den, tg_num, tg_den, keep_only),
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )

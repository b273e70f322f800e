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
   (stages.dedup.exact_dup_groups semantics).

Execution shape — two tiers on the dedup step, decided by row count:

- **broadcast tier** (``count ≤ driver_keep_limit``): the keep-set
  (min id per 16-byte hash) is a small groupby result, ``ray.put``
  once and loaded per gate task; gates 1-3 plus the membership test
  run as ONE fused per-block pass — text never shuffles.
- **scale tier** (beyond the limit): the keep-set would be ~corpus-
  sized (mostly-unique texts), so nothing is ever collected to the
  driver. The same fused per-block pass emits NARROW rows
  ``(bucket, h1, h2, id, ok_len, ok_tok, ok_rep)`` — the 128-bit md5
  halves of the text (identical grouping identity to the broadcast
  tier's hex hash) plus the gate flags; one coarse-key groupby
  co-locates equal hashes and marks ``ok_dedup = (id == group min)``
  inside pandas. Shuffle volume = ~35 bytes/row, text never moves,
  and there is no join-back (the flags ride the shuffled rows).

Dropped rows are visible via the per-gate flag columns (set
``keep_only=False``) so nothing is silently truncated.
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
    driver_keep_limit: int = 2_000_000,
    n_buckets: int | None = None,
) -> "rd.Dataset":
    """Kept doc ids (``keep_only=True``) or every id with its
    per-gate pass flags (``ok_len ok_tok ok_rep ok_dedup``).

    ``driver_keep_limit`` selects the dedup tier (see module
    docstring); force the scale tier with ``driver_keep_limit=0``.
    """
    from ..functions.text import token_counts
    from ..stages.text_analysis import repetition_arrays

    dl_num, dl_den = max_dup_line_frac
    tg_num, tg_den = max_top_2gram_frac

    def gate_arrays(batch: pa.Table):
        """(ok_len, ok_tok, ok_rep) bool arrays — shared by both tiers."""
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        toks = token_counts(text)
        nl, nd, ng, tg = repetition_arrays(text)
        ok_len = (n_chars >= min_chars) & (n_chars <= max_chars)
        ok_tok = toks >= min_tokens
        ok_rep = (nd * dl_den <= dl_num * nl) & (tg * tg_den <= tg_num * ng)
        return ok_len, ok_tok, ok_rep

    def flags_out(ids: pa.Array, ok_len, ok_tok, ok_rep, ok_dedup) -> pa.Table:
        out = pa.table(
            {
                id_col: ids,
                "ok_len": pa.array(np.asarray(ok_len, bool)),
                "ok_tok": pa.array(np.asarray(ok_tok, bool)),
                "ok_rep": pa.array(np.asarray(ok_rep, bool)),
                "ok_dedup": pa.array(np.asarray(ok_dedup, bool)),
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

    n_rows = ds.count()
    if n_rows <= driver_keep_limit:
        # ---- broadcast tier: small keep-set shipped once ----
        from ..stages.dedup import exact_dup_groups

        keep = (
            exact_dup_groups(ds, text_col, id_col)
            .map_batches(
                lambda t: t.select(["keep_id"]),
                batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
            )
            .to_pandas()
        )
        keep_ref = ray.put(frozenset(int(x) for x in keep["keep_id"]))

        class Gates:
            def __init__(self):
                self.keep_ids = ray.get(keep_ref)  # once per actor

            def __call__(self, batch: pa.Table) -> pa.Table:
                ok_len, ok_tok, ok_rep = gate_arrays(batch)
                ids = batch[id_col].to_numpy(zero_copy_only=False)
                ok_dedup = np.fromiter(
                    (int(i) in self.keep_ids for i in ids),
                    dtype=bool, count=len(ids),
                )
                return flags_out(batch[id_col], ok_len, ok_tok, ok_rep, ok_dedup)

        return ds.map_batches(
            cached_task_fn(
                Gates,
                cache_on=(keep_ref, text_col, id_col, min_chars, max_chars,
                          min_tokens, dl_num, dl_den, tg_num, tg_den, keep_only),
            ),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )

    # ---- scale tier: narrow keyed shuffle, nothing on the driver ----
    from ..functions.hashing import md5_u64_pair
    from ..stages._shuffle import shuffle_parallelism

    # bound per-group pandas work to ~2M narrow rows; coarse buckets
    # keep map_groups from degenerating into per-hash tiny groups
    nb = n_buckets or max(4 * shuffle_parallelism(), n_rows // 2_000_000 + 1)

    def narrow(batch: pa.Table) -> pa.Table:
        ok_len, ok_tok, ok_rep = gate_arrays(batch)
        h1, h2 = md5_u64_pair(batch[text_col])
        bk = (h1 % np.uint64(nb)).astype(np.int64)
        return pa.table(
            {
                "__bk": pa.array(bk, pa.int64()),
                "__h1": pa.array(h1, pa.uint64()),
                "__h2": pa.array(h2, pa.uint64()),
                id_col: batch[id_col],
                "ok_len": pa.array(ok_len),
                "ok_tok": pa.array(ok_tok),
                "ok_rep": pa.array(ok_rep),
            }
        )

    def mark(df) -> pa.Table:
        # keep = min id per 128-bit hash; flags ride along — Arrow out
        # (groupby UDF empty-block typing contract)
        mn = df.groupby(["__h1", "__h2"])[id_col].transform("min")
        t = pa.Table.from_pandas(
            df[[id_col, "ok_len", "ok_tok", "ok_rep"]], preserve_index=False
        )
        return flags_out(
            t[id_col],
            t["ok_len"].to_numpy(zero_copy_only=False),
            t["ok_tok"].to_numpy(zero_copy_only=False),
            t["ok_rep"].to_numpy(zero_copy_only=False),
            (df[id_col] == mn).to_numpy(),
        )

    return (
        ds.map_batches(narrow, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .repartition(shuffle_parallelism())
        .groupby("__bk")
        .map_groups(mark, batch_format="pandas")
    )

"""Exact distributed heavy hitters over an unbounded value domain.

Two bounded passes, no unbounded shuffle:

pass 1 (sketch): per block, distinct-token counts via one vectorized
``np.unique`` over 64-bit token hashes (strings materialized only
for the block-distinct set), folded into a per-block Misra-Gries
sketch of ``capacity`` entries — so each block ships at most
``capacity + 1`` rows regardless of its vocabulary. A single
``groupby(token).sum`` merges the partial counters. Summed MG
counts undercount true frequencies by at most total/(capacity+1)
(the per-instance MG bound, summed over blocks), so with
``capacity = 4 * phi_den`` the candidate rule

    mg_sum > total * (1/phi_den - 1/(capacity+1))

provably keeps every true heavy hitter (count > total/phi_den) and,
by Markov, at most ~(4/3)*phi_den candidates — a bounded broadcast.
The rule is applied DATASET-side (total from the "" rows first, then
an Arrow filter), so the driver holds only the candidates, never the
#blocks×(capacity+1) merged sketch table.

pass 2 (exact recount): candidates are ``ray.put`` once; each block
emits exact counts for candidate tokens only; one tiny groupby-sum
and an integer threshold filter give the EXACT heavy-hitter set —
reproducible in SQL (see __ray_entry__.oracle_sql heavy_hitters_*).

Reference: AMiner's EventTypeDetector keeps exact per-path value-
count dicts (analysis/EventTypeDetector.py); this is the recast for
value domains that do not fit one process at 100 TB.

Tokenization matches DuckDB/RE2 ``regexp_split_to_array(text,
'\\s+')`` on ASCII whitespace (functions/text.token_spans; note \\v
is treated as whitespace here but not by RE2 — fixtures contain no
\\v).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.text import flat_utf8, token_hashes, token_spans
from ..state.sketches import MisraGries

_OUT_SCHEMA = {"token": object, "n": np.int64}


def _block_distinct_tokens(batch: pa.Table, text_col: str):
    """(tokens, counts) distinct within the block — hash-unique
    first, strings decoded only for the distinct set."""
    data, off = flat_utf8(batch[text_col])
    starts, ends, _ = token_spans(data, off)
    if len(starts) == 0:
        return [], np.zeros(0, dtype=np.int64)
    h = token_hashes(data, starts, ends)
    _, first, counts = np.unique(h, return_index=True, return_counts=True)
    toks = [
        data[starts[i] : ends[i]].tobytes().decode("utf-8") for i in first
    ]
    return toks, counts


def heavy_hitter_tokens(
    ds: "ray.data.Dataset",
    text_col: str,
    phi_den: int = 32,
    capacity: int | None = None,
) -> pd.DataFrame:
    """All tokens with exact count > total_tokens / phi_den, as a
    (token, n) frame sorted by (n desc, token asc)."""
    capacity = int(capacity or 4 * phi_den)
    if capacity <= phi_den:
        raise ValueError("capacity must exceed phi_den for a sound candidate rule")

    def p1(batch: pa.Table) -> pa.Table:
        toks, counts = _block_distinct_tokens(batch, text_col)
        mg = MisraGries(capacity).add(toks, counts)
        vs = list(mg.counts.keys())
        cs = [int(c) for c in mg.counts.values()]
        # the "" row carries the block's exact total token count
        # (tokens are non-empty by construction, so "" cannot clash)
        vs.append("")
        cs.append(int(counts.sum()))
        return pa.table({"token": pa.array(vs, pa.string()), "n": pa.array(cs, pa.int64())})

    merged = (
        ds.map_batches(p1, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    # total first (the single "" row of the merged table), then the
    # integer candidate rule as a DATASET-SIDE filter: the driver only
    # ever holds the ~(4/3)*phi_den candidates, never the
    # #blocks×(capacity+1) merged sketch table (ADVICE r2 at 100×
    # block counts). Both jobs run over the materialized merged table,
    # so they skip the read and cost only executor overhead.
    import pyarrow.compute as pc

    def _total_row(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t["token"], ""))
        s = pc.sum(sel["n"]).as_py() or 0
        return pa.table({"t": pa.array([int(s)], pa.int64())})

    total = 0
    for bt in merged.map_batches(
        _total_row, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(bt["t"]).as_py() or 0)
    if total == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _OUT_SCHEMA.items()})

    # mg_sum*(phi_den*(cap+1)) > total*(cap+1-phi_den), in int64
    rhs = total * (capacity + 1 - phi_den)
    mul = phi_den * (capacity + 1)

    def _cand_filter(t: pa.Table) -> pa.Table:
        lhs = pc.multiply_checked(pc.cast(t["n"], pa.int64()), pa.scalar(mul, pa.int64()))
        keep = pc.and_(pc.greater(lhs, pa.scalar(rhs, pa.int64())), pc.not_equal(t["token"], ""))
        return t.filter(keep).select(["token"])

    cand = merged.map_batches(
        _cand_filter, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).to_pandas()["token"]
    if len(cand) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _OUT_SCHEMA.items()})
    cand_ref = ray.put(frozenset(cand))

    def p2(batch: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        toks, counts = _block_distinct_tokens(batch, text_col)
        keep = [(t, int(c)) for t, c in zip(toks, counts) if t in cset]
        return pa.table(
            {
                "token": pa.array([t for t, _ in keep], pa.string()),
                "n": pa.array([c for _, c in keep], pa.int64()),
            }
        )

    exact = (
        ds.map_batches(p2, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if len(exact) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _OUT_SCHEMA.items()})
    exact = exact[exact["n"].to_numpy(np.int64) * phi_den > total]
    out = exact.sort_values(["n", "token"], ascending=[False, True]).reset_index(drop=True)
    return pd.DataFrame({"token": out["token"].astype(object), "n": out["n"].astype(np.int64)})

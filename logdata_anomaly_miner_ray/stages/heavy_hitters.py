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


def _md5_nibble4_salted(tokens: list[str], salt: bytes) -> np.ndarray:
    """First 4 hex nibbles of md5(salt + utf8(token)) per token —
    the DuckDB-reproducible hash family (the strpos-nibble idiom of
    stages/importance, salted per sketch row)."""
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(salt + t.encode("utf-8")).hexdigest()[:4], 16)
         for t in tokens),
        dtype=np.int64, count=len(tokens))


def cms_token_counts(
    ds: "ray.data.Dataset",
    text_col: str,
    query_terms: list[str],
    depth: int = 4,
    width: int = 512,
) -> pd.DataFrame:
    """Count-min sketch over the corpus's whitespace tokens (Cormode
    & Muthukrishnan 2005) + exact recounts for ``query_terms`` —
    returns ``(term, true_cnt, cms_est)`` per query term with the
    one-sided CMS guarantee ``cms_est >= true_cnt`` built from
    md5-nibble row hashes the SQL oracle reproduces bit-exactly
    (bucket_r(t) = first-4-nibbles md5(str(r) + '|' + t) mod width).

    Scale shape: ONE pass; per block, distinct-token counts feed
    ``depth`` bincounts (the block's CMS partial, ≤ depth×width
    nonzero cells regardless of vocabulary) plus exact partial
    counts for the (small, broadcast-by-closure) query list; both
    reductions share ONE groupby on a composite int key (cells:
    r·width+b; terms: depth·width+query_index). The merged table is
    ≤ depth×width + |queries| rows — metadata-scale at any corpus
    size. CMS cells are int64 sums: order-independent, so the sketch
    is bit-identical under any partitioning. The AMiner analogue is
    the bounded-memory counting the EventFrequencyDetector family
    needs when the value domain exceeds one process."""
    qarr = np.array(sorted(set(query_terms)), dtype=object)
    nq = len(qarr)
    base = depth * width

    def part(batch: pa.Table) -> pa.Table:
        toks, cnts = _block_distinct_tokens(batch, text_col)
        keys, vals = [], []
        if len(toks):
            cnts = cnts.astype(np.int64)
            for r in range(depth):
                b = _md5_nibble4_salted(toks, f"{r}|".encode()) % width
                cell = np.bincount(
                    b, weights=cnts, minlength=width).astype(np.int64)
                nz = np.flatnonzero(cell)
                keys.append(r * width + nz)
                vals.append(cell[nz])
            ta = np.array(toks, dtype=object)
            pos = np.searchsorted(qarr, ta)
            ok = (pos < nq)
            ok[ok] = qarr[pos[ok]] == ta[ok]
            if ok.any():
                keys.append(base + pos[ok])
                vals.append(cnts[ok])
        if not keys:
            return pa.table({"k": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({
            "k": pa.array(np.concatenate(keys), pa.int64()),
            "cnt": pa.array(np.concatenate(vals), pa.int64()),
        })

    merged = ds.map_batches(
        part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).groupby("k").aggregate(Sum("cnt", alias_name="cnt")).to_pandas()
    # bounded gather: <= depth*width + |queries| rows total

    mat = np.zeros(base, np.int64)
    truec = np.zeros(nq, np.int64)
    k = merged["k"].to_numpy(np.int64)
    c = merged["cnt"].to_numpy(np.int64)
    cell_rows = k < base
    mat[k[cell_rows]] = c[cell_rows]
    truec[k[~cell_rows] - base] = c[~cell_rows]

    ests = np.empty(nq, np.int64)
    for i, t in enumerate(qarr):
        bs = np.fromiter(
            (int(_md5_nibble4_salted([t], f"{r}|".encode())[0]) % width
             for r in range(depth)), np.int64, count=depth)
        ests[i] = mat[np.arange(depth) * width + bs].min()
    return pd.DataFrame(
        {"term": qarr.astype(str), "true_cnt": truec, "cms_est": ests}
    ).sort_values("term", kind="mergesort").reset_index(drop=True)

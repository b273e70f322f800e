"""Similarity search over an embedding column.

Baseline: brute-force cosine top-k — per block a numpy matmul of the
block's embeddings against a BROADCAST query matrix (``ray.put``
once), emitting each block's local top-k; a distributed
``groupby(query_id)`` merge keeps the global top-k per query (block
partials never collect on the driver — at millions of blocks the
merge shuffles only #blocks×q×k candidate rows hash-partitioned by
query).

Scale path: IVF — coarse centroids TRAINED by k-means over a
deterministic bottom-k-priority sample of the vectors (one streaming
pass), broadcast once; vectors score only against the ``nprobe``
cells nearest the query. ``nprobe = n_centroids`` degrades gracefully
to exact brute force (every cell probed), which is how the oracle
checks the plumbing; recall at pruning nprobe is pytest-checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..state.sketches import splitmix64
from ._taskcache import cached_task_fn


def _as_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix via the flat Arrow
    values buffer (zero-copy, no per-row python lists)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ListArray) or isinstance(col, pa.LargeListArray):
        values = col.values.to_numpy(zero_copy_only=False)
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        d = int(widths[0]) if len(widths) else 0
        assert (widths == d).all(), "ragged embedding column"
        start, end = int(offsets[0]), int(offsets[-1])
        return values[start:end].reshape(-1, d).astype(np.float64)
    raise TypeError(f"not a list column: {col.type}")


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _merge_topk(partials: "ray.data.Dataset", id_col: str, k: int) -> pd.DataFrame:
    """Distributed per-query top-k merge: hash-partition the (small)
    block candidates by query_id, keep each query's best k inside
    ``map_groups``, collect only the q×k result."""

    def best(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["sim", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    out = (
        partials.groupby("query_id")
        .map_groups(best, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
        .reset_index(drop=True)
    )


def cosine_topk(
    ds: "ray.data.Dataset",
    emb_col: str,
    id_col: str,
    queries_ref: "ray.ObjectRef",
    k: int = 10,
) -> pd.DataFrame:
    """Global top-k cosine matches per query.

    ``queries_ref`` is a ray.put (q, d) float array. Per block:
    one matmul + argpartition → ≤ q·k candidate rows; a
    groupby(query_id) merge reduces them without a driver pass."""

    class BlockTopK:
        def __init__(self):
            q = np.asarray(ray.get(queries_ref), dtype=np.float64)
            self.q = _normalize(q)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _normalize(_as_matrix(batch[emb_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            sims = emb @ self.q.T  # (n, q)
            n, nq = sims.shape
            kk = min(k, n)
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, q)
            qi = np.repeat(np.arange(nq, dtype=np.int64)[None, :], kk, axis=0)
            return pa.table(
                {
                    "query_id": pa.array(qi.ravel()),
                    id_col: pa.array(ids[top.ravel()]),
                    "sim": pa.array(sims[top.ravel(), qi.ravel()], pa.float64()),
                }
            )

    partials = ds.map_batches(
        cached_task_fn(BlockTopK, cache_on=(queries_ref, emb_col, id_col, k)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    return _merge_topk(partials, id_col, k)


def sample_vectors(
    ds: "ray.data.Dataset", emb_col: str, id_col: str, n_sample: int = 4096
) -> np.ndarray:
    """Deterministic bottom-k-priority sample of the embedding rows:
    priority = splitmix64(id), per block keep its lowest-priority
    n_sample rows, driver keeps the global lowest n_sample — a
    mergeable uniform-ish sample with no RNG state (the engine's
    reservoir pattern, stages/sampling)."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pri = splitmix64(ids.view(np.uint64))
        kk = min(n_sample, len(ids))
        keep = np.argpartition(pri, kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
        m = _as_matrix(batch[emb_col])[keep]
        return pa.table(
            {
                "pri": pa.array(pri[keep].view(np.int64), pa.int64()),
                "vec": pa.array(list(m.astype(np.float32))),
            }
        )

    cand = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).to_pandas()
    cand = cand.sort_values("pri", kind="mergesort").head(n_sample)
    return np.stack(cand["vec"].to_numpy()).astype(np.float64)


def kmeans_centroids(
    sample: np.ndarray, n_centroids: int, n_iter: int = 10, seed: int = 42
) -> np.ndarray:
    """Plain Lloyd k-means on the (unit-normalized) sample with
    seeded init — deterministic; empty cells re-seed from the
    farthest points."""
    x = _normalize(sample)
    rng = np.random.default_rng(seed)
    n = len(x)
    init = rng.choice(n, size=min(n_centroids, n), replace=False)
    c = x[init].copy()
    for _ in range(n_iter):
        sims = x @ c.T
        assign = np.argmax(sims, axis=1)
        for j in range(len(c)):
            sel = assign == j
            if sel.any():
                c[j] = x[sel].mean(axis=0)
            else:  # re-seed an empty cell from the worst-fit point
                c[j] = x[np.argmin(sims.max(axis=1))]
        c = _normalize(c)
    return c


def ivf_topk(
    ds: "ray.data.Dataset",
    emb_col: str,
    id_col: str,
    queries_ref: "ray.ObjectRef",
    dim: int,
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    seed: int = 42,
    n_sample: int = 4096,
) -> pd.DataFrame:
    """IVF top-k: k-means-trained coarse centroids (one sampling
    pass + driver-side Lloyd on ≤n_sample vectors), broadcast once;
    each block scores only vectors assigned to the query's ``nprobe``
    nearest cells. ``nprobe = n_centroids`` probes every cell — exact
    brute-force equivalence (the oracle path); smaller nprobe trades
    recall for an ~n_centroids/nprobe compute cut — the 10^12-row
    path. Candidates merge via groupby(query_id), never a driver
    concat of all block partials."""
    sample = sample_vectors(ds, emb_col, id_col, n_sample=n_sample)
    centroids = kmeans_centroids(sample, n_centroids, seed=seed)
    cref = ray.put(centroids)

    class BlockIvf:
        def __init__(self):
            self.q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
            self.c = ray.get(cref)
            qc = self.q @ self.c.T
            self.probe = np.argsort(-qc, axis=1)[:, :nprobe]  # (q, nprobe)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _normalize(_as_matrix(batch[emb_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            cell = np.argmax(emb @ self.c.T, axis=1)
            out_q, out_i, out_s = [], [], []
            for qi in range(len(self.q)):
                mask = np.isin(cell, self.probe[qi])
                if not mask.any():
                    continue
                sims = emb[mask] @ self.q[qi]
                sel_ids = ids[mask]
                kk = min(k, len(sims))
                top = np.argpartition(-sims, kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_i.extend(sel_ids[top].tolist())
                out_s.extend(sims[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_i),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partials = ds.map_batches(
        cached_task_fn(BlockIvf, cache_on=(queries_ref, cref, emb_col, id_col, k, nprobe)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    return _merge_topk(partials, id_col, k)


def quantize_int8(m: np.ndarray) -> np.ndarray:
    """Symmetric per-vector int8 FLOOR quantizer: q = floor(x·127/m̂)
    with m̂ = max|x| over the vector (the standard absmax scheme of
    int8 inference, e.g. LLM.int8(), with floor instead of
    round-half-even so the SQL oracle reproduces it verbatim —
    DuckDB round() is half-away, numpy is banker's; floor is floor).
    All-zero vectors quantize to zeros. The float64 expression order
    (x·127)/m̂ matches the oracle's CAST(...)*127/... exactly, so the
    integers are bit-identical across engines."""
    mx = np.abs(m).max(axis=1) if len(m) else np.zeros(0)
    safe = np.where(mx == 0, 1.0, mx)
    q = np.floor(m * 127.0 / safe[:, None])
    q[mx == 0] = 0.0
    return q.astype(np.int64)


def quantized_topk(
    ds: "ray.data.Dataset",
    emb_col: str,
    id_col: str,
    queries_ref: "ray.ObjectRef",
    k: int = 10,
) -> pd.DataFrame:
    """Global top-k per query by EXACT int8-quantized dot product —
    the integer-arithmetic retrieval tier (quantize once, integer
    matmuls thereafter; 4× less vector traffic than float32 and
    bit-reproducible at any partitioning, since int64 sums are
    order-independent). Same distributed shape as ``cosine_topk``:
    broadcast queries, per-block candidates, groupby(query_id) merge.

    Integer dots tie often — per-block selection is a (dot DESC, id
    ASC) lexsort per query, NOT argpartition, so the block partial
    keeps exactly the rows the deterministic global order needs."""

    class BlockQTopK:
        def __init__(self):
            qm = np.asarray(ray.get(queries_ref), dtype=np.float64)
            self.q = quantize_int8(qm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = quantize_int8(_as_matrix(batch[emb_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            sims = emb @ self.q.T  # (n, q) int64 — exact
            n, nq = sims.shape
            kk = min(k, n)
            out_q, out_i, out_s = [], [], []
            for qi in range(nq):
                order = np.lexsort((ids, -sims[:, qi]))[:kk]
                out_q.extend([qi] * kk)
                out_i.extend(ids[order].tolist())
                out_s.extend(sims[order, qi].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_i, pa.int64()),
                    "sim": pa.array(out_s, pa.int64()),
                }
            )

    partials = ds.map_batches(
        cached_task_fn(BlockQTopK, cache_on=(queries_ref, emb_col, id_col, k, "q8")),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    return _merge_topk(partials, id_col, k)

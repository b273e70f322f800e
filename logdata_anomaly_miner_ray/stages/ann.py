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


def knn_graph(
    ds: "ray.data.Dataset",
    emb_col: str,
    id_col: str,
    k: int = 5,
    max_broadcast_bytes: int = 200_000_000,
    n_centroids: int | None = None,
    nprobe: int = 4,
    seed: int = 42,
    chunk_cols: int = 65536,
) -> "ray.data.Dataset":
    """k-nearest-neighbor GRAPH over the corpus itself (every vector
    is both query and candidate) by EXACT int8-quantized integer dot
    products — the neighborhood structure semantic-dedup, curriculum
    and diversity-sampling pipelines build first. Self-pairs are
    excluded; ties are deterministic (dot DESC, neighbor id ASC) via
    a composite integer key, so results are bit-identical at any
    partitioning. Returns (vec_id, neighbor_id, dot_q, rnk).

    Tiers:

    - exact (n·d ≤ ``max_broadcast_bytes``): the quantized corpus
      (int8) broadcasts once via ``ray.put``; each block computes
      integer dots against it in COLUMN CHUNKS of ``chunk_cols``
      vectors (the kmeans row-chunk lesson: an unchunked B×n int64
      intermediate is DRAM-bound), folding a running per-row top-k
      between chunks with one vectorized argpartition — no per-row
      Python loop. One shuffle-free pass. O(n²d) total work — this
      is the verification tier, not the 10^12-row path.
    - IVF scale tier (``n_centroids`` set): k-means centroids over a
      deterministic sample (one pass, driver Lloyd) broadcast once;
      each vector ships to its 1 nearest cell as MEMBER and its
      ``nprobe`` nearest cells as PROBE — ONE narrow shuffle of
      (bucket, id, int8 vec) rows, exact integer kNN inside each
      bucket, then a coarse per-id merge of the ≤ nprobe×k
      candidates. A member lives in exactly one bucket, so candidate
      lists never contain duplicate neighbors. Approximate (recall
      pytest-checked); ``nprobe = n_centroids`` probes every cell —
      exact-equivalent.

    Envelope: composite key packs (dot + d·127² + 1) << 40 | (2^40-1
    - id); asserts d·127² < 2^22 and id < 2^40 (the bm25
    envelope-assert convention)."""
    import pyarrow.compute as pc  # noqa: F401  (parity with siblings)

    def _key_parts(d_dim: int):
        off = d_dim * 127 * 127 + 1
        assert off < (1 << 22), "knn_graph dot envelope: d*127^2 >= 2^22"
        return off, (1 << 40) - 1

    def _fold_topk(run_key, run_id, run_dot, cand_key, cand_id, cand_dot, kk):
        """Merge running (B,k) top-k with new (B,c) candidates —
        one vectorized argpartition over the concatenation."""
        key = np.concatenate([run_key, cand_key], axis=1)
        idm = np.concatenate([run_id, cand_id], axis=1)
        dot = np.concatenate([run_dot, cand_dot], axis=1)
        if key.shape[1] > kk:
            sel = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
        else:
            sel = np.argsort(-key, axis=1)
        rows = np.arange(key.shape[0])[:, None]
        return key[rows, sel], idm[rows, sel], dot[rows, sel]

    if n_centroids is None:
        # ---- exact broadcast tier ----
        narrow = ds.map_batches(
            lambda t: pa.table({
                "id": pa.array(
                    t[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64()),
                "q": pa.array(list(
                    quantize_int8(_as_matrix(t[emb_col])).astype(np.int8))),
            }),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ).materialize()
        ids_l, vec_l = [], []
        for b in narrow.iter_batches(batch_format="pyarrow", batch_size=None):
            ids_l.append(b["id"].to_numpy(zero_copy_only=False))
            vec_l.append(np.stack(b["q"].to_numpy(zero_copy_only=False)))
        all_ids = np.concatenate(ids_l) if ids_l else np.zeros(0, np.int64)
        allm = (np.concatenate(vec_l) if vec_l
                else np.zeros((0, 1), np.int8))
        order = np.argsort(all_ids, kind="mergesort")
        all_ids, allm = all_ids[order], allm[order]
        assert allm.nbytes <= max_broadcast_bytes, (
            "knn_graph exact tier over budget — set n_centroids for the "
            "IVF scale tier")
        assert len(all_ids) == 0 or int(all_ids.max()) < (1 << 40)
        corpus_ref = ray.put((all_ids, allm))

        class BlockKnn:
            def __init__(self):
                self.ids, self.m = ray.get(corpus_ref)
                self.off, self.idmask = _key_parts(self.m.shape[1])

            def __call__(self, batch: pa.Table) -> pa.Table:
                q = quantize_int8(_as_matrix(batch[emb_col]))
                rid = batch[id_col].to_numpy(
                    zero_copy_only=False).astype(np.int64)
                B = len(rid)
                kk = min(k, max(len(self.ids) - 1, 0))
                if B == 0 or kk == 0:
                    return pa.table({
                        "vec_id": pa.array([], pa.int64()),
                        "neighbor_id": pa.array([], pa.int64()),
                        "dot_q": pa.array([], pa.int64()),
                        "rnk": pa.array([], pa.int64())})
                NEG = np.int64(-(1 << 62))
                rk = np.full((B, kk), NEG, np.int64)
                ri = np.zeros((B, kk), np.int64)
                rd_ = np.zeros((B, kk), np.int64)
                qf = q.astype(np.float64)
                # cap the dots intermediate at ~4M cells (the kmeans
                # chunked-kernel lesson): chunk corpus COLUMNS by
                # `chunk_cols` and query ROWS so B_chunk × C stays
                # cache-sized, never GBs
                C = min(chunk_cols, max(len(self.ids), 1))
                rstep = max(1, 4_000_000 // C)
                for lo in range(0, len(self.ids), chunk_cols):
                    cm = self.m[lo:lo + chunk_cols].astype(np.float64)
                    cids = self.ids[lo:lo + chunk_cols]
                    for rlo in range(0, B, rstep):
                        rsl = slice(rlo, rlo + rstep)
                        # float64 BLAS matmul of int8-valued matrices
                        # is EXACT (every product <= 127^2, every sum
                        # <= d*127^2 << 2^53 — all integers, no
                        # rounding; the cast back is therefore exact
                        # too, no rint pass needed) and ~50x numpy's
                        # int64 matmul
                        dots = (qf[rsl] @ cm.T).astype(np.int64)
                        ckey = ((dots + self.off) << 40) | (
                            self.idmask - cids)
                        ckey[rid[rsl][:, None] == cids[None, :]] = NEG
                        rk[rsl], ri[rsl], rd_[rsl] = _fold_topk(
                            rk[rsl], ri[rsl], rd_[rsl], ckey,
                            np.broadcast_to(cids, dots.shape), dots, kk)
                # final exact order per row
                ordr = np.argsort(-rk, axis=1, kind="stable")
                rows = np.arange(B)[:, None]
                rk, ri, rd_ = rk[rows, ordr], ri[rows, ordr], rd_[rows, ordr]
                valid = rk > NEG
                nn = valid.sum(axis=1)
                vout = np.repeat(rid, nn)
                rnk = np.concatenate(
                    [np.arange(1, x + 1) for x in nn]) if B else np.zeros(0)
                return pa.table({
                    "vec_id": pa.array(vout, pa.int64()),
                    "neighbor_id": pa.array(ri[valid], pa.int64()),
                    "dot_q": pa.array(rd_[valid], pa.int64()),
                    "rnk": pa.array(rnk.astype(np.int64), pa.int64()),
                })

        return ds.map_batches(
            cached_task_fn(BlockKnn,
                           cache_on=(corpus_ref, emb_col, id_col, k, "knng")),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )

    # ---- IVF scale tier ----
    from ._agg import coarse_grouped

    sample = sample_vectors(ds, emb_col, id_col)
    centroids = kmeans_centroids(sample, n_centroids, seed=seed)
    cref = ray.put(centroids)

    class Route:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = _normalize(_as_matrix(batch[emb_col]))
            qm = quantize_int8(_as_matrix(batch[emb_col])).astype(np.int8)
            ids = batch[id_col].to_numpy(
                zero_copy_only=False).astype(np.int64)
            nc_all = self.c.shape[0]
            npb = min(nprobe, nc_all)
            # row-chunked probe selection: argpartition to npb then a
            # tiny per-row sort of the npb winners — a full argsort
            # over n_centroids per row (and an unchunked n×nc sims
            # matrix) dominated the 5M drill
            probes = np.empty((len(x), npb), dtype=np.int64)
            rstep = max(1, 4_000_000 // max(nc_all, 1))
            for lo in range(0, len(x), rstep):
                sims = x[lo:lo + rstep] @ self.c.T
                if nc_all > npb:
                    cand = np.argpartition(-sims, npb - 1, axis=1)[:, :npb]
                else:
                    cand = np.broadcast_to(
                        np.arange(nc_all), (len(sims), nc_all)).copy()
                rows = np.arange(len(sims))[:, None]
                # order the npb winners best-first; ties by centroid
                # id via stable sort (deterministic)
                order = np.argsort(-sims[rows, cand], axis=1,
                                   kind="stable")
                probes[lo:lo + rstep] = np.take_along_axis(
                    cand, order, axis=1)
            d_dim = qm.shape[1]
            bkt, pid, pvec, role = [], [], [], []
            member = probes[:, 0]
            bkt.append(member)
            pid.append(ids)
            pvec.append(qm)
            role.append(np.zeros(len(ids), np.bool_))
            for j in range(npb):
                bkt.append(probes[:, j])
                pid.append(ids)
                pvec.append(qm)
                role.append(np.ones(len(ids), np.bool_))
            allv = np.ascontiguousarray(np.concatenate(pvec))
            # vectors ride as FIXED-SIZE binary (one buffer, zero
            # per-row objects) — list<int8> cost per-row stacking in
            # every bucket kernel
            vec_col = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(d_dim), len(allv),
                [None, pa.py_buffer(allv.tobytes())])
            return pa.table({
                "bucket": pa.array(np.concatenate(bkt).astype(np.int64),
                                   pa.int64()),
                "id": pa.array(np.concatenate(pid), pa.int64()),
                "vec": vec_col,
                "is_probe": pa.array(np.concatenate(role)),
            })

    routed = ds.map_batches(
        cached_task_fn(Route, cache_on=(cref, emb_col, id_col, nprobe,
                                        "knng_route")),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )

    def per_bucket(g: "pd.DataFrame") -> pa.Table:
        mem = g[~g["is_probe"]]
        prb = g[g["is_probe"]]
        if not len(mem) or not len(prb):
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "dot_q": pa.array([], pa.int64())})
        def _mat(col):
            # fixed-size binary -> one frombuffer, no per-row objects
            buf = b"".join(col.to_numpy())
            return np.frombuffer(buf, dtype=np.int8).reshape(
                len(col), -1).astype(np.float64)

        M = _mat(mem["vec"])
        mids = mem["id"].to_numpy(np.int64)
        P = _mat(prb["vec"])
        pids = prb["id"].to_numpy(np.int64)
        off, idmask = _key_parts(M.shape[1])
        NEG = np.int64(-(1 << 62))
        kk = min(k, M.shape[0])
        out_v, out_n, out_d = [], [], []
        inv_ids = idmask - mids  # one per-bucket temp, reused per chunk
        # probe-ROW chunking (the kmeans chunked-kernel lesson): an
        # unchunked |probes|×|members| dots matrix is GBs per bucket
        # at drill scale and thrashes the whole node
        step = max(1, 4_000_000 // max(M.shape[0], 1))
        for lo in range(0, len(pids), step):
            pch, ich = P[lo:lo + step], pids[lo:lo + step]
            # float64 BLAS over int8-valued matrices — exact (every
            # product ≤ 127², every sum ≤ d·127² ≪ 2^53: all integer,
            # so the cast back is exact — no rint pass), key built
            # IN-PLACE (each extra full-matrix temp is a measured
            # ~25% of the kernel at drill scale)
            dots = pch @ M.T
            key = dots.astype(np.int64)
            key += off
            key <<= 40
            key |= inv_ids
            key[ich[:, None] == mids[None, :]] = NEG
            dots = (key >> 40) - off  # recover exact dots, no 2nd cast
            sel = (np.argpartition(-key, kk - 1, axis=1)[:, :kk]
                   if key.shape[1] > kk else
                   np.broadcast_to(np.arange(kk), (len(ich), kk)))
            rows = np.arange(len(ich))[:, None]
            valid = key[rows, sel] > NEG
            out_v.append(np.repeat(ich, valid.sum(axis=1)))
            out_n.append(np.broadcast_to(
                mids, dots.shape)[rows, sel][valid])
            out_d.append(dots[rows, sel][valid])
        return pa.table({
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "dot_q": pa.array(np.concatenate(out_d), pa.int64()),
        })

    cands = routed.groupby("bucket").map_groups(
        per_bucket, batch_format="pandas")

    def merge(g: "pd.DataFrame") -> pa.Table:
        g = g.drop_duplicates(["vec_id", "neighbor_id"])
        g = g.sort_values(["vec_id", "dot_q", "neighbor_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("vec_id", sort=False).head(k).copy()
        g["rnk"] = g.groupby("vec_id", sort=False).cumcount() + 1
        return pa.table({
            "vec_id": pa.array(g["vec_id"].to_numpy(np.int64), pa.int64()),
            "neighbor_id": pa.array(g["neighbor_id"].to_numpy(np.int64),
                                    pa.int64()),
            "dot_q": pa.array(g["dot_q"].to_numpy(np.int64), pa.int64()),
            "rnk": pa.array(g["rnk"].to_numpy(np.int64), pa.int64()),
        })

    return coarse_grouped(cands, ["vec_id"], merge)

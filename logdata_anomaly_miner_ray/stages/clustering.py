"""Distributed Lloyd's k-means over an embedding column.

Corpus-level clustering is a first-class curation operator for LLM
training data — cluster-then-filter / cluster-balanced sampling
(SemDeDup, Abbas et al. 2023; DoReMi-style domain discovery) all
start from a k-means assignment over document embeddings.

Scale shape — each Lloyd iteration is ONE shuffle-free streaming
pass, never an all-to-all:

- centroids live on the driver (k × d float64, tiny) and broadcast
  per iteration via ``ray.put``;
- every block emits per-cluster partial sums ``(cluster, count,
  sum-vector)`` — at most k rows per block regardless of block size —
  and the driver folds them (bounded by k × n_blocks, the same
  driver-fold contract as the suite's meta reduction; at k or
  partition counts where that bound matters, fold via a dataset
  ``groupby(cluster)`` instead — the partials are already mergeable);
- the final pass emits ``(id, cluster)`` assignments, streaming.

Determinism: init = the k vectors with smallest id (selected via
bounded per-block min-k partials, no global sort); squared-L2
assignment with ties broken toward the lower cluster id; an empty
cluster keeps its previous centroid. Everything is reproducible from
the input alone, which is what makes the DuckDB oracle possible.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

import ray

from ._taskcache import cached_task_fn

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _as_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero-copy flat read)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _assign(emb: np.ndarray, cent: np.ndarray, chunk: int = 1024) -> np.ndarray:
    """argmin_c ||x - c||²; first (lowest id) centroid wins ties.

    Row-chunked so the (rows × k) distance matrix stays cache-sized —
    at k=2500 a 50k-row block otherwise materializes a 1 GB
    intermediate and the pass goes DRAM-bound (measured 3-4× slower).
    In-place ``(x @ cᵀ)·(−2) + |c|²`` is bit-identical to the
    ``−2·(x @ cᵀ) + |c|²`` the SQL oracle spells out (IEEE
    multiplication is commutative; addition order unchanged), so
    assignments are unaffected at any chunk size."""
    cc = (cent * cent).sum(axis=1)
    out = np.empty(len(emb), np.int64)
    for i in range(0, len(emb), chunk):
        d2 = emb[i:i + chunk] @ cent.T
        d2 *= -2.0
        d2 += cc[None, :]
        out[i:i + chunk] = np.argmin(d2, axis=1)
    return out


def kmeans_assign(
    ds: "ray.data.Dataset",
    emb_col: str,
    id_col: str,
    k: int = 8,
    n_iter: int = 2,
) -> tuple["ray.data.Dataset", np.ndarray]:
    """Lloyd's k-means: returns ``(assignments, centroids)`` where
    assignments is a Dataset of ``(id_col, cluster)`` and centroids
    the final (k, d) float64 array. See module docstring for the
    execution shape and determinism rules."""

    def min_k(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return pa.table(
            {id_col: pa.array(ids[take].astype(np.int64), pa.int64()),
             emb_col: batch[emb_col].take(pa.array(take, pa.int64()))}
        )

    # Arrow fold (≤ k rows per block): zero-copy flat reads, no
    # per-row Python dicts (take_all at k×n_blocks rows was the
    # measured small-input overhead)
    c_ids, c_emb = [], []
    for b in ds.map_batches(
        min_k, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        c_ids.append(b[id_col].to_numpy(zero_copy_only=False))
        c_emb.append(_as_matrix(b[emb_col]))
    if not c_ids or not sum(len(x) for x in c_ids):
        raise ValueError("kmeans_assign: empty input")
    ids_all = np.concatenate(c_ids)
    emb_all = np.vstack([m for m in c_emb if len(m)])
    take = np.argsort(ids_all, kind="stable")[:k]
    cent = emb_all[take].astype(np.float64)
    kk, d = len(cent), cent.shape[1]

    class Partials:
        def __init__(self, cref, emb_col):
            self.c = ray.get(cref)
            self.emb_col = emb_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _as_matrix(batch[self.emb_col])
            a = _assign(emb, self.c)
            cnt = np.bincount(a, minlength=len(self.c))
            sums = np.zeros_like(self.c)
            np.add.at(sums, a, emb)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(self.c)), pa.int64()),
                    "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                    "s": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

    for _ in range(n_iter):
        cref = ray.put(cent)
        cnt = np.zeros(kk, np.int64)
        sums = np.zeros((kk, d), np.float64)
        for b in ds.map_batches(
            cached_task_fn(Partials, cache_on=(cref, emb_col),
                           cref=cref, emb_col=emb_col),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow"):
            # ≤ k rows per block; iter_batches may coalesce blocks →
            # repeated cluster ids: np.add.at, never fancy-index +=
            cl = b["cluster"].to_numpy(zero_copy_only=False)
            np.add.at(cnt, cl, b["cnt"].to_numpy(zero_copy_only=False))
            np.add.at(sums, cl, _as_matrix(b["s"]))
        nz = cnt > 0
        cent = cent.copy()
        cent[nz] = sums[nz] / cnt[nz, None]  # empty cluster keeps its centroid

    cref = ray.put(cent)

    class Emit:
        def __init__(self, cref, emb_col, id_col):
            self.c = ray.get(cref)
            self.emb_col, self.id_col = emb_col, id_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _as_matrix(batch[self.emb_col])
            a = _assign(emb, self.c)
            return pa.table(
                {
                    self.id_col: batch[self.id_col].cast(pa.int64()),
                    "cluster": pa.array(a.astype(np.int64), pa.int64()),
                }
            )

    out = ds.map_batches(
        cached_task_fn(Emit, cache_on=(cref, emb_col, id_col),
                       cref=cref, emb_col=emb_col, id_col=id_col),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    return out, cent


def semdedup(
    ds: "ray.data.Dataset",
    emb_col: str,
    id_col: str,
    k: int = 10,
    n_iter: int = 2,
    cosine_threshold: float = 0.45,
    hard_cap: int = 100_000,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic dedup (Abbas et al. 2023): k-means the
    embeddings, then WITHIN each cluster drop every vector whose
    cosine similarity to any LOWER-id vector in the cluster reaches
    ``cosine_threshold`` (a deterministic, non-recursive keep rule —
    dominated-by-any-earlier — in place of the paper's random
    exemplar choice, so the result is reproducible and
    SQL-checkable). Returns ``(id_col, cluster, keep)`` with keep as
    int64 0/1.

    Scale shape: the k-means passes are shuffle-free (see
    ``kmeans_assign``); the only shuffle co-locates each cluster's
    embedding rows for the in-cluster pairwise pass. Within-cluster
    work is O(m²) on cluster size m — SemDeDup's own design point:
    k is chosen ∝ corpus size so clusters stay worker-sized (the
    paper uses 50k clusters for LAION-440M). Cluster-id groups are
    exactly k, so the groupby fan-in is bounded by construction.
    ``hard_cap`` guards the quadratic: a degenerate embedding
    distribution (one giant cluster) aborts with instructions to
    raise k rather than silently blowing one map_groups task (the
    editdist hard_cap contract).
    """
    _, cent = kmeans_assign(ds, emb_col, id_col, k=k, n_iter=n_iter)
    cref = ray.put(cent)

    class Tag:
        def __init__(self, cref, emb_col, id_col):
            self.c = ray.get(cref)
            self.emb_col, self.id_col = emb_col, id_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _as_matrix(batch[self.emb_col])
            a = _assign(emb, self.c)
            return pa.table(
                {
                    self.id_col: batch[self.id_col].cast(pa.int64()),
                    "cluster": pa.array(a.astype(np.int64), pa.int64()),
                    self.emb_col: batch[self.emb_col],
                }
            )

    tagged = ds.map_batches(
        cached_task_fn(Tag, cache_on=(cref, emb_col, id_col, "semdedup"),
                       cref=cref, emb_col=emb_col, id_col=id_col),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )

    def prune(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n > hard_cap:
            raise ValueError(
                f"semdedup: cluster {g['cluster'][0].as_py()} has "
                f"{n} members > hard_cap={hard_cap}; the in-cluster "
                f"pass is O(m²) — raise k so clusters stay worker-sized "
                f"(SemDeDup uses k ∝ corpus size), or raise hard_cap "
                f"deliberately"
            )
        # Arrow in → zero-copy flat read of the list column (the
        # pandas path converted 1 Python list per row — the measured
        # bottleneck at 5M rows)
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        emb = _as_matrix(g[emb_col])[order]
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        e = emb / norms[:, None]
        sims = e @ e.T
        dominated = np.triu(sims >= cosine_threshold, 1).any(axis=0)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(
                    np.full(len(ids), g["cluster"][0].as_py(), np.int64),
                    pa.int64()),
                "keep": pa.array((~dominated).astype(np.int64), pa.int64()),
            }
        )

    return tagged.groupby("cluster").map_groups(prune, batch_format="pyarrow")

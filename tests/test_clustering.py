"""kmeans_assign vs a single-process numpy replay.

The replay recomputes init (k smallest ids), squared-L2 argmin with
low-id tie-break, mean updates with empty-cluster carry — any drift
in the distributed partial-sum fold or the broadcast handoff shows as
assignment mismatches."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.stages.clustering import kmeans_assign


def _replay(ids, emb, k, n_iter):
    order = np.argsort(ids)
    cent = emb[order[:k]].astype(np.float64).copy()
    for _ in range(n_iter):
        d2 = -2.0 * emb @ cent.T + (cent * cent).sum(axis=1)[None, :]
        a = np.argmin(d2, axis=1)
        new = cent.copy()
        for j in range(k):
            sel = a == j
            if sel.any():
                new[j] = emb[sel].mean(axis=0)
        cent = new
    d2 = -2.0 * emb @ cent.T + (cent * cent).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1), cent


def _make(n, d, k_true, seed):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k_true, d)) * 4
    lab = rng.integers(0, k_true, size=n)
    emb = centers[lab] + rng.normal(size=(n, d))
    ids = rng.permutation(n).astype(np.int64)
    return ids, emb


def _run(ids, emb, k, n_iter, nparts=5):
    ds = rd.from_arrow(
        pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "embedding": pa.array(list(emb.astype(np.float64)),
                                   pa.list_(pa.float64()))}
        )
    ).repartition(nparts)
    out, cent = kmeans_assign(ds, "embedding", "vec_id", k=k, n_iter=n_iter)
    df = out.to_pandas().sort_values("vec_id")
    return df["vec_id"].to_numpy(), df["cluster"].to_numpy(), cent


def test_kmeans_matches_replay():
    ids, emb = _make(300, 8, 4, seed=3)
    got_ids, got_a, got_c = _run(ids, emb, k=4, n_iter=3)
    srt = np.argsort(ids)
    want_a, want_c = _replay(ids, emb, 4, 3)
    assert (got_ids == ids[srt]).all()
    assert (got_a == want_a[srt]).all()
    np.testing.assert_allclose(got_c, want_c, rtol=1e-12)


def test_kmeans_partition_invariant_and_separated_clusters():
    ids, emb = _make(200, 6, 3, seed=9)
    _, a1, _ = _run(ids, emb, k=3, n_iter=2, nparts=1)
    _, a8, _ = _run(ids, emb, k=3, n_iter=2, nparts=8)
    assert (a1 == a8).all()
    # well-separated data: clusters recover the generating labels
    rng = np.random.default_rng(9)
    centers = rng.normal(size=(3, 6)) * 4
    lab = rng.integers(0, 3, size=200)
    srt = np.argsort(ids)
    for c in range(3):
        sel = a1 == c
        if sel.any():
            assert (lab[srt][sel] == np.bincount(
                lab[srt][sel]).argmax()).mean() > 0.9


def _semdedup_replay(ids, emb, k, n_iter, tau):
    a, cent = _replay(ids, emb, k, n_iter)
    srt = np.argsort(ids)
    ids_s, emb_s, a_s = ids[srt], emb[srt], a[srt]
    norms = np.linalg.norm(emb_s, axis=1)
    norms[norms == 0] = 1.0
    e = emb_s / norms[:, None]
    keep = {}
    for c in range(k):
        sel = np.flatnonzero(a_s == c)
        sims = e[sel] @ e[sel].T
        dom = np.triu(sims >= tau, 1).any(axis=0)
        for i, d in zip(sel, dom):
            keep[int(ids_s[i])] = (int(a_s[i]), 0 if d else 1)
    return keep


def test_semdedup_matches_replay_and_drops_planted_dups():
    from logdata_anomaly_miner_ray.stages.clustering import semdedup

    ids, emb = _make(150, 8, 3, seed=5)
    # plant near-duplicates of three existing rows (higher ids lose);
    # tau=0.99999 so only the planted copies are dominated (natural
    # cluster-mates of this gaussian fixture reach ~0.992)
    emb = np.vstack([emb, emb[:3] + 1e-6])
    ids = np.concatenate([ids, [1000, 1001, 1002]])
    want = _semdedup_replay(ids, emb, 3, 2, 0.99999)
    ds = rd.from_arrow(
        pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "embedding": pa.array(list(emb.astype(np.float64)),
                                   pa.list_(pa.float64()))}
        )
    ).repartition(4)
    out = semdedup(ds, "embedding", "vec_id", k=3, n_iter=2,
                   cosine_threshold=0.99999)
    got = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            got[r["vec_id"]] = (r["cluster"], r["keep"])
    assert got == want
    for pid in (1000, 1001, 1002):  # planted copies are dominated
        assert got[pid][1] == 0
    assert sum(v[1] for v in got.values()) == len(got) - 3


def test_kmeans_empty_cluster_keeps_centroid():
    # k=3 over 2 tight far-apart blobs: one init centroid goes empty
    emb = np.vstack([np.zeros((5, 2)), np.full((5, 2), 100.0)])
    emb += np.arange(10)[:, None] * 1e-3
    ids = np.arange(10, dtype=np.int64)
    _, a, cent = _run(ids, emb, k=3, n_iter=2, nparts=2)
    want_a, want_c = _replay(ids, emb, 3, 2)
    assert (a == want_a).all()
    np.testing.assert_allclose(cent, want_c, rtol=1e-12)


def test_semdedup_hard_cap_aborts_on_degenerate_cluster():
    """One giant cluster (identical embeddings) must ABORT with the
    raise-k instruction instead of running an O(m²) pass on a single
    worker; a generous cap still succeeds on the same input."""
    import pytest

    from logdata_anomaly_miner_ray.stages.clustering import semdedup

    n = 40
    ids = np.arange(n, dtype=np.int64)
    emb = np.ones((n, 4), dtype=np.float64)  # all rows identical
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(emb), pa.list_(pa.float64()))})
    ).repartition(3)
    with pytest.raises(Exception, match="hard_cap"):
        semdedup(ds, "embedding", "vec_id", k=2, n_iter=1,
                 hard_cap=10).materialize()
    out = semdedup(ds, "embedding", "vec_id", k=2, n_iter=1,
                   hard_cap=1000).to_pandas()
    assert len(out) == n and int(out["keep"].sum()) == 1

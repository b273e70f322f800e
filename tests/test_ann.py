"""knn_graph: exact int8 kNN graph (both tiers) vs brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

def _knn_brute(emb, k=5):
    from logdata_anomaly_miner_ray.stages.ann import quantize_int8

    q = quantize_int8(emb)
    dots = q @ q.T
    n = len(emb)
    rows = []
    for i in range(n):
        order = sorted((-dots[i, j], j) for j in range(n) if j != i)
        for r, (negd, j) in enumerate(order[:k]):
            rows.append((i, j, -negd, r + 1))
    return pd.DataFrame(
        rows, columns=["vec_id", "neighbor_id", "dot_q", "rnk"])


def _emb_ds(emb, nblocks=4):
    ids = np.arange(len(emb), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(emb.astype(np.float32)))})
    return rd.from_arrow(t).repartition(nblocks)


def test_knn_graph_exact_matches_brute_force():
    from logdata_anomaly_miner_ray.stages.ann import knn_graph

    rng = np.random.RandomState(5)
    emb = rng.randn(90, 8).astype(np.float32).astype(np.float64)
    exp = _knn_brute(emb, k=4)
    got = (knn_graph(_emb_ds(emb), "embedding", "vec_id", k=4)
           .to_pandas().sort_values(["vec_id", "rnk"], ignore_index=True))
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))


def test_knn_graph_exact_chunked_kernel_invariant():
    """Column-chunked running top-k fold == single-chunk result."""
    from logdata_anomaly_miner_ray.stages.ann import knn_graph

    rng = np.random.RandomState(6)
    emb = rng.randn(70, 8).astype(np.float32).astype(np.float64)
    a = (knn_graph(_emb_ds(emb, 1), "embedding", "vec_id", k=3,
                   chunk_cols=7)
         .to_pandas().sort_values(["vec_id", "rnk"], ignore_index=True))
    b = (knn_graph(_emb_ds(emb, 5), "embedding", "vec_id", k=3,
                   chunk_cols=10**6)
         .to_pandas().sort_values(["vec_id", "rnk"], ignore_index=True))
    pd.testing.assert_frame_equal(a, b)


def test_knn_graph_ivf_full_probe_is_exact():
    from logdata_anomaly_miner_ray.stages.ann import knn_graph

    rng = np.random.RandomState(7)
    emb = rng.randn(80, 8).astype(np.float32).astype(np.float64)
    exp = _knn_brute(emb, k=5)
    got = (knn_graph(_emb_ds(emb), "embedding", "vec_id", k=5,
                     n_centroids=6, nprobe=6)
           .to_pandas().sort_values(["vec_id", "rnk"], ignore_index=True))
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))


def test_knn_graph_ivf_pruned_recall():
    from logdata_anomaly_miner_ray.stages.ann import knn_graph

    rng = np.random.RandomState(8)
    # clustered data: IVF should achieve high recall at nprobe 2
    centers = rng.randn(5, 8) * 6
    emb = np.concatenate(
        [centers[i % 5] + rng.randn(8) * 0.3 for i in range(100)]
    ).reshape(100, 8).astype(np.float32).astype(np.float64)
    exp = _knn_brute(emb, k=5)
    got = knn_graph(_emb_ds(emb), "embedding", "vec_id", k=5,
                    n_centroids=5, nprobe=2).to_pandas()
    hit = got.merge(exp, on=["vec_id", "neighbor_id"], how="inner")
    assert len(hit) / len(exp) > 0.9

"""Reproducible corpus-hygiene / curation drills over a large pages
table (the BASELINE.md round-4 hygiene-at-scale numbers).

    python scripts/drill.py gen --rows 50000000 --pages /tmp/graft_pages_50M
    python scripts/hygiene_drill.py decontam --pages /tmp/graft_pages_50M
    python scripts/hygiene_drill.py dupspan  --pages /tmp/graft_pages_50M --files 100
    python scripts/hygiene_drill.py pack     --pages /tmp/graft_pages_50M

Each subcommand prints one JSON line with rows / sec / docs_per_sec /
driver peak RSS. `--files N` limits the input to the first N parquet
files (dup-span's gram shuffle spills ~2.5 GB per 1M rows — size to
the sandbox disk).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import resource
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init():
    import logging

    import ray
    import ray.data  # noqa: F401

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _result(name: str, rows: int, t0: float, **extra) -> int:
    dt = time.time() - t0
    out = {name: {"rows": rows, "sec": round(dt, 1),
                  "docs_per_sec": round(rows / dt),
                  "driver_peak_rss_gb": round(
                      resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6,
                      2),
                  **extra}}
    print(json.dumps(out))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=[
        "decontam", "dupspan", "pack", "extract", "tfidf", "pagerank",
        "paradedup", "winnow", "snapdiff", "frontier",
        "kmeans", "semdedup", "ivf", "knng", "hits"])
    ap.add_argument("--pages", required=True)
    ap.add_argument("--files", type=int, default=0,
                    help="limit to the first N parquet files (0 = all)")
    ap.add_argument("--eval-mod", type=int, default=9973,
                    help="decontam: every Nth row is the eval side")
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--scale-tier", action="store_true",
                    help="pagerank: force the dataset-ranks tier")
    ap.add_argument("--broadcast-limit", type=int, default=5_000_000,
                    help="paradedup: pass-B broadcast/shuffle tier cutover "
                         "(drop positions; ~16 B each when broadcast)")
    ap.add_argument("--dim", type=int, default=16,
                    help="embedding drills: vector dimension")
    ap.add_argument("--kmeans-k", type=int, default=64,
                    help="kmeans drill: cluster count")
    args = ap.parse_args(argv)

    _init()
    import ray
    import ray.data as rd

    files = sorted(glob.glob(f"{args.pages}/*.parquet"))
    if args.files:
        files = files[: args.files]
    if not files:
        ap.error(f"no parquet files under {args.pages}")

    def read():
        return rd.read_parquet(files, columns=["row_idx", "text"])

    if args.mode == "decontam":
        from logdata_anomaly_miner_ray.stages.decontam import decontaminate

        mod = args.eval_mod

        def evalside(t: pa.Table) -> pa.Table:
            r = t["row_idx"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(r % mod == 0))

        eval_ds = read().map_batches(
            evalside, batch_format="pyarrow", batch_size=None)
        t0 = time.time()
        hits = decontaminate(read(), eval_ds, "text", "row_idx", k=8).count()
        rows = len(files) * 50_000
        rc = _result("decontam", rows, t0, hit_docs=hits)
    elif args.mode == "dupspan":
        from logdata_anomaly_miner_ray.stages.decontam import dup_span_coverage

        t0 = time.time()
        n = dup_span_coverage(read(), "text", "row_idx", w=args.w).count()
        rc = _result("dupspan", n, t0)
    elif args.mode == "paradedup":
        from logdata_anomaly_miner_ray.stages.decontam import paragraph_dedup

        import pyarrow.compute as pc

        # every doc gains the same boilerplate paragraph -> ~n_rows
        # drop positions, forcing real pass-B traffic (the stage
        # auto-switches broadcast -> shuffle tier at 5M positions)
        def inject(t: pa.Table) -> pa.Table:
            banner = pa.array(
                ["please subscribe to the banner"] * t.num_rows, pa.string())
            return pa.table({
                "row_idx": t["row_idx"],
                "text": pc.binary_join_element_wise(
                    t["text"].cast(pa.string()), banner, "\n"),
            })

        t0 = time.time()
        n = paragraph_dedup(
            read().map_batches(
                inject, batch_format="pyarrow", batch_size=None),
            "text", "row_idx",
            broadcast_dup_limit=args.broadcast_limit).count()
        rc = _result("paradedup", n, t0,
                     broadcast_limit=args.broadcast_limit)
    elif args.mode == "winnow":
        # MOSS winnowing fingerprints: one shuffle-free pass, the
        # md5 digest feed is the CPU bound (~40 grams/doc)
        from logdata_anomaly_miner_ray.functions.hashing import winnow_select

        def wn(t: pa.Table) -> pa.Table:
            rid, pos, fp = winnow_select(t["text"], k=3, w=4)
            return pa.table({"pos": pa.array(pos, pa.int64()),
                             "fp": pa.array(fp, pa.string())})

        t0 = time.time()
        nfp = read().map_batches(
            wn, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True).count()
        rows = len(files) * 50_000
        rc = _result("winnow", rows, t0, fingerprints=nfp)
    elif args.mode == "snapdiff":
        # crawl-delta at scale: 2 md5 digests/doc + ONE keyed shuffle
        # of ~2 narrow rows/doc (the gate query's %3/%5/%7 snapshots)
        import numpy as np

        from logdata_anomaly_miner_ray.functions.hashing import md5_hex
        from logdata_anomaly_miner_ray.stages.snapshot import snapshot_diff

        import pyarrow.compute as pc

        def explode(t: pa.Table) -> pa.Table:
            d = t["row_idx"].to_numpy(zero_copy_only=False)
            text = t["text"]
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            h = np.array(md5_hex(text), dtype=object)
            suf = pc.if_else(pa.array(d % 7 == 0),
                             pa.array(["#v2"] * len(d), pa.string()),
                             pa.array([""] * len(d), pa.string()))
            h2 = np.array(md5_hex(
                pc.binary_join_element_wise(text, suf, "")), dtype=object)
            in_a, in_b = d % 3 != 0, d % 5 != 2
            key = np.concatenate([d[in_a], d[in_b]])
            snap = np.array(
                ["a"] * int(in_a.sum()) + ["b"] * int(in_b.sum()),
                dtype=object)
            hh = np.concatenate([h[in_a], h2[in_b]])
            return pa.table({"key": pa.array(key, pa.int64()),
                             "snap": pa.array(snap, pa.string()),
                             "h": pa.array(list(hh), pa.string())})

        t0 = time.time()
        out = snapshot_diff(
            read().map_batches(explode, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True))
        rows = len(files) * 50_000
        rc = _result("snapdiff", rows, t0,
                     statuses={s: int(n) for s, n in
                               zip(out["status"], out["n"])})
    elif args.mode == "frontier":
        # politeness schedule at scale: synthetic hosts (~10k, zipf-free
        # uniform), 1 bucketed shuffle + 1 narrow range sort
        import pyarrow.compute as pc

        from logdata_anomaly_miner_ray.stages.sampling import (
            politeness_manifest,
        )

        def urlify(t: pa.Table) -> pa.Table:
            d = t["row_idx"].to_numpy(zero_copy_only=False)
            host = pc.binary_join_element_wise(
                pa.array(["http://site"] * len(d), pa.string()),
                pc.cast(pa.array(d % 10007, pa.int64()), pa.string()),
                pa.array([".org/p/"] * len(d), pa.string()),
                pc.cast(pa.array(d, pa.int64()), pa.string()), "")
            return pa.table({"doc_id": t["row_idx"], "url": host})

        ds = rd.read_parquet(files, columns=["row_idx"]).map_batches(
            urlify, batch_format="pyarrow", batch_size=None)
        t0 = time.time()
        n = politeness_manifest(ds, "url", "doc_id").count()
        rc = _result("frontier", n, t0, hosts=10007)
    elif args.mode in ("kmeans", "semdedup", "ivf", "knng"):
        # embedding-family drills: deterministic uniform vectors
        # synthesized from row_idx via splitmix64 (no RNG state, so
        # any partitioning reproduces the same table); pages files
        # supply only the row count
        import numpy as np

        d = args.dim

        def _noise(idx: np.ndarray) -> np.ndarray:
            z = idx.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z ^= z >> np.uint64(31)
            return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)

        def embed(t: pa.Table) -> pa.Table:
            r = t["row_idx"].to_numpy(zero_copy_only=False).astype(np.uint64)
            flat = (r[:, None] * np.uint64(d)
                    + np.arange(d, dtype=np.uint64)[None, :]).ravel()
            emb = _noise(flat).reshape(len(r), d)
            return pa.table({
                "vec_id": pa.array(r.astype(np.int64), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float64())),
            })

        eds = rd.read_parquet(files, columns=["row_idx"]).map_batches(
            embed, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True)
        rows = rd.read_parquet(files, columns=["row_idx"]).count()
        if args.mode == "kmeans":
            from logdata_anomaly_miner_ray.stages.clustering import (
                kmeans_assign,
            )

            t0 = time.time()
            out, _ = kmeans_assign(eds, "embedding", "vec_id",
                                   k=args.kmeans_k, n_iter=2)
            n = out.count()
            rc = _result("kmeans", n, t0, k=args.kmeans_k, dim=d)
        elif args.mode == "semdedup":
            from logdata_anomaly_miner_ray.stages.clustering import semdedup

            k = max(64, rows // 2000)  # SemDeDup: k ∝ corpus size
            t0 = time.time()
            out = semdedup(eds, "embedding", "vec_id", k=k, n_iter=2)
            n = out.count()
            rc = _result("semdedup", n, t0, k=k, dim=d)
        elif args.mode == "knng":
            from logdata_anomaly_miner_ray.stages.ann import knn_graph

            nc = max(64, rows // 2_000)  # ~2k vectors per cell (the semdedup k heuristic; per-bucket argpartition work is O(rows^2*nprobe/nc))
            t0 = time.time()
            out = knn_graph(eds, "embedding", "vec_id", k=5,
                            n_centroids=nc, nprobe=2)
            n = out.count()
            rc = _result("knng", rows, t0, edges=n, n_centroids=nc,
                         nprobe=2, dim=d)
        else:
            from logdata_anomaly_miner_ray.stages.ann import ivf_topk

            q = _noise((np.arange(16 * d, dtype=np.uint64)
                        + np.uint64(10**15))).reshape(16, d)
            qref = ray.put(q)
            t0 = time.time()
            out = ivf_topk(eds, "embedding", "vec_id", qref, dim=d,
                           k=10, n_centroids=64, nprobe=8)
            rc = _result("ivf", rows, t0, hits=len(out), dim=d,
                         n_queries=16)
    elif args.mode == "extract":
        # north-star transform at scale: html -> visible text over
        # every page payload, one zero-copy RE2-chain pass
        from logdata_anomaly_miner_ray.functions.html import extract_text_array

        def extract(t: pa.Table) -> pa.Table:
            return pa.table({"row_idx": t["row_idx"],
                             "text": extract_text_array(t["html"])})

        t0 = time.time()
        n = rd.read_parquet(files, columns=["row_idx", "html"]).map_batches(
            extract, batch_format="pyarrow", batch_size=None).count()
        rc = _result("extract", n, t0)
    elif args.mode == "tfidf":
        from logdata_anomaly_miner_ray.stages.ranking import tfidf_top_terms

        t0 = time.time()
        n = tfidf_top_terms(read(), k=5, id_col="row_idx").count()
        rc = _result("tfidf", n, t0)
    elif args.mode == "pagerank":
        from logdata_anomaly_miner_ray.stages.graph import link_edges, pagerank

        import pyarrow.parquet as pq

        n_docs = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        ids = rd.read_parquet(files, columns=["row_idx"])
        t0 = time.time()
        edges = link_edges(ids, n_docs, id_col="row_idx")
        n = pagerank(
            edges, n_docs, iters=3,
            max_broadcast_nodes=0 if args.scale_tier else 50_000_000,
        ).count()
        rc = _result("pagerank", n, t0, edges=int(2.5 * n_docs),
                     tier="scale" if args.scale_tier else "broadcast")
    elif args.mode == "hits":
        from logdata_anomaly_miner_ray.stages.graph import (
            hits_scores,
            link_edges,
        )

        import pyarrow.parquet as pq

        n_docs = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        ids = rd.read_parquet(files, columns=["row_idx"])
        t0 = time.time()
        edges = link_edges(ids, n_docs, id_col="row_idx")
        n = hits_scores(
            edges, n_docs, iters=2,
            max_broadcast_nodes=0 if args.scale_tier else 50_000_000,
        ).count()
        rc = _result("hits", n, t0, edges=int(2.5 * n_docs),
                     tier="scale" if args.scale_tier else "broadcast")
    else:
        from logdata_anomaly_miner_ray.stages.packing import pack_sequences

        t0 = time.time()
        out = pack_sequences(read(), "text", "row_idx",
                             seq_len=args.seq_len, sep_tokens=1)

        def tail(b: pa.Table) -> pa.Table:
            return pa.table(
                {"m": pa.array([int(b["seq_last"].to_numpy().max())],
                               pa.int64()),
                 "n": pa.array([len(b)], pa.int64())})

        agg = out.map_batches(
            tail, batch_format="pyarrow", batch_size=None).to_pandas()
        rc = _result("pack", int(agg["n"].sum()), t0,
                     n_sequences=int(agg["m"].max()) + 1)
    ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())

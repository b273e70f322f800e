"""Benchmark harness (driver contract).

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE JSON line::

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "pages_rows": R, "pages_docs_per_sec": D}

``--scaling``: run the identical job twice in fresh processes at
``GRAFT_SCALE_LO`` and ``GRAFT_SCALE_HI`` CPUs (default 2 vs 8 —
see BASELINE.md for why 8-vs-32 measures this host's DRAM ceiling,
not the pipeline) on the same input and print the two throughputs +
scaling efficiency.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time
import warnings

PAGES_ROWS = int(os.environ.get("GRAFT_PAGES_ROWS", "400000"))
PAGES_DIR = f"/tmp/graft_pages_{PAGES_ROWS}"

# headline query subset: the operators with real work at sf0.1
BENCH_QUERIES = [
    "column_stats_lineitem",
    "q1_lineitem",
    "uniqueness_lineitem",
    "segment_revenue",
    "window_counts_events",
    "frequency_anomalies_events",
    "sequence_2grams_events",
    "exact_dedup_documents",
    "minhash_pairs_documents",
    "ann_topk_embeddings",
    "asof_join_events",
    "exact_quantiles_lineitem",
    "heavy_hitters_documents",
]


_WAIT_BUDGET = [float(os.environ.get("GRAFT_WAIT_BUDGET", "240"))]
# the suite dominates the headline total: its reps get a RESERVED
# gate budget the per-query gating cannot exhaust first
_SUITE_WAIT_BUDGET = [float(os.environ.get("GRAFT_SUITE_WAIT_BUDGET", "300"))]


def _load_1min() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError):
        return 0.0


def _gate_load(budget: list = _WAIT_BUDGET) -> None:
    """Wait (bounded by the given budget) for the SHARED host's 1-min
    load to drop below GRAFT_LOAD_GATE before a timed rep. The host's
    background bursts last 1-3 min with idle gaps between (CLAUDE.md),
    so a bounded wait usually lands a rep in a quiet window; when the
    budget is spent, reps run ungated and best-of-N still helps."""
    gate = float(os.environ.get("GRAFT_LOAD_GATE", "2.0"))
    while budget[0] > 0 and _load_1min() >= gate:
        step = min(5.0, budget[0])
        time.sleep(step)
        budget[0] -= step


def _consume(res) -> int:
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pa.Table, pd.DataFrame)):
        return len(res)
    return 0


def run_bench() -> dict:
    warnings.filterwarnings("ignore")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    logging.getLogger("ray").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E

    from logdata_anomaly_miner_ray.pipelines.validate import run_suite
    from logdata_anomaly_miner_ray.sources.pages import materialize_pages_parquet

    # pages fixture: generated once, cached as parquet (untimed);
    # one file per ~6k rows so reads parallelize past 32 CPUs
    materialize_pages_parquet(
        PAGES_ROWS, PAGES_DIR, block_rows=max(2_000, PAGES_ROWS // 64)
    )

    # warm OS page cache so we measure compute+shuffle, not cold reads
    import ray.data as rd

    for t in ("lineitem", "events", "orders", "documents", "embeddings"):
        rd.read_parquet(f"{sf_dir}/{t}.parquet").count()
    rd.read_parquet(PAGES_DIR).count()

    qs = E.queries()
    timings: dict[str, float] = {}
    query_reps = max(1, int(os.environ.get("GRAFT_QUERY_REPS", "2")))
    if not os.environ.get("GRAFT_SUITE_ONLY"):
        # best-of-N with load gating: one rep on this SHARED host can
        # be 2-4x off (BASELINE.md); the min over gated reps is the
        # robust sample the driver records
        for name in BENCH_QUERIES:
            best = float("inf")
            for _ in range(query_reps):
                _gate_load()
                t0 = time.time()
                _consume(qs[name](sf_dir))
                best = min(best, time.time() - t0)
            timings[name] = round(best, 3)

    # headline: full validation suite over the pages table.
    # The host is SHARED (load-average swings 1->22 with no local
    # processes; CLAUDE.md); a single rep can be 2-3x off. Standard
    # discipline: best of GRAFT_SUITE_REPS reps (default 3), all reps
    # reported so the spread is visible.
    suite_reps = []
    for _ in range(max(1, int(os.environ.get("GRAFT_SUITE_REPS", "3")))):
        _gate_load(_SUITE_WAIT_BUDGET)
        t0 = time.time()
        pages = rd.read_parquet(PAGES_DIR, include_paths=True)
        run_suite(pages)
        suite_reps.append(round(time.time() - t0, 3))
    suite_sec = min(suite_reps)
    timings["pages_suite"] = suite_sec

    # compute-bound reference stage for the scaling comparison:
    # MinHash signatures (128 perms) — high FLOPs/byte, so it tracks
    # CPU scaling rather than the host's memory-bandwidth ceiling
    import pyarrow as _pa

    from logdata_anomaly_miner_ray.functions.hashing import minhash_signatures

    def _sig(t: "_pa.Table") -> "_pa.Table":
        s = minhash_signatures(t["text"], num_perm=128, k=3)
        return _pa.table({"n": _pa.array([len(s)])})

    minhash_sec = float("inf")
    for _ in range(max(1, int(os.environ.get("GRAFT_MINHASH_REPS", "2")))):
        _gate_load()
        t0 = time.time()
        rd.read_parquet(PAGES_DIR, columns=["text"]).map_batches(
            _sig, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).count()
        minhash_sec = min(minhash_sec, time.time() - t0)
    timings["minhash_stage"] = round(minhash_sec, 3)

    # corpus-hygiene stages over the same 400k-row pages table:
    # duplicate-span coverage (one keyed shuffle of per-(doc, gram)
    # rows) and eval-set decontamination (broadcast eval grams + one
    # shuffle-free pass). Round-4 additions — reported under
    # `extra_stages`, NOT folded into the headline `value`, so totals
    # stay comparable against BENCH_r03 and older.
    extra_stages: dict[str, float] = {}
    if not os.environ.get("GRAFT_SUITE_ONLY"):
        from logdata_anomaly_miner_ray.stages.decontam import (
            decontaminate,
            dup_span_coverage,
        )

        def _hygiene_input():
            return rd.read_parquet(PAGES_DIR, columns=["row_idx", "text"])

        dup_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            dup_span_coverage(_hygiene_input(), "text", "row_idx", w=8).count()
            dup_sec = min(dup_sec, time.time() - t0)
        extra_stages["dup_span_stage"] = round(dup_sec, 3)

        def _mod_split(want_zero: bool):
            def f(t: "_pa.Table") -> "_pa.Table":
                r = t["row_idx"].to_numpy(zero_copy_only=False) % 1009 == 0
                return t.filter(_pa.array(r if want_zero else ~r))
            return f

        dec_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            corpus = _hygiene_input().map_batches(
                _mod_split(False), batch_format="pyarrow", batch_size=None)
            eval_ds = _hygiene_input().map_batches(
                _mod_split(True), batch_format="pyarrow", batch_size=None)
            decontaminate(corpus, eval_ds, "text", "row_idx", k=8).count()
            dec_sec = min(dec_sec, time.time() - t0)
        extra_stages["decontam_stage"] = round(dec_sec, 3)

        from logdata_anomaly_miner_ray.stages.packing import pack_sequences

        pack_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            pack_sequences(
                _hygiene_input(), "text", "row_idx", seq_len=2048
            ).count()
            pack_sec = min(pack_sec, time.time() - t0)
        extra_stages["pack_stage"] = round(pack_sec, 3)

        # north-star byte-level transform: HTML -> visible text over
        # every page's html payload (one zero-copy RE2-chain pass)
        from logdata_anomaly_miner_ray.functions.html import extract_text_array

        def _extract(t: "_pa.Table") -> "_pa.Table":
            return _pa.table(
                {"row_idx": t["row_idx"],
                 "text": extract_text_array(t["html"])})

        ext_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            rd.read_parquet(PAGES_DIR, columns=["row_idx", "html"]).map_batches(
                _extract, batch_format="pyarrow", batch_size=None
            ).count()
            ext_sec = min(ext_sec, time.time() - t0)
        extra_stages["extract_stage"] = round(ext_sec, 3)

        from logdata_anomaly_miner_ray.stages.graph import link_edges, pagerank
        from logdata_anomaly_miner_ray.stages.ranking import tfidf_top_terms

        tfidf_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            tfidf_top_terms(_hygiene_input(), k=5, id_col="row_idx").count()
            tfidf_sec = min(tfidf_sec, time.time() - t0)
        extra_stages["tfidf_stage"] = round(tfidf_sec, 3)

        pr_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            pagerank(
                link_edges(
                    rd.read_parquet(PAGES_DIR, columns=["row_idx"]),
                    PAGES_ROWS, id_col="row_idx"),
                PAGES_ROWS, iters=3,
            ).count()
            pr_sec = min(pr_sec, time.time() - t0)
        extra_stages["pagerank_stage"] = round(pr_sec, 3)

        from logdata_anomaly_miner_ray.stages.importance import dsir_weights
        from logdata_anomaly_miner_ray.stages.ranking import bm25_topk

        bm_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            bm25_topk(
                _hygiene_input(),
                ["the", "scan", "window", "query", "error"],
                k=10, id_col="row_idx",
            ).count()
            bm_sec = min(bm_sec, time.time() - t0)
        extra_stages["bm25_stage"] = round(bm_sec, 3)

        def _dsir_input():
            # lang lives on the pages table; fall back to a derived
            # pseudo-label when the cached table predates the column
            cols = ["row_idx", "text", "lang"]
            return rd.read_parquet(PAGES_DIR, columns=cols)

        ds_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            dsir_weights(
                _dsir_input(), target_col="lang", target_value="en",
                id_col="row_idx", hash_mode="fast",
            ).count()
            ds_sec = min(ds_sec, time.time() - t0)
        extra_stages["dsir_stage"] = round(ds_sec, 3)

        from logdata_anomaly_miner_ray.stages.decontam import paragraph_dedup
        from logdata_anomaly_miner_ray.stages.text_analysis import gopher_rules

        para_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            paragraph_dedup(_hygiene_input(), "text", "row_idx").count()
            para_sec = min(para_sec, time.time() - t0)
        extra_stages["paradedup_stage"] = round(para_sec, 3)

        gop_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            gopher_rules(_hygiene_input(), "text", "row_idx").count()
            gop_sec = min(gop_sec, time.time() - t0)
        extra_stages["gopher_stage"] = round(gop_sec, 3)

        def _winnow_stage(t: "_pa.Table") -> "_pa.Table":
            from logdata_anomaly_miner_ray.functions.hashing import (
                winnow_select,
            )

            rid, pos, fp = winnow_select(t["text"], k=3, w=4)
            return _pa.table({"pos": _pa.array(pos, _pa.int64()),
                              "fp": _pa.array(fp, _pa.string())})

        win_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            _hygiene_input().map_batches(
                _winnow_stage, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True).count()
            win_sec = min(win_sec, time.time() - t0)
        extra_stages["winnow_stage"] = round(win_sec, 3)

        # embedding clustering: splitmix64 synthetic vectors from
        # row_idx (the hygiene_drill recipe), Lloyd k-means at a k
        # large enough to exercise the chunked distance kernel
        import numpy as _np

        def _embed_stage(t: "_pa.Table") -> "_pa.Table":
            d = 16
            r = t["row_idx"].to_numpy(zero_copy_only=False).astype(_np.uint64)
            flat = (r[:, None] * _np.uint64(d)
                    + _np.arange(d, dtype=_np.uint64)[None, :]).ravel()
            z = flat + _np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> _np.uint64(30))) * _np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> _np.uint64(27))) * _np.uint64(0x94D049BB133111EB)
            z ^= z >> _np.uint64(31)
            emb = ((z >> _np.uint64(11)).astype(_np.float64)
                   / float(1 << 53)).reshape(len(r), d)
            return _pa.table({
                "vec_id": _pa.array(r.astype(_np.int64), _pa.int64()),
                "embedding": _pa.array(list(emb), _pa.list_(_pa.float64())),
            })

        from logdata_anomaly_miner_ray.stages.clustering import kmeans_assign

        km_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            eds = rd.read_parquet(PAGES_DIR, columns=["row_idx"]).map_batches(
                _embed_stage, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True)
            out, _cent = kmeans_assign(eds, "embedding", "vec_id",
                                       k=512, n_iter=2)
            out.count()
            km_sec = min(km_sec, time.time() - t0)
        extra_stages["kmeans_stage"] = round(km_sec, 3)

        # kNN graph over the same synthetic vectors (IVF scale tier:
        # one narrow vector shuffle + per-bucket exact int8 kNN)
        from logdata_anomaly_miner_ray.stages.ann import knn_graph

        kg_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            eds = rd.read_parquet(PAGES_DIR, columns=["row_idx"]).map_batches(
                _embed_stage, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True)
            knn_graph(eds, "embedding", "vec_id", k=5,
                      n_centroids=256, nprobe=2).count()
            kg_sec = min(kg_sec, time.time() - t0)
        extra_stages["knng_stage"] = round(kg_sec, 3)

        # HITS over the pagerank link graph (broadcast tier, 2 iters)
        from logdata_anomaly_miner_ray.stages.graph import (
            hits_scores,
            link_edges,
        )

        ht_sec = float("inf")
        for _ in range(max(1, int(os.environ.get("GRAFT_HYGIENE_REPS", "2")))):
            _gate_load()
            t0 = time.time()
            docs = rd.read_parquet(PAGES_DIR, columns=["row_idx"]).map_batches(
                lambda t: _pa.table({"doc_id": t["row_idx"]}),
                batch_format="pyarrow", batch_size=None)
            hits_scores(link_edges(docs, PAGES_ROWS), PAGES_ROWS,
                        iters=2).count()
            ht_sec = min(ht_sec, time.time() - t0)
        extra_stages["hits_stage"] = round(ht_sec, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline pipelines total wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extra_stages": extra_stages,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "pages_rows": PAGES_ROWS,
        "pages_docs_per_sec": round(PAGES_ROWS / suite_sec, 1),
        "pages_suite_reps": suite_reps,
        "minhash_docs_per_sec": round(PAGES_ROWS / minhash_sec, 1),
        "query_reps": query_reps,
        "load_gate_waited_sec": round(
            float(os.environ.get("GRAFT_WAIT_BUDGET", "240")) - _WAIT_BUDGET[0]
            + float(os.environ.get("GRAFT_SUITE_WAIT_BUDGET", "300"))
            - _SUITE_WAIT_BUDGET[0], 1
        ),
        "load_1min_at_end": _load_1min(),
    }
    ray.shutdown()
    return out


def run_scaling() -> None:
    def one(ncpu: int) -> dict:
        # scaling compares the headline pages suite only — the same
        # job at both parallelism levels (BASELINE.md protocol)
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SUITE_ONLY="1")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(p.stdout.strip().splitlines()[-1])

    # N vs 4N. Default 2 vs 8: this shared sandbox host delivers
    # near-linear CPU scaling up to ~8-12 workers and saturates on
    # memory bandwidth beyond (see BASELINE.md probe); 8-vs-32 mostly
    # measures the host, not the pipeline. Override via env.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "8"))
    # the sandbox host is SHARED (load-average swings 2x with zero
    # local processes): interleave repetitions and keep each leg's
    # best run so both legs sample comparable contention
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "2"))
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    tp_lo = r_lo["pages_docs_per_sec"]
    tp_hi = r_hi["pages_docs_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    mh_lo = r_lo.get("minhash_docs_per_sec", 0)
    mh_hi = r_hi.get("minhash_docs_per_sec", 0)
    mh_eff = (mh_hi / mh_lo) / (hi / lo) if mh_lo else None
    print(
        json.dumps(
            {
                "metric": "pages-suite scaling efficiency",
                "num_cpus_lo": lo,
                "num_cpus_hi": hi,
                f"docs_per_sec_{lo}": tp_lo,
                f"docs_per_sec_{hi}": tp_hi,
                f"sec_total_{lo}": r_lo["value"],
                f"sec_total_{hi}": r_hi["value"],
                "scaling_efficiency": round(eff, 3),
                "scaling_efficiency_compute_bound": round(mh_eff, 3) if mh_eff else None,
                f"minhash_docs_per_sec_{lo}": mh_lo,
                f"minhash_docs_per_sec_{hi}": mh_hi,
                "pages_rows": r_lo["pages_rows"],
                "note": "suite is memory-streaming: on this SHARED single box aggregate "
                "DRAM bandwidth caps any streaming job at ~0.65 (measured probe in "
                "BASELINE.md); on a real N->4N NODE cluster each node adds its own "
                "bandwidth, which the compute-bound stage efficiency approximates",
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))

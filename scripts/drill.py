"""Streaming-scale drill driver (BASELINE.md evidence, SURVEY §7.2 M8).

Reproducible version of the /tmp/drill scripts used for the 2M / 10M /
50M-row drills: generate a deterministic pages table, run the full
validation suite over it with per-partition checkpointing, optionally
SIGKILL it mid-validate and resume from the manifest, and verify the
resumed outputs are multiset-identical to an uninterrupted run.

Usage (each step its own process so ray.init stays per-run):

    python scripts/drill.py gen     --rows 50000000 --pages /tmp/graft_pages_50M
    python scripts/drill.py run     --pages /tmp/graft_pages_50M --out /tmp/drill/out_ref
    python scripts/drill.py run     --pages /tmp/graft_pages_50M --out /tmp/drill/out   # SIGKILL this one mid-validate
    python scripts/drill.py resume  --pages /tmp/graft_pages_50M --out /tmp/drill/out
    python scripts/drill.py compare --a /tmp/drill/out_ref --b /tmp/drill/out

The CI-scale version of the kill+resume equality lives in
tests/test_validate_pipeline.py::test_resume_after_midrun_crash_byte_identical.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)


def cmd_gen(args) -> None:
    _init_ray(args.num_cpus)
    from logdata_anomaly_miner_ray.sources.pages import materialize_pages_parquet

    t0 = time.time()
    materialize_pages_parquet(args.rows, args.pages, block_rows=args.block_rows)
    print("gen seconds:", round(time.time() - t0, 1), flush=True)


def _run(args, expect_manifest: bool) -> None:
    _init_ray(args.num_cpus)
    import ray.data as rd

    from logdata_anomaly_miner_ray.pipelines.validate import run_suite

    done_before = []
    if expect_manifest:
        done_before = sorted(json.load(open(args.out + "/manifest.json")))
    t0 = time.time()
    out = run_suite(rd.read_parquet(args.pages), out_dir=args.out)
    dt = time.time() - t0
    n = out["state"]["n_rows"]
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    verd = [(r["check"], r["pass"], r["n_violations"]) for r in out["verdicts"].to_pylist()]
    rec = {
        "rows": n,
        "seconds": round(dt, 1),
        "docs_per_sec": round(n / dt, 1),
        "driver_peak_rss_gb": round(peak_gb, 2),
        "verdicts": verd,
        "text_sha256_xor": out["verdicts"].to_pylist()[0].get("text_sha256_xor"),
    }
    if expect_manifest:
        rec["resume_skipped"] = done_before
    print(json.dumps(rec), flush=True)


def cmd_compare(args) -> None:
    import duckdb

    ca = sorted(d for d in os.listdir(args.a) if d.startswith("check="))
    cb = sorted(d for d in os.listdir(args.b) if d.startswith("check="))
    assert ca == cb, (ca, cb)
    con = duckdb.connect()
    for c in ca:
        pa_, pb_ = f"{args.a}/{c}/*.parquet", f"{args.b}/{c}/*.parquet"
        na = con.sql(f"SELECT count(*) FROM read_parquet('{pa_}')").fetchone()[0]
        nb = con.sql(f"SELECT count(*) FROM read_parquet('{pb_}')").fetchone()[0]
        # multiset symmetric difference. EXCEPT ALL is NULL-safe; a
        # FULL OUTER JOIN ... USING formulation cannot match NULL key
        # columns (e.g. an all-NULL ts) and reports a false mismatch.
        d = con.sql(
            f"""SELECT count(*) FROM (
              (SELECT * FROM read_parquet('{pa_}') EXCEPT ALL SELECT * FROM read_parquet('{pb_}'))
              UNION ALL
              (SELECT * FROM read_parquet('{pb_}') EXCEPT ALL SELECT * FROM read_parquet('{pa_}'))
            )"""
        ).fetchone()[0]
        status = "OK" if (na == nb and d == 0) else "MISMATCH"
        print(f"{c}: rows {na} vs {nb}, symdiff={d} -> {status}", flush=True)
        assert status == "OK", c
    ma = json.load(open(args.a + "/manifest.json"))
    mb = json.load(open(args.b + "/manifest.json"))
    assert sorted(ma) == sorted(mb)
    for k in ma:
        assert (ma[k]["pass_"], ma[k]["n_violations"]) == (
            mb[k]["pass_"], mb[k]["n_violations"],
        ), k
    print("manifests agree on", len(ma), "checks")
    print("MULTISET-IDENTICAL: all check outputs multiset-equal, verdicts equal")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--pages", required=True)
    g.add_argument("--block-rows", type=int, default=50_000)
    g.add_argument("--num-cpus", type=int, default=32, dest="num_cpus")
    for name in ("run", "resume"):
        r = sub.add_parser(name)
        r.add_argument("--pages", required=True)
        r.add_argument("--out", required=True)
        r.add_argument("--num-cpus", type=int, default=32, dest="num_cpus")
    c = sub.add_parser("compare")
    c.add_argument("--a", required=True)
    c.add_argument("--b", required=True)
    args = ap.parse_args()
    if args.cmd == "gen":
        cmd_gen(args)
    elif args.cmd == "run":
        _run(args, expect_manifest=False)
    elif args.cmd == "resume":
        _run(args, expect_manifest=True)
    else:
        cmd_compare(args)


if __name__ == "__main__":
    main()

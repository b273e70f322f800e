"""CLI: run the validation suite over a Parquet pages table.

The ``ray job submit`` entry point for a fixed-size cluster::

    ray job submit -- python -m logdata_anomaly_miner_ray \
        --input /data/pages --out /data/validation_run1 \
        [--ts-index /data/ts_index] [--num-cpus 32] [--no-resume]

Owns its Ray session (guarded init, shutdown at exit) — library code
and __ray_entry__ never call ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="logdata_anomaly_miner_ray")
    ap.add_argument("--input", required=True, help="pages Parquet path/dir")
    ap.add_argument("--ts-index", default=None, help="referential partner Parquet")
    ap.add_argument("--out", required=True, help="output dir (violations + manifest)")
    ap.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU cap")
    ap.add_argument("--window-seconds", type=int, default=600)
    ap.add_argument("--no-resume", action="store_true", help="ignore checkpoint manifest")
    ap.add_argument(
        "--list-checkpoints", action="store_true",
        help="print the manifest of --out and exit (aminer-persistence list analogue)",
    )
    ap.add_argument(
        "--reset-check", default=None, metavar="CHECK",
        help="drop one check's manifest entry so the next run redoes it",
    )
    args = ap.parse_args(argv)

    if args.list_checkpoints or args.reset_check:
        from .state.checkpoint import CheckpointManifest

        m = CheckpointManifest(args.out)
        if args.reset_check:
            m.reset(args.reset_check)
            print(json.dumps({"reset": args.reset_check}))
        if args.list_checkpoints:
            print(json.dumps(m._entries, indent=1, sort_keys=True))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        import ray.data as rd

        from .pipelines.validate import fit_and_narrow, validate
        from .schema import SuiteConfig
        from .state.checkpoint import CheckpointManifest

        pages = rd.read_parquet(args.input, include_paths=True)
        tsx = rd.read_parquet(args.ts_index) if args.ts_index else None
        if args.no_resume:
            CheckpointManifest(args.out).reset()
        cfg = SuiteConfig(window_seconds=args.window_seconds)
        state, narrow = fit_and_narrow(pages, cfg)
        out = validate(
            pages, state, ts_index=tsx, out_dir=args.out, narrow=narrow,
            resume=not args.no_resume,
        )
        verdicts = out["verdicts"]
        import pyarrow.parquet as pq

        pq.write_table(verdicts, f"{args.out}/verdicts.parquet")
        vd = verdicts.to_pylist()
        print(json.dumps({
            "checks": {r["check"]: {"pass": r["pass"], "n_violations": r["n_violations"]} for r in vd},
            "n_rows": vd[0]["n_rows"] if vd else 0,
            "out": args.out,
        }))
        return 0 if all(r["pass"] for r in vd) else 1
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())

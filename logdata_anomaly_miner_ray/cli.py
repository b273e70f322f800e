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
    ap.add_argument(
        "--config", default=None,
        help="declarative suite YAML (validated up front; flags override) — "
             "the YamlConfig/ConfigValidator analogue",
    )
    ap.add_argument("--input", default=None, help="pages Parquet path/dir")
    ap.add_argument("--ts-index", default=None, help="referential partner Parquet")
    ap.add_argument("--out", default=None, help="output dir (violations + manifest)")
    ap.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU cap")
    ap.add_argument("--window-seconds", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true", help="ignore checkpoint manifest")
    ap.add_argument(
        "--list-checkpoints", action="store_true",
        help="print the manifest of --out and exit (aminer-persistence list analogue)",
    )
    ap.add_argument(
        "--reset-check", default=None, metavar="CHECK",
        help="drop one check's manifest entry so the next run redoes it",
    )
    # AMiner learn-mode lifecycle (aminer runs learn_mode=True to
    # build detector state, persists it, then detects against the
    # frozen state — aminer/util/PersistenceUtil.py):
    ap.add_argument(
        "--save-state", default=None, metavar="PATH",
        help="persist the fit pass's merged constraint state to PATH",
    )
    ap.add_argument(
        "--fit-only", action="store_true",
        help="learn-mode: fit + save state (requires --save-state), skip validation",
    )
    ap.add_argument(
        "--state", default=None, metavar="PATH",
        help="detect-mode: validate against a FROZEN persisted state instead of re-fitting",
    )
    # stop_learning run modes (reference input/InputInterfaces.py:251-281:
    # learn_mode auto-switches off after stop_learning_time, or after
    # stop_learning_no_anomaly_time without the detectors learning
    # anything new). Batch recast: fit on the corresponding prefix of
    # the data, freeze, validate EVERYTHING against the frozen state.
    ap.add_argument(
        "--stop-learning-seconds", type=float, default=None, metavar="S",
        help="learn only on rows with warc_ts within S seconds of the "
             "earliest row, then freeze (stop_learning_time analogue)",
    )
    ap.add_argument(
        "--stop-learning-rows", type=int, default=None, metavar="N",
        help="learn only on the first N rows in input order, then freeze",
    )
    ap.add_argument(
        "--stop-learning-no-anomaly-seconds", type=float, default=None,
        metavar="S",
        help="stop learning after S seconds of data add NO new "
             "constraints (stop_learning_no_anomaly_time analogue; "
             "windowed-novelty replay)",
    )
    # allowlist/blocklist mutation of a persisted state (the batch
    # analogue of the reference's remote-control allowlist_event /
    # blocklist_event — see state/checkpoint.patch_state):
    ap.add_argument(
        "--patch-state", default=None, metavar="PATH",
        help="apply --allow-value/--block-value specs to a saved state file",
    )
    ap.add_argument(
        "--allow-value", action="append", default=[], metavar="SPEC",
        help="lang:L | token_range:L:MIN:MAX | charset:L:CHARS (repeatable)",
    )
    ap.add_argument(
        "--block-value", action="append", default=[], metavar="SPEC",
        help="lang:L — omit rows in L from validation (repeatable)",
    )
    ap.add_argument(
        "--show-state", default=None, metavar="PATH",
        help="print a summary of a saved state file and exit",
    )
    args = ap.parse_args(argv)

    if args.show_state:
        from .state.checkpoint import load_state

        st = load_state(args.show_state)
        print(json.dumps({
            "n_rows": int(st.get("n_rows", 0)),
            "lang_domain": st.get("lang_domain", []),
            "ignore_langs": st.get("ignore_langs", []),
            "ranges": {k[0]: list(v) for k, v in st.get("ranges", {}).items()},
            "partitions": len(st.get("partitions", {})),
        }, sort_keys=True))
        return 0
    if args.patch_state:
        if not (args.allow_value or args.block_value):
            ap.error("--patch-state needs --allow-value/--block-value specs")
        from .state.checkpoint import load_state, patch_state, save_state

        st = load_state(args.patch_state)
        try:
            msgs = patch_state(st, args.allow_value, args.block_value)
        except ValueError as ex:
            print(json.dumps({"patch_error": str(ex)}), file=sys.stderr)
            return 2
        save_state(st, args.patch_state)
        print(json.dumps({"patched": args.patch_state, "messages": msgs}))
        return 0

    if args.fit_only and not args.save_state:
        ap.error("--fit-only requires --save-state")
    if args.state and (args.fit_only or args.save_state):
        ap.error("--state (detect-mode) conflicts with --fit-only/--save-state")
    stop_flags = [args.stop_learning_seconds, args.stop_learning_rows,
                  args.stop_learning_no_anomaly_seconds]
    if sum(f is not None for f in stop_flags) > 1:
        ap.error("at most one --stop-learning-* flag may be given")
    if args.state and any(f is not None for f in stop_flags):
        ap.error("--stop-learning-* needs a fit phase; conflicts with --state")

    cfg_file: dict = {}
    if args.config:
        from .config import ConfigError, load_suite_yaml

        try:
            cfg_file = load_suite_yaml(args.config)
        except ConfigError as ex:
            print(json.dumps({"config_error": str(ex)}), file=sys.stderr)
            return 2
    # explicit flags override the file
    args.input = args.input or cfg_file.get("input")
    args.out = args.out or cfg_file.get("out")
    args.ts_index = args.ts_index or cfg_file.get("ts_index")
    args.num_cpus = args.num_cpus if args.num_cpus is not None else cfg_file.get("num_cpus")
    if args.window_seconds is None:
        args.window_seconds = cfg_file.get("window_seconds", 600)
    if not args.no_resume and cfg_file.get("resume") is False:
        args.no_resume = True
    if not args.input or (not args.out and not args.fit_only):
        ap.error("--input and --out are required (flags or --config file)")

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
        import pyarrow as pa
        import ray.data as rd

        from .pipelines.validate import fit_and_narrow, prune_to_suite_columns, validate
        from .schema import SuiteConfig
        from .state.checkpoint import CheckpointManifest

        pages = prune_to_suite_columns(rd.read_parquet(args.input, include_paths=True))
        tsx = rd.read_parquet(args.ts_index) if args.ts_index else None
        if args.no_resume and args.out:
            CheckpointManifest(args.out).reset()
        cfg = SuiteConfig(
            checks=cfg_file.get("checks", {}), window_seconds=args.window_seconds,
            materialize_narrow=cfg_file.get("materialize_narrow", True),
        )
        stop_info = None
        if args.state:  # detect-mode: frozen persisted constraints
            from .state.checkpoint import load_state

            state = load_state(args.state)
            state["config"] = cfg
            narrow = None  # validate() derives its own narrow projection
        elif any(f is not None for f in stop_flags):
            # stop-learning: fit on a prefix, freeze, validate all.
            narrow = None  # prefix narrow would not cover the suffix
            if args.stop_learning_rows is not None:
                from .pipelines.validate import fit

                state = fit(pages.limit(args.stop_learning_rows), cfg)
                stop_info = {"mode": "rows", "limit": args.stop_learning_rows}
            else:
                # anchor at the FIRST row's timestamp (the reference
                # anchors at the first atom's time, not the global
                # min — one early out-of-order straggler must not
                # shift the whole learning horizon)
                head = rd.read_parquet(
                    args.input, columns=["warc_ts"]).limit(64).take_all()
                t0_us = next(
                    (int(pa.scalar(r["warc_ts"], pa.timestamp("us")).value)
                     for r in head if r["warc_ts"] is not None), None)
                if t0_us is None:
                    print("ERROR: no timestamped rows to anchor the "
                          "learning horizon (input empty or warc_ts "
                          "all-null in the first 64 rows)", file=sys.stderr)
                    return 2
                if args.stop_learning_seconds is not None:
                    from .pipelines.validate import filter_ts_horizon, fit

                    cutoff = t0_us + int(args.stop_learning_seconds * 1_000_000)
                    state = fit(filter_ts_horizon(pages, cutoff), cfg)
                    stop_info = {"mode": "seconds", "cutoff_us": cutoff}
                else:
                    from .pipelines.validate import fit_stop_no_novelty

                    state, cutoff = fit_stop_no_novelty(
                        pages, cfg, args.stop_learning_no_anomaly_seconds, t0_us)
                    stop_info = {"mode": "no_anomaly", "cutoff_us": cutoff}
            if args.save_state:
                from .state.checkpoint import save_state

                save_state(state, args.save_state)
            if args.fit_only:
                print(json.dumps({
                    "fit_only": True, "state": args.save_state,
                    "n_rows": int(state.get("n_rows", 0)),
                    "stop_learning": stop_info,
                }))
                return 0
        else:
            state, narrow = fit_and_narrow(pages, cfg)
            if args.save_state:
                from .state.checkpoint import save_state

                save_state(state, args.save_state)
            if args.fit_only:
                print(json.dumps({
                    "fit_only": True, "state": args.save_state,
                    "n_rows": int(state.get("n_rows", 0)),
                }))
                return 0
        raw_pages = None
        if cfg.checks.get("extraction", {}).get("enabled", False):
            # opt-in faithfulness check needs the html column the
            # suite read pruned away — a second (column-pruned) scan
            raw_pages = rd.read_parquet(args.input, include_paths=True)
        out = validate(
            pages, state, ts_index=tsx, out_dir=args.out, narrow=narrow,
            resume=not args.no_resume,
            allowed_langs=cfg_file.get("allowed_langs"),
            raw_pages=raw_pages,
        )
        verdicts = out["verdicts"]
        import pyarrow.parquet as pq

        pq.write_table(verdicts, f"{args.out}/verdicts.parquet")
        vd = verdicts.to_pylist()
        report = {
            "checks": {r["check"]: {"pass": r["pass"], "n_violations": r["n_violations"]} for r in vd},
            "n_rows": vd[0]["n_rows"] if vd else 0,
            "out": args.out,
        }
        if stop_info is not None:
            report["stop_learning"] = stop_info
        print(json.dumps(report))
        return 0 if all(r["pass"] for r in vd) else 1
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())

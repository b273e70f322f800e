"""The flagship pipeline: full constraint-suite validation of a
web-pages table (north rule).

Two passes, mirroring AMiner's learn-then-detect lifecycle
(reference: aminer/input/InputInterfaces.py:251-281 learn_mode
plumbing; SURVEY.md §3.4):

fit pass (one streaming read, NO row shuffle):
  - per-column stat partials (moments/HLL/t-digest)   → stats table
  - per-lang charset bitmaps                          → charsets
  - char-bigram table                                 → entropy model
  - per-lang token-length ranges                      → ranges
  - lang value domain                                 → domain set
  - text sha256 xor (byte-identity baseline)

validate pass (broadcast state via ray.put; keyed checks shuffle
pre-aggregated partials only):
  - uniqueness on url                       (groupby counts)
  - referential url -> ts_index             (two-sided anti join)
  - lang domain                             (broadcast is_in)
  - per-lang charset / entropy score        (broadcast state)
  - per-lang token-length range             (broadcast ranges)
  - tumbling-window frequency band + empty windows
  - timestamp ordering inversions per domain
  - KS + PSI drift of text length across lang groups
  - text sha256 xor recomputed after all derive stages → invariant

Outputs: violations Dataset (FIXTURES.md F4 schema), verdicts table
(one row per check with metrics/lineage JSON), both written as
partitioned Parquet under ``out_dir`` with a checkpoint manifest —
a rerun skips checks whose manifest entry exists.
"""

from __future__ import annotations

import json
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions import text as textfn
from ..schema import VERDICT_SCHEMA, SuiteConfig
from ..stages import (
    charset as charset_stage,
    drift as drift_stage,
    entropy as entropy_stage,
    frequency as freq_stage,
    ordering as ordering_stage,
    referential as ref_stage,
    uniqueness as uniq_stage,
    value_range as range_stage,
)
from ..stages.column_stats import column_stats
from ..state.checkpoint import CheckpointManifest

PAGES_SCHEMA = {
    "url": "string",
    "warc_ts": "timestamp[us]",
    "html": "binary",
    "text": "string",
    "lang": "string",
}


def _sha_xor(ds: "rd.Dataset", text_col: str = "text") -> str:
    """XOR-fold of per-row sha256(text) — order-independent evidence
    that every text byte survived (BASELINE.json invariant)."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        data, off = textfn.flat_utf8(batch[text_col])
        mv = memoryview(data)
        acc = np.zeros(32, dtype=np.uint8)
        for i in range(len(off) - 1):
            d = np.frombuffer(hashlib.sha256(mv[off[i] : off[i + 1]]).digest(), dtype=np.uint8)
            acc ^= d
        return pa.table({"acc": pa.array([acc.tobytes()], pa.binary())})

    acc = np.zeros(32, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
        batch_format="pyarrow"
    ):
        for blob in b["acc"].to_pylist():
            acc ^= np.frombuffer(blob, dtype=np.uint8)
    return acc.tobytes().hex()


def derive(ds: "rd.Dataset") -> "rd.Dataset":
    """Stateless derive stage: n_tokens, text_len, domain(url) —
    the 'parser' of the pages schema (columns are AMiner paths)."""

    def add(batch: pa.Table) -> pa.Table:
        ntok = textfn.token_counts(batch["text"])
        tlen = pc.binary_length(batch["text"])
        dom = pc.replace_substring_regex(
            pc.replace_substring(batch["url"], "https://", ""), "/.*$", ""
        )
        out = batch.append_column("n_tokens", pa.array(ntok, pa.int64()))
        out = out.append_column("text_len", tlen)
        out = out.append_column("domain", dom)
        return out

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def fit(pages: "rd.Dataset", config: SuiteConfig | None = None) -> dict:
    """Learn pass → broadcastable constraint state dict."""
    config = config or SuiteConfig()
    derived = derive(pages.drop_columns(["html"]))
    state: dict = {}
    state["stats"] = column_stats(
        derived, ["url", "warc_ts", "text", "lang", "n_tokens", "text_len"]
    )
    state["charsets"] = charset_stage.fit_charsets(derived, "lang", "text")
    state["bigrams"] = entropy_stage.fit_bigram_table(derived, "text")
    ranges_tbl = pa.Table.from_pandas(
        range_stage.fit_ranges(derived, ["lang"], "n_tokens").to_pandas()
    )
    state["ranges"] = range_stage.ranges_to_dict(ranges_tbl, ["lang"])
    state["lang_domain"] = sorted(
        r["lang"] for r in derived.groupby("lang").count().take_all()
    )
    state["text_sha_xor"] = _sha_xor(pages)
    state["config"] = config
    return state


def validate(
    pages: "rd.Dataset",
    state: dict,
    ts_index: "rd.Dataset | None" = None,
    out_dir: str | None = None,
    resume: bool = True,
) -> dict:
    """Detect pass → {"violations": Dataset|None per check,
    "verdicts": pa.Table}. With ``out_dir``, each check's violations
    are written to ``out_dir/check=<name>/`` and checkpointed —
    reruns skip completed checks."""
    config: SuiteConfig = state.get("config") or SuiteConfig()
    derived = derive(pages.drop_columns(["html"]))
    manifest = CheckpointManifest(out_dir) if out_dir else None

    charsets_ref = ray.put(state["charsets"])
    bigrams_ref = ray.put(state["bigrams"])
    ranges_ref = ray.put(state["ranges"])
    lang_ref = ray.put([l for l in state["lang_domain"] if l != "xx"])

    checks: dict[str, "rd.Dataset"] = {}
    checks["uniqueness_url"] = uniq_stage.uniqueness_violations(derived, "url")
    if ts_index is not None:
        checks["referential_url_ts"] = ref_stage.referential_violations(
            derived, "url", ts_index, "url"
        )
    from ..stages.domain import domain_violations

    checks["lang_domain"] = domain_violations(
        derived, "lang", lang_ref, key_col="url"
    )
    checks["charset"] = charset_stage.charset_violations(
        derived, "lang", "text", charsets_ref, key_col="url"
    )
    checks["entropy"] = entropy_stage.entropy_violations(
        derived, "text", bigrams_ref, prob_thresh=0.003, key_col="url"
    )
    checks["token_range"] = range_stage.range_violations(
        derived, ["lang"], "n_tokens", ranges_ref
    )

    nonnull_ts = derived.map_batches(
        lambda t: t.filter(pc.is_valid(t["warc_ts"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # the small (lang, window, n) counts table feeds two checks —
    # materialize it once instead of recomputing the read
    wc = freq_stage.window_counts(
        nonnull_ts, ["lang"], "warc_ts", config.window_seconds
    ).materialize()
    checks["frequency"] = freq_stage.frequency_anomalies(
        wc, ["lang"], confidence_factor=0.33
    )
    checks["empty_windows"] = freq_stage.empty_windows(wc, ["lang"])
    checks["ordering"] = ordering_stage.inversion_counts(
        nonnull_ts,
        ["domain"],
        "row_idx" if "row_idx" in pages.schema().names else "url",
        "warc_ts",
    )

    verdict_rows = []
    results: dict[str, object] = {}
    n_rows_total = pages.count()
    for name, vds in checks.items():
        if manifest and resume and manifest.is_done(name):
            e = manifest.entry(name)
            verdict_rows.append(
                (name, e.get("pass", True), e.get("n_violations", 0), e.get("metrics", "{}"))
            )
            results[name] = None
            continue
        t0 = time.time()
        if out_dir:
            path = f"{out_dir}/check={name}"
            vds.write_parquet(path)
            import pyarrow.dataset as pads

            try:
                n_viol = pads.dataset(path).count_rows()
            except FileNotFoundError:
                n_viol = 0  # zero-row result → no files written
        else:
            vds = vds.materialize()
            n_viol = vds.count()
        metrics = json.dumps({"seconds": round(time.time() - t0, 3)})
        if manifest:
            manifest.mark_done(
                name, n_violations=int(n_viol), metrics=metrics, pass_=bool(n_viol == 0)
            )
        verdict_rows.append((name, n_viol == 0, int(n_viol), metrics))
        results[name] = vds

    # byte-identity invariant: recompute sha-xor AFTER the derive
    # stage (text must pass through untouched)
    sha_after = _sha_xor(derive(pages.drop_columns(["html"])))
    sha_ok = sha_after == state["text_sha_xor"]
    verdict_rows.append(
        ("text_byte_identity", sha_ok, 0 if sha_ok else 1, json.dumps({"sha_xor": sha_after}))
    )

    # drift checks operate on the small derived stats
    ksdf = drift_stage.ks_drift_by_group(derived, "lang", "n_tokens")
    n_drift = int(ksdf["drift"].sum())
    verdict_rows.append(
        ("ks_drift_lang_tokens", n_drift == 0, n_drift, ksdf.to_json(orient="records"))
    )

    verdicts = pa.table(
        {
            "partition_id": pa.array(["all"] * len(verdict_rows), pa.string()),
            "check": pa.array([r[0] for r in verdict_rows], pa.string()),
            "pass": pa.array([bool(r[1]) for r in verdict_rows], pa.bool_()),
            "n_rows": pa.array([n_rows_total] * len(verdict_rows), pa.int64()),
            "n_violations": pa.array([int(r[2]) for r in verdict_rows], pa.int64()),
            "metrics": pa.array([r[3] for r in verdict_rows], pa.string()),
            "lineage": pa.array([json.dumps({"source": "pages"})] * len(verdict_rows), pa.string()),
            "text_sha256_xor": pa.array([state["text_sha_xor"]] * len(verdict_rows), pa.string()),
        },
        schema=VERDICT_SCHEMA,
    )
    return {"violations": results, "verdicts": verdicts, "ks_drift": ksdf}


def run_suite(
    pages: "rd.Dataset",
    ts_index: "rd.Dataset | None" = None,
    out_dir: str | None = None,
    config: SuiteConfig | None = None,
) -> dict:
    state = fit(pages, config)
    out = validate(pages, state, ts_index=ts_index, out_dir=out_dir)
    out["state"] = state
    return out

"""The flagship pipeline: full constraint-suite validation of a
web-pages table (north rule).

Two FUSED passes over the wide data, mirroring AMiner's
learn-then-detect lifecycle (reference:
aminer/input/InputInterfaces.py:251-281 learn_mode plumbing;
SURVEY.md §3.4) — AMiner dispatches every atom to every detector in
one loop pass (aminer/input/ByteStreamLineAtomizer.py:205-222); the
batch analogue is ONE ``map_batches`` computing every per-block
partial at once, not one read per detector:

fit pass — single ``map_batches`` over (text, lang, url, warc_ts)
emitting one pickled partial blob per block: per-column moments/HLL/
t-digest, per-lang charset bitmaps, char-bigram table, per-lang
token ranges, lang value counts, sha256-xor of text. Driver merges
(#blocks) small blobs. NO shuffle.

validate pass — single ``map_batches`` with the broadcast merged
state checking lang-domain / charset / entropy / token-range per
row and re-hashing text (byte-identity evidence), emitting
violation rows; plus the keyed checks over a NARROW projection
(url, warc_ts, lang, n_tokens, domain, row_idx — text/html never
shuffle): uniqueness on url, referential vs ts_index, windowed
frequency band + empty windows, per-domain ordering inversions, KS
drift of n_tokens across langs. The narrow projection is
materialized once (cheap: ~40 B/row) and feeds all keyed checks.

Outputs: violations Dataset (FIXTURES.md F4 schema), verdicts table
(one row per check with metrics/lineage JSON), both written as
partitioned Parquet under ``out_dir`` with a checkpoint manifest —
a rerun skips checks whose manifest entry exists.
"""

from __future__ import annotations

import hashlib
import json
import pickle
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions import text as textfn
from ..schema import VERDICT_SCHEMA, SuiteConfig, violations_table
from ..stages import referential as ref_stage
from ..stages import uniqueness as uniq_stage
from ..stages._taskcache import cached_task_fn
from ..stages.charset import MAX_CP, _row_codepoints
from ..stages.column_stats import _ColPartial, _partial_for_column
from ..state.checkpoint import CheckpointManifest
from ..state.sketches import TDigest

PAGES_SCHEMA = {
    "url": "string",
    "warc_ts": "timestamp[us]",
    "html": "binary",
    "text": "string",
    "lang": "string",
}

STAT_COLS = ["url", "warc_ts", "text", "lang", "n_tokens", "text_len"]


# meta-reduction tier threshold (validate()): at most this many
# per-block partial rows are folded on the driver; beyond it the
# bounded composite-key groupby runs (module-level so tests can force
# the scale tier on small fixtures)
META_DRIVER_FOLD_MAX = 200_000


def _trace(label: str, t0: float) -> None:
    """Phase timing to stderr when GRAFT_TRACE is set (profiling aid;
    the bench and driver never set it)."""
    import os
    import sys

    if os.environ.get("GRAFT_TRACE"):
        print(f"[trace] {label}: {time.time() - t0:.2f}s", file=sys.stderr, flush=True)


def _narrow(batch: pa.Table) -> pa.Table:
    """Derived narrow projection — the 'parsed paths' of the pages
    schema, minus the wide payloads."""
    ntok = textfn.token_counts(batch["text"])
    tlen = pc.binary_length(batch["text"])
    dom = pc.replace_substring_regex(
        pc.replace_substring(batch["url"], "https://", ""), "/.*$", ""
    )
    cols = {
        "url": batch["url"],
        "warc_ts": batch["warc_ts"],
        "lang": batch["lang"],
        "n_tokens": pa.array(ntok, pa.int64()),
        "text_len": tlen if tlen.type == pa.int64() else pc.cast(tlen, pa.int64()),
        "domain": dom,
    }
    if "row_idx" in batch.column_names:
        cols["row_idx"] = batch["row_idx"]
    pid = _partition_ids(batch)
    if pid is not None:
        cols["partition_id"] = pa.array(pid.tolist(), pa.string())
    return pa.table(cols)


def _fresh_dir(path: str) -> None:
    """Remove a check's previous output before rewriting: re-runs
    (or a crash between write and manifest mark) must not leave
    stale UUID-named parquet files inflating violation counts
    (ADVICE r1). Local-filesystem semantics; object-store outputs
    would version the prefix instead."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def _partition_ids(batch: pa.Table) -> np.ndarray | None:
    """Per-row partition id: an explicit ``partition_id`` column, or
    the basename of a ``path`` column (``read_parquet(...,
    include_paths=True)`` lineage)."""
    import os as _os

    if "partition_id" in batch.column_names:
        return np.asarray(
            batch["partition_id"].to_numpy(zero_copy_only=False), dtype=object
        ).astype(str)
    if "path" in batch.column_names:
        paths = batch["path"].to_pylist()
        return np.array([_os.path.basename(p or "") for p in paths], dtype=object).astype(str)
    return None


def _sha_xor_of_batch(text_col, partitions: np.ndarray | None = None):
    """XOR-fold of per-row sha256. With ``partitions`` given, returns
    {partition_id: digest_bytes}; else the single fold."""
    data, off = textfn.flat_utf8(text_col)
    mv = memoryview(data)
    if partitions is None:
        acc = np.zeros(32, dtype=np.uint8)
        for i in range(len(off) - 1):
            acc ^= np.frombuffer(
                hashlib.sha256(mv[off[i] : off[i + 1]]).digest(), dtype=np.uint8
            )
        return acc.tobytes()
    accs: dict[str, np.ndarray] = {}
    for i in range(len(off) - 1):
        d = np.frombuffer(hashlib.sha256(mv[off[i] : off[i + 1]]).digest(), dtype=np.uint8)
        p = partitions[i]
        if p in accs:
            accs[p] ^= d
        else:
            accs[p] = d.copy()
    return {p: a.tobytes() for p, a in accs.items()}


def _blob_merge(acc: dict | None, p: dict) -> dict:
    """Merge one raw fit-partial dict into the accumulator.
    Charset bitmaps stay PACKED (uint8 OR ≡ packed union) until
    finalization; every field is mergeable in O(state), so the fold
    is associative — safe to run sharded + tree-style."""
    if acc is None:
        return p
    for c, st in p["stats"].items():
        acc["stats"][c] = acc["stats"][c].merge(st) if c in acc["stats"] else st
    for g, d in p["per_lang"].items():
        if g in acc["per_lang"]:
            e = acc["per_lang"][g]
            e["charset"] |= d["charset"]
            e["tok_min"] = min(e["tok_min"], d["tok_min"])
            e["tok_max"] = max(e["tok_max"], d["tok_max"])
            e["count"] += d["count"]
            e["tok_digest"].merge(d["tok_digest"])
        else:
            acc["per_lang"][g] = d
    acc["bigrams"] += p["bigrams"]
    acc["sha_xor"] = (
        np.frombuffer(acc["sha_xor"], dtype=np.uint8)
        ^ np.frombuffer(p["sha_xor"], dtype=np.uint8)
    ).tobytes()
    acc["n_rows"] += p["n_rows"]
    for pid, info in p.get("partitions", {}).items():
        if pid in acc["partitions"]:
            e = acc["partitions"][pid]
            e["n_rows"] += info["n_rows"]
            e["sha_xor"] = (
                np.frombuffer(e["sha_xor"], dtype=np.uint8)
                ^ np.frombuffer(info["sha_xor"], dtype=np.uint8)
            ).tobytes()
        else:
            acc["partitions"][pid] = dict(info)
    return acc


@ray.remote(num_cpus=0)
class _StateCollector:
    """One SHARD of the fit-state reduction: merges each incoming
    blob into its running state immediately, so a shard holds O(1)
    state (never O(#blocks) blobs) and the merge work parallelizes
    across shards; the driver folds only #shards merged states. The
    zero-CPU shards coexist with the wide pass's workers."""

    def __init__(self):
        self._acc: dict | None = None

    def add(self, blob: bytes) -> bool:
        self._acc = _blob_merge(self._acc, pickle.loads(blob))
        return True

    def rows_seen(self) -> int:
        """Row count merged so far — the drain-barrier signal for
        fire-and-forget adds (see fit_and_narrow)."""
        return int(self._acc["n_rows"]) if self._acc is not None else 0

    def get_state(self) -> bytes | None:
        return pickle.dumps(self._acc, protocol=5) if self._acc is not None else None


class FitPartials:
    """One fused per-block partial: every learned state at once.

    With ``collectors`` set (a list of shard actors), the partial
    blob is shipped to one shard (round-robin-ish by cheap entropy)
    and the NARROW projection is returned instead (fit + narrow in a
    single wide pass)."""

    def __init__(self, collectors=None):
        self.collectors = collectors

    def __call__(self, batch: pa.Table) -> pa.Table:
        nb = _narrow(batch)
        full = pa.table(
            {
                "url": nb["url"],
                "warc_ts": nb["warc_ts"],
                "text": batch["text"],
                "lang": nb["lang"],
                "n_tokens": nb["n_tokens"],
                "text_len": nb["text_len"],
            }
        )
        # per-column stats partials
        stats = {
            c: _partial_for_column(full.column(c), with_quantiles=c in ("n_tokens", "text_len"))
            for c in STAT_COLS
        }
        # per-lang charset bitmaps + token ranges + counts + tdigests
        langs = np.asarray(nb["lang"].to_numpy(zero_copy_only=False), dtype=object).astype(str)
        ntok = nb["n_tokens"].to_numpy(zero_copy_only=False)
        cps, row_id = _row_codepoints(batch["text"])
        cps = np.minimum(cps, MAX_CP - 1)
        uniq, ginv = np.unique(langs, return_inverse=True)
        cp_group = ginv[row_id] if len(row_id) else np.zeros(0, dtype=np.int64)
        per_lang: dict[str, dict] = {}
        for gi, g in enumerate(uniq):
            bm = np.zeros(MAX_CP, dtype=bool)
            bm[cps[cp_group == gi]] = True
            sel = ntok[ginv == gi]
            per_lang[str(g)] = {
                "charset": np.packbits(bm),
                "tok_min": int(sel.min()),
                "tok_max": int(sel.max()),
                "count": int(len(sel)),
                "tok_digest": TDigest.from_array(sel.astype(np.float64)),
            }
        pid = _partition_ids(batch)
        if pid is not None:
            sha_parts = _sha_xor_of_batch(batch["text"], pid)
            pvals, pcounts = np.unique(pid, return_counts=True)
            partitions = {
                str(p): {"n_rows": int(c), "sha_xor": sha_parts[str(p)]}
                for p, c in zip(pvals, pcounts)
            }
            sha_all = np.zeros(32, dtype=np.uint8)
            for d in sha_parts.values():
                sha_all ^= np.frombuffer(d, dtype=np.uint8)
            sha_all = sha_all.tobytes()
        else:
            partitions = {}
            sha_all = _sha_xor_of_batch(batch["text"])
        blob = pickle.dumps(
            {
                "stats": stats,
                "per_lang": per_lang,
                "bigrams": textfn.bigram_counts(batch["text"]),
                "sha_xor": sha_all,
                "partitions": partitions,
                "n_rows": batch.num_rows,
            },
            protocol=5,
        )
        if self.collectors is not None:
            import os as _os

            shard = int.from_bytes(_os.urandom(2), "little") % len(self.collectors)
            # fire-and-forget: no per-block round trip inside the wide
            # pass (was a sync ray.get per block — ADVICE r2). Delivery
            # is guaranteed by the driver's drain barrier: after the
            # pass materializes, fit_and_narrow polls the collectors'
            # summed rows_seen until it equals the dataset row count.
            self.collectors[shard].add.remote(blob)
            return nb
        return pa.table({"state": pa.array([blob], pa.binary())})


def fit(pages: "rd.Dataset", config: SuiteConfig | None = None) -> dict:
    """Learn pass → broadcastable constraint state dict (ONE read)."""
    state, _ = fit_and_narrow(pages, config, want_narrow=False)
    return state


def fit_and_narrow(
    pages: "rd.Dataset",
    config: SuiteConfig | None = None,
    want_narrow: bool = True,
    n_collector_shards: int = 8,
):
    """ONE wide pass returning (state, materialized narrow
    projection). The fit partials travel to ``n_collector_shards``
    zero-CPU collector shards that merge INCREMENTALLY (each holds
    one running state, not a blob list), and the driver folds only
    the #shards merged states — the #blocks-proportional memory and
    serial-merge bottleneck of a single collector is gone. The
    pass's dataset output IS the narrow table."""
    config = config or SuiteConfig()
    if not config.materialize_narrow:
        want_narrow = False  # recompute mode: no narrow in the store
    acc: dict | None = None
    narrow = None
    if want_narrow:
        _t_fit = time.time()
        collectors = [_StateCollector.remote() for _ in range(n_collector_shards)]
        narrow = pages.map_batches(
            FitPartials(collectors),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        ).materialize()
        _trace("fit.wide_pass", _t_fit)
        # drain barrier for the fire-and-forget adds: materialize()
        # guarantees every partial was SUBMITTED; poll until every
        # submitted blob has been DELIVERED and merged (summed
        # rows_seen == dataset rows, metadata-cheap on materialized).
        expected_rows = narrow.count()
        deadline = time.time() + 120.0
        while True:
            seen = sum(ray.get([c.rows_seen.remote() for c in collectors]))
            if seen >= expected_rows:
                break
            if time.time() > deadline:
                raise RuntimeError(
                    f"fit-state drain barrier timed out: collectors saw {seen} "
                    f"of {expected_rows} rows (a worker likely died with an "
                    "un-flushed partial; re-run the fit pass)"
                )
            time.sleep(0.02)
        for blob in ray.get([c.get_state.remote() for c in collectors]):
            if blob is not None:
                acc = _blob_merge(acc, pickle.loads(blob))
        for c in collectors:
            ray.kill(c)
        _trace("fit.drain+merge", _t_fit)
    else:
        partials = pages.map_batches(
            FitPartials(), batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        for b in partials.iter_batches(batch_format="pyarrow"):
            for blob in b["state"].to_pylist():
                acc = _blob_merge(acc, pickle.loads(blob))
    state = _finalize_state(acc)
    state["config"] = config
    return state, narrow


def _merge_fit_blobs(blobs: list[bytes]) -> dict:
    """Fold raw pickled partials into the finalized state dict
    (kept for tests / external callers; the pipeline itself merges
    incrementally in the collector shards)."""
    acc: dict | None = None
    for blob in blobs:
        acc = _blob_merge(acc, pickle.loads(blob))
    return _finalize_state(acc)


def filter_ts_horizon(pages: "rd.Dataset", cutoff_us: int) -> "rd.Dataset":
    """Rows with warc_ts <= cutoff — the stop_learning_time learning
    prefix (reference input/InputInterfaces.py:251-281: learn_mode
    switches off once atom_time passes the stop timestamp; the batch
    recast fits on the time prefix and validates everything against
    the frozen state)."""

    def keep(batch: pa.Table) -> pa.Table:
        ts = batch["warc_ts"].cast(pa.int64())
        return batch.filter(pc.less_equal(ts, pa.scalar(cutoff_us, pa.int64())))

    return pages.map_batches(
        keep, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def _novelty_signature(acc: dict | None) -> tuple:
    """Stable summary of the LEARNED CONSTRAINT SURFACE — the fields
    whose growth means 'the detector learned something new' in the
    reference's sense (new value-domain members, wider ranges, new
    charset members, new bigram transitions), deliberately excluding
    per-row accumulators (counts, moments, digests) that change with
    every row regardless of novelty."""
    if acc is None:
        return ()
    sig = []
    for c in sorted(acc["stats"]):
        if c == "warc_ts":
            continue  # time advances every window by construction
        m = acc["stats"][c].moments
        sig.append((c, m.min, m.max, m.n_null > 0))
    for g in sorted(acc["per_lang"]):
        d = acc["per_lang"][g]
        sig.append((g, int(np.unpackbits(d["charset"]).sum()),
                    d["tok_min"], d["tok_max"]))
    sig.append(int(np.count_nonzero(acc["bigrams"])))
    return tuple(sig)


class FitPartialsWindowed:
    """Fit partials split per warc_ts window: one (window_id, blob)
    row per block-window, so the driver can replay the learned state
    in time order for stop_learning_no_anomaly_time semantics."""

    def __init__(self, t0_us: int, window_us: int):
        self.t0_us = int(t0_us)
        self.window_us = int(window_us)
        self._fp = FitPartials()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts_a = batch["warc_ts"].cast(pa.int64())
        if ts_a.null_count:
            # null-ts rows have no place on the learning timeline;
            # they are still validated against the frozen state.
            batch = batch.filter(pc.is_valid(ts_a))
            ts_a = batch["warc_ts"].cast(pa.int64())
        ts = ts_a.to_numpy(zero_copy_only=False)
        # pre-anchor stragglers (out-of-order rows before the first
        # row's timestamp) learn in the first window
        wid = np.maximum((ts - self.t0_us) // self.window_us, 0)
        wids, blobs = [], []
        for w in np.unique(wid):
            sub = batch.filter(pa.array(wid == w))
            wids.append(int(w))
            blobs.append(self._fp(sub)["state"][0].as_py())
        return pa.table({"wid": pa.array(wids, pa.int64()),
                         "state": pa.array(blobs, pa.binary())})


def fit_stop_no_novelty(
    pages: "rd.Dataset",
    config: SuiteConfig | None,
    no_novelty_seconds: float,
    t0_us: int,
    granularity_seconds: float | None = None,
):
    """stop_learning_no_anomaly_time recast (reference
    input/InputInterfaces.py:251-281 + detector updates of
    stop_learning_timestamp): the reference extends the stop deadline
    by ``no_anomaly_time`` every time a detector learns something
    new. Batch recast: fit partials per time window (granularity
    defaults to a quarter of the horizon), replay the per-window
    merges in time order, and extend the deadline past each window
    whose merge CHANGES the constraint surface (_novelty_signature).
    Learning stops at the first deadline with no intervening novelty;
    the returned state is the merge of all windows before it.

    Scale shape: one wide pass; the driver folds only
    (#windows-in-learning-horizon) small states and never sees raw
    rows. Returns (state, cutoff_us)."""
    config = config or SuiteConfig()
    s_us = int(no_novelty_seconds * 1_000_000)
    gran_us = int((granularity_seconds or no_novelty_seconds / 4) * 1_000_000)
    gran_us = max(gran_us, 1)
    per_wid: dict[int, dict] = {}
    out = pages.map_batches(
        FitPartialsWindowed(t0_us, gran_us),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    for b in out.iter_batches(batch_format="pyarrow"):
        for w, blob in zip(b["wid"].to_pylist(), b["state"].to_pylist()):
            per_wid[w] = _blob_merge(per_wid.get(w), pickle.loads(blob))
    acc: dict | None = None
    deadline = t0_us + s_us
    sig = _novelty_signature(acc)
    for w in range(0, max(per_wid, default=-1) + 1):
        wstart = t0_us + w * gran_us
        if wstart >= deadline:
            break
        if w not in per_wid:
            continue
        acc = _blob_merge(acc, per_wid[w])
        new_sig = _novelty_signature(acc)
        if new_sig != sig:
            sig = new_sig
            deadline = max(deadline, wstart + gran_us + s_us)
    state = _finalize_state(acc)
    state["config"] = config
    return state, int(deadline)


def _finalize_state(acc: dict | None) -> dict:
    per_lang = acc["per_lang"] if acc else {}
    return {
        "partitions": acc["partitions"] if acc else {},
        "stats": acc["stats"] if acc else {},
        "charsets": {
            g: np.unpackbits(d["charset"]).astype(bool) for g, d in per_lang.items()
        },
        "ranges": {(g,): (d["tok_min"], d["tok_max"]) for g, d in per_lang.items()},
        "lang_domain": sorted(per_lang),
        "lang_counts": {g: d["count"] for g, d in per_lang.items()},
        "tok_digests": {g: d["tok_digest"] for g, d in per_lang.items()},
        "bigrams": acc["bigrams"] if acc else np.zeros(textfn.N_SYM * textfn.N_SYM, dtype=np.int64),
        "text_sha_xor": (
            np.frombuffer(acc["sha_xor"], dtype=np.uint8).tobytes().hex()
            if acc
            else (b"\x00" * 32).hex()
        ),
        "n_rows": acc["n_rows"] if acc else 0,
    }


class BroadcastChecks:
    """Fused per-row validate: lang domain, charset, entropy, token
    range + sha re-hash, against the ray.put state (read once per
    actor — AMiner's persistence-loaded detector startup)."""

    def __init__(
        self,
        state_ref,
        prob_thresh: float = 0.05,
        allowed_langs=None,
        window_seconds: int = 600,
        enabled=("lang_domain", "charset", "entropy", "token_range"),
    ):
        # 0.05 = the reference EntropyDetector default prob_thresh
        self.window_seconds = window_seconds
        self.enabled = set(enabled)
        st = ray.get(state_ref)
        self.allowed = pa.array(
            sorted(allowed_langs if allowed_langs is not None else st["lang_domain"]),
            pa.string(),
        )
        names = sorted(st["charsets"])
        self.cs_names = np.array(names)
        self.cs_bitmaps = (
            np.stack([st["charsets"][n] for n in names])
            if names
            else np.zeros((0, MAX_CP), dtype=bool)
        )
        self.ranges = st["ranges"]
        rk = sorted(self.ranges)
        self.r_names = np.array([k[0] for k in rk])
        self.r_lo = np.array([self.ranges[k][0] for k in rk], dtype=np.float64)
        self.r_hi = np.array([self.ranges[k][1] for k in rk], dtype=np.float64)
        tbl = st["bigrams"].reshape(textfn.N_SYM, textfn.N_SYM).astype(np.float64)
        tot = tbl.sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            self.cond = np.nan_to_num(tbl / tot[:, None])
        self.prob_thresh = prob_thresh

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [
            violations_table("Noop", "", [], [], [], "")
        ]  # keeps schema when nothing fires
        urls = np.asarray(batch["url"].to_numpy(zero_copy_only=False), dtype=object).astype(str)
        langs = np.asarray(batch["lang"].to_numpy(zero_copy_only=False), dtype=object).astype(str)
        pid = _partition_ids(batch)
        pids = pid if pid is not None else np.full(len(urls), "", dtype=object)

        # lang domain
        bad = pc.invert(pc.is_in(batch["lang"], value_set=self.allowed))
        bad = pc.fill_null(bad, True).to_numpy(zero_copy_only=False)
        if "lang_domain" not in self.enabled:
            bad = np.zeros_like(bad)
        if bad.any():
            idx = np.flatnonzero(bad)
            out.append(
                violations_table(
                    "NewMatchPathValueDetector",
                    "new value for path 'lang' outside learned domain",
                    urls[idx],
                    ["lang"],
                    [[l] for l in langs[idx]],
                    '{"domain": "learned"}',
                    partition_id=pids[idx],
                )
            )

        # charset per lang
        cps, row_id = _row_codepoints(batch["text"])
        if "charset" in self.enabled and len(cps) and len(self.cs_names):
            cps = np.minimum(cps, MAX_CP - 1)
            pos = np.clip(np.searchsorted(self.cs_names, langs), 0, len(self.cs_names) - 1)
            known_row = self.cs_names[pos] == langs
            in_set = self.cs_bitmaps[pos[row_id], cps]
            bad_char = (~in_set) & known_row[row_id]
            if bad_char.any():
                bad_rows = np.unique(row_id[bad_char])
                vals = []
                for r in bad_rows:
                    sel = cps[bad_char & (row_id == r)]
                    vals.append(["".join(chr(c) for c in np.unique(sel))])
                out.append(
                    violations_table(
                        "CharsetDetector",
                        "new character(s) outside learned charset",
                        urls[bad_rows],
                        ["lang", "text"],
                        vals,
                        '{"charset": "learned"}',
                        partition_id=pids[bad_rows],
                    )
                )

        # entropy score
        probs = self.cond  # alias
        score = textfn.mean_pair_prob(batch["text"], probs.reshape(-1))
        low = (
            np.flatnonzero(np.nan_to_num(score, nan=1.0) < self.prob_thresh)
            if "entropy" in self.enabled
            else np.zeros(0, dtype=np.int64)
        )
        if len(low):
            out.append(
                violations_table(
                    "EntropyDetector",
                    "character pair probability below threshold",
                    urls[low],
                    ["text"],
                    [[f"{s:.6f}"] for s in score[low]],
                    json.dumps({"prob_thresh": self.prob_thresh}),
                    partition_id=pids[low],
                )
            )

        # token range per lang
        ntok = textfn.token_counts(batch["text"]).astype(np.float64)
        if "token_range" in self.enabled and len(self.r_names):
            rpos = np.clip(np.searchsorted(self.r_names, langs), 0, len(self.r_names) - 1)
            rknown = self.r_names[rpos] == langs
            oob = rknown & ((ntok < self.r_lo[rpos]) | (ntok > self.r_hi[rpos]))
            if oob.any():
                idx = np.flatnonzero(oob)
                out.append(
                    violations_table(
                        "ValueRangeDetector",
                        "value outside learned range",
                        urls[idx],
                        ["lang", "n_tokens"],
                        [[str(int(v))] for v in ntok[idx]],
                        [
                            json.dumps({"min": float(self.r_lo[rpos[i]]), "max": float(self.r_hi[rpos[i]])})
                            for i in idx
                        ],
                        partition_id=pids[idx],
                    )
                )

        # byte-identity evidence: re-hash text, ship as meta rows
        # (one per partition present in the block)
        if pid is not None:
            sha_parts = _sha_xor_of_batch(batch["text"], pids)
            out.append(
                violations_table(
                    "__ShaXor",
                    "",
                    [d.hex() if isinstance(d, bytes) else d for d in sha_parts.values()],
                    [],
                    [[] for _ in sha_parts],
                    "",
                    partition_id=list(sha_parts.keys()),
                )
            )
        else:
            sha = _sha_xor_of_batch(batch["text"]).hex()
            out.append(violations_table("__ShaXor", "", [sha], [], [[]], ""))

        # frequency + ordering PARTIALS as meta rows — folding these
        # into the fused pass removes their dedicated shuffles: the
        # (lang, window) count table and per-domain (first/last seq,
        # inversions) fragments are tiny, and blocks partition the
        # natural row order so per-domain fragments concatenate in
        # block order (junctions fixed on the driver).
        wt = batch["warc_ts"]
        if isinstance(wt, pa.ChunkedArray):
            wt = wt.combine_chunks()
        ok_ts = pc.is_valid(wt).to_numpy(zero_copy_only=False)
        ts_us = pc.fill_null(wt.cast(pa.int64()), 0).to_numpy(zero_copy_only=False)
        win = np.floor_divide(
            np.where(ok_ts, ts_us, 0), self.window_seconds * 1_000_000
        )
        lw = np.char.add(np.char.add(langs.astype(str), "\x1f"), win.astype(str))
        uw, cw = np.unique(lw[ok_ts], return_counts=True)
        out.append(
            violations_table(
                "__WinCount", "", uw.tolist(), [],
                [[str(int(c))] for c in cw], "",
            )
        )
        if "row_idx" not in batch.column_names:
            # no global sequence → per-domain fragments cannot be
            # stitched meaningfully across blocks; emit no ordering
            # partials (validate() records the check as skipped)
            return pa.concat_tables(out)
        dom = np.asarray(
            pc.replace_substring_regex(
                pc.replace_substring(batch["url"], "https://", ""), "/.*$", ""
            ).to_numpy(zero_copy_only=False),
            dtype=object,
        ).astype(str)
        seq = batch["row_idx"].to_numpy(zero_copy_only=False)
        d_ok = dom[ok_ts]
        s_ok = seq[ok_ts]
        t_ok = ts_us[ok_ts]
        order = np.lexsort((s_ok, d_ok))
        ds_, ss_, tt_ = d_ok[order], s_ok[order], t_ok[order]
        same = ds_[1:] == ds_[:-1]
        inv = same & (np.diff(tt_) < 0)
        starts = np.flatnonzero(np.concatenate([[True], ~same]))
        ends = np.concatenate([starts[1:], [len(ds_)]])
        cs = np.concatenate([[0], np.cumsum(inv)])
        counts = cs[np.maximum(ends - 1, starts)] - cs[starts]
        frag_keys = ds_[starts]
        frag_vals = [
            [str(int(c)), str(int(ss_[a])), str(int(tt_[a])), str(int(tt_[b - 1]))]
            for c, a, b in zip(counts, starts, ends)
        ]
        out.append(
            violations_table("__OrdFrag", "", frag_keys, [], frag_vals, "")
        )
        return pa.concat_tables(out)


def validate(
    pages: "rd.Dataset",
    state: dict,
    ts_index: "rd.Dataset | None" = None,
    out_dir: str | None = None,
    resume: bool = True,
    allowed_langs: list[str] | None = None,
    narrow: "rd.Dataset | None" = None,
    raw_pages: "rd.Dataset | None" = None,
) -> dict:
    config: SuiteConfig = state.get("config") or SuiteConfig()
    manifest = CheckpointManifest(out_dir) if out_dir else None
    ignore_langs = list(state.get("ignore_langs") or [])
    if ignore_langs:
        # blocklisted langs are OMITTED from analysis entirely (the
        # reference's ignore-list semantics: blocklisted events are
        # not analyzed, not flagged — ValueRangeDetector.py:205-222)
        skip = pa.array(ignore_langs, pa.string())

        def _drop_ignored(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(pc.fill_null(pc.is_in(batch["lang"], value_set=skip), False))
            )

        pages = pages.map_batches(
            _drop_ignored, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
        narrow = None  # any materialized narrow predates the filter
    state_ref = ray.put(
        {k: state[k] for k in ("lang_domain", "charsets", "ranges", "bigrams")}
    )
    if allowed_langs is None:
        allowed_langs = [l for l in state["lang_domain"] if l != "xx"]

    verdict_rows: list[tuple] = []
    results: dict[str, object] = {}

    def run_check(name: str, maker):
        """Execute one check (dataset-producing thunk) with
        checkpoint/resume bookkeeping; returns row count."""
        if manifest and resume and manifest.is_done(name):
            e = manifest.entry(name)
            verdict_rows.append((name, e.get("pass_", True), e.get("n_violations", 0), e.get("metrics", "{}")))
            results[name] = None
            return e.get("n_violations", 0)
        t0 = time.time()
        vds = maker()
        if out_dir:
            path = f"{out_dir}/check={name}"
            _fresh_dir(path)
            vds.write_parquet(path)
            import pyarrow.dataset as pads

            try:
                n_viol = pads.dataset(path).count_rows()
            except FileNotFoundError:
                n_viol = 0
        else:
            vds = vds.materialize()
            n_viol = vds.count()
        metrics = json.dumps({"seconds": round(time.time() - t0, 3)})
        if manifest:
            manifest.mark_done(name, n_violations=int(n_viol), metrics=metrics, pass_=bool(n_viol == 0))
        verdict_rows.append((name, n_viol == 0, int(n_viol), metrics))
        results[name] = vds
        return n_viol

    # declarative per-check parameters + toggles (YAML config path,
    # config.py — ConfigValidator-validated upstream)
    ck = config.checks or {}

    def _on(name: str) -> bool:
        return bool(ck.get(name, {}).get("enabled", True))

    fused_enabled = tuple(
        c for c in ("lang_domain", "charset", "entropy", "token_range") if _on(c)
    )
    prob_thresh = float(ck.get("entropy", {}).get("prob_thresh", 0.05))
    confidence_factor = float(ck.get("frequency", {}).get("confidence_factor", 0.33))

    # ---- fused per-row pass (one read of the wide table) ----
    fused_name = "broadcast_checks"
    # ---- keyed checks (uniqueness/referential) overlap the fused
    # pass: they read the already-materialized NARROW projection and
    # are shuffle-bound, while the fused pass is compute-bound — two
    # concurrent streaming jobs share the CPUs without contending on
    # the same bottleneck (measured: hides ~4 s of the suite). Only
    # this thread touches the manifest until it is joined below.
    import threading

    _keyed_err: list[BaseException] = []
    keyed_thread = None
    if narrow is not None and (_on("uniqueness") or (ts_index is not None and _on("referential"))):

        def _keyed_checks():
            try:
                if _on("uniqueness"):
                    run_check(
                        "uniqueness_url",
                        lambda: uniq_stage.uniqueness_violations(
                            narrow.select_columns(["url"]), "url"
                        ),
                    )
                if ts_index is not None and _on("referential"):
                    run_check(
                        "referential_url_ts",
                        lambda: ref_stage.referential_violations(
                            narrow.select_columns(["url"]), "url", ts_index, "url"
                        ),
                    )
            except BaseException as ex:  # re-raised on the main thread
                _keyed_err.append(ex)

        keyed_thread = threading.Thread(target=_keyed_checks, name="keyed-checks")
        keyed_thread.start()

    # task-based with per-worker state cache — measured 3x faster
    # than the autoscaling actor pool on the 400k-row bench input
    # (see stages/_taskcache.py for the why)
    _t_fused = time.time()
    fused = pages.map_batches(
        cached_task_fn(
            BroadcastChecks,
            state_ref=state_ref,
            allowed_langs=allowed_langs,
            window_seconds=config.window_seconds,
            prob_thresh=prob_thresh,
            enabled=fused_enabled,
        ),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).materialize()
    _trace("validate.fused_pass", _t_fused)

    # ---- optional extraction-faithfulness check (the north-star
    # per-row invariant: text == extract(html), byte-identical).
    # Opt-in (checks.extraction.enabled) because it re-reads the wide
    # html column the suite otherwise prunes before every pass; one
    # zero-copy RE2-chain pass, violations only are emitted.
    if raw_pages is not None and bool(
        ck.get("extraction", {}).get("enabled", False)
    ):
        from ..functions.html import extract_text_array

        def _extraction_violations():
            def f(t: pa.Table) -> pa.Table:
                got = extract_text_array(t["html"])
                bad = pc.fill_null(pc.not_equal(got, t["text"]), True)
                v = t.filter(bad)
                ve = pc.filter(got, bad)  # kernel handles chunked masks
                return pa.table({
                    "url": v["url"],
                    "text_len": pc.utf8_length(v["text"]).cast(pa.int64()),
                    "extracted_len": pc.utf8_length(ve).cast(pa.int64()),
                })

            return raw_pages.select_columns(
                ["url", "html", "text"]
            ).map_batches(
                f, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True,
            )

        run_check("extraction_faithful", _extraction_violations)
    # Meta rows reduce INSIDE the dataset (per-block partials + one
    # tiny groupby each) — the driver touches only the aggregated
    # results, never a data-proportional row stream (violations
    # scale with input; at 100× a driver loop over them stalls the
    # pipeline). The fused output is materialized once; each
    # reduction below re-reads the stored blocks.
    import pandas as _pd

    META = [
        "Analysis.__ShaXor",
        "Analysis.Noop",
        "Analysis.__WinCount",
        "Analysis.__OrdFrag",
    ]
    meta_set = pa.array(META)

    # ONE reduction job computes all four driver tables (violation
    # counts, per-partition sha-xor, window counts, ordering
    # fragments). Four separate groupby jobs over the same fused
    # output cost ~3-4 s of fixed executor/shuffle overhead EACH
    # (measured: ~17 s of a 31 s validate); one pass + one shuffle
    # does the same work. Keys are folded under a composite
    # (kind, crc32(key) % N_META_BUCKETS) group key — bounded group
    # count for map_groups, bounded per-group size at scale (each
    # group holds ~1/N of one kind's keys, never the whole dataset).
    import zlib

    N_META_BUCKETS = 32

    def _typed(df: _pd.DataFrame, cols: dict) -> _pd.DataFrame:
        # empty Datasets lose their schema through to_pandas — give
        # all-empty reductions their typed columns back
        if df.empty and list(df.columns) != list(cols):
            return _pd.DataFrame({c: _pd.Series(dtype=t) for c, t in cols.items()})
        return df

    def _meta_partial(t: pa.Table) -> pa.Table:
        kinds: list[str] = []
        keys: list[str] = []
        i1: list[int] = []; i2: list[int] = []; i3: list[int] = []; i4: list[int] = []
        s1: list[str] = []

        def emit(kind, key, a=0, b=0, c=0, d=0, s=""):
            kinds.append(kind); keys.append(key)
            i1.append(a); i2.append(b); i3.append(c); i4.append(d); s1.append(s)

        et = t["event_type"]
        # violation counts partial per (check, partition)
        t2 = t.filter(pc.invert(pc.is_in(et, value_set=meta_set)))
        g = (
            t2.select(["event_type", "partition_id"])
            .group_by(["event_type", "partition_id"])
            .aggregate([([], "count_all")])
        )
        for e, p, n in zip(
            g.column(0).to_pylist(), g.column(1).to_pylist(), g.column(2).to_pylist()
        ):
            emit("cnt", f"{e}\x1f{p}", int(n))
        # sha meta rows (already one per partition per block)
        sh = t.filter(pc.equal(et, "Analysis.__ShaXor"))
        for p, h in zip(sh["partition_id"].to_pylist(), sh["key"].to_pylist()):
            emit("sha", p, s=h)
        # (lang, window) counts
        w = t.filter(pc.equal(et, "Analysis.__WinCount"))
        for k, av in zip(w["key"].to_pylist(), w["affected_values"].to_pylist()):
            emit("win", k, int(av[0]))
        # per-domain ordering fragments
        o = t.filter(pc.equal(et, "Analysis.__OrdFrag"))
        for k, av in zip(o["key"].to_pylist(), o["affected_values"].to_pylist()):
            emit("frag", k, int(av[0]), int(av[1]), int(av[2]), int(av[3]))

        # crc32, not hash(): Python's str hash is salted per process
        bucket = [zlib.crc32(k.encode()) % N_META_BUCKETS for k in keys]
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "bucket": pa.array(bucket, pa.int32()),
                "key": pa.array(keys, pa.string()),
                "i1": pa.array(i1, pa.int64()),
                "i2": pa.array(i2, pa.int64()),
                "i3": pa.array(i3, pa.int64()),
                "i4": pa.array(i4, pa.int64()),
                "s1": pa.array(s1, pa.string()),
            }
        )

    _META_OUT = pa.schema(
        [("kind", pa.string()), ("key", pa.string()), ("n", pa.int64()), ("s", pa.string())]
    )

    def _meta_fold(g: _pd.DataFrame) -> pa.Table:
        ok, oky, on, os_ = [], [], [], []
        for (kind, key), sub in g.groupby(["kind", "key"], sort=False):
            if kind in ("cnt", "win"):
                ok.append(kind); oky.append(key); on.append(int(sub["i1"].sum())); os_.append("")
            elif kind == "sha":
                acc = np.zeros(32, dtype=np.uint8)
                for h in sub["s1"]:
                    acc ^= np.frombuffer(bytes.fromhex(h), dtype=np.uint8)
                ok.append(kind); oky.append(key); on.append(0); os_.append(acc.tobytes().hex())
            else:  # frag: stitch by first_seq, count junction inversions
                sub = sub.sort_values("i2", kind="mergesort")
                total = int(sub["i1"].sum())
                lt = sub["i4"].to_numpy()
                ft = sub["i3"].to_numpy()
                total += int((ft[1:] < lt[:-1]).sum())
                if total == 0:
                    continue
                ok.append(kind); oky.append(key); on.append(total); os_.append("")
        if not ok:
            return _META_OUT.empty_table()
        return pa.table(
            {"kind": pa.array(ok, pa.string()), "key": pa.array(oky, pa.string()),
             "n": pa.array(on, pa.int64()), "s": pa.array(os_, pa.string())}
        )

    _t_meta = time.time()
    _META_TYPES = {"kind": object, "key": object, "n": np.int64, "s": object}
    parts = fused.map_batches(
        _meta_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    n_parts = parts.count()
    if n_parts == 0:
        meta_df = _pd.DataFrame({c: _pd.Series(dtype=t) for c, t in _META_TYPES.items()})
    elif n_parts <= META_DRIVER_FOLD_MAX:
        # bounded driver fold: the partial rows are per-block
        # aggregates (#blocks × per-block key count); under the bound
        # a pandas fold beats the all-to-all's fixed cost (~3 s of
        # executor/shuffle overhead for 100-odd tiny groups). Beyond
        # it — millions of blocks at cluster scale — the composite
        # (kind, crc32(key) % N) groupby below keeps every group
        # bounded and the driver out of the data path.
        meta_df = _typed(
            _meta_fold(parts.to_pandas()).to_pandas(), _META_TYPES
        )
    else:
        meta_df = _typed(
            parts.groupby(["kind", "bucket"])
            .map_groups(_meta_fold, batch_format="pandas")
            .to_pandas(),
            _META_TYPES,
        )
    _trace("validate.meta_reduction", _t_meta)

    cnt_rows = meta_df[meta_df["kind"] == "cnt"]
    per_check_counts: dict[str, int] = {}
    per_part_counts: dict[tuple[str, str], int] = {}
    for k, n in zip(cnt_rows["key"], cnt_rows["n"]):
        e, p = k.split("\x1f", 1)
        per_part_counts[(e, p)] = int(n)
        per_check_counts[e] = per_check_counts.get(e, 0) + int(n)

    sha_rows = meta_df[meta_df["kind"] == "sha"]
    sha_parts_after: dict[str, np.ndarray] = {
        p: np.frombuffer(bytes.fromhex(h), dtype=np.uint8)
        for p, h in zip(sha_rows["key"], sha_rows["s"])
    }
    sha_after = np.zeros(32, dtype=np.uint8)
    for v in sha_parts_after.values():
        sha_after = sha_after ^ v

    win_rows = meta_df[meta_df["kind"] == "win"]
    win_counts: dict[tuple[str, int], int] = {}
    for k, n in zip(win_rows["key"], win_rows["n"]):
        lang, win = k.rsplit("\x1f", 1)
        win_counts[(lang, int(win))] = int(n)

    frag_rows = meta_df[meta_df["kind"] == "frag"]
    ord_df = _pd.DataFrame(
        {"domain": frag_rows["key"].astype(str), "n_inversions": frag_rows["n"].astype(np.int64)}
    ).reset_index(drop=True)

    real = fused.map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t["event_type"], value_set=pa.array(META)))
        ),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    t0 = time.time()
    if out_dir:
        _fresh_dir(f"{out_dir}/check={fused_name}")
        real.write_parquet(f"{out_dir}/check={fused_name}")
    for cname in ("NewMatchPathValueDetector", "CharsetDetector", "EntropyDetector", "ValueRangeDetector"):
        short = {
            "NewMatchPathValueDetector": "lang_domain",
            "CharsetDetector": "charset",
            "EntropyDetector": "entropy",
            "ValueRangeDetector": "token_range",
        }[cname]
        if short not in fused_enabled:
            continue
        n = per_check_counts.get(f"Analysis.{cname}", 0)
        verdict_rows.append((short, n == 0, n, json.dumps({"fused": True})))
    results[fused_name] = real

    sha_ok = sha_after.tobytes().hex() == state["text_sha_xor"]
    verdict_rows.append(
        ("text_byte_identity", sha_ok, 0 if sha_ok else 1, json.dumps({"sha_xor": sha_after.tobytes().hex()}))
    )

    # ---- keyed checks over the narrow projection (no text/html):
    # already running in the overlap thread when the fit pass
    # provided a materialized narrow; otherwise (frozen-state path,
    # narrow=None) derive it and run them serially here ----
    if keyed_thread is not None:
        _t_keyed = time.time()
        keyed_thread.join()
        _trace("validate.keyed_join_wait", _t_keyed)
        if _keyed_err:
            raise _keyed_err[0]
    else:
        if narrow is None:
            narrow = pages.map_batches(
                _narrow, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            ).materialize()
        if _on("uniqueness"):
            run_check(
                "uniqueness_url",
                lambda: uniq_stage.uniqueness_violations(narrow.select_columns(["url"]), "url"),
            )
        if ts_index is not None and _on("referential"):
            run_check(
                "referential_url_ts",
                lambda: ref_stage.referential_violations(
                    narrow.select_columns(["url"]), "url", ts_index, "url"
                ),
            )
    # frequency + ordering come straight from the fused pass's meta
    # partials (no extra shuffle): zero-filled per-lang window band,
    # and per-domain fragment merge with junction fixup.
    # PARTITIONING ASSUMPTION (ordering): a domain's fragments are
    # stitched by their first row_idx, which equals the global
    # adjacent-pair definition iff blocks cover non-interleaving seq
    # ranges — true for append-ordered ingest (our parquet layout);
    # for arbitrarily shuffled input use
    # stages/ordering.inversion_counts_sorted (global sort) instead.
    import pandas as pd

    def _freq_tables():
        rows_a, rows_e = [], []
        langs_w = sorted({k[0] for k in win_counts})
        for lang in langs_w:
            wins = {k[1]: v for k, v in win_counts.items() if k[0] == lang}
            wmin, wmax = min(wins), max(wins)
            full = np.arange(wmin, wmax + 1, dtype=np.int64)
            cnt = np.array([wins.get(int(w), 0) for w in full], dtype=np.float64)
            mean, std = float(cnt.mean()), float(cnt.std())
            lower, upper = mean - std / confidence_factor, mean + std / confidence_factor
            anom = (cnt < lower) | (cnt > upper)
            empty = cnt == 0
            for w, c, a, em in zip(full, cnt, anom, empty):
                if a:
                    rows_a.append((lang, int(w), int(c), lower, upper))
                if em:
                    rows_e.append((lang, int(w)))
        # typed Arrow tables (schema survives empty results; avoids
        # pandas object-column blocks in Ray's size estimation)
        fa = pa.table(
            {"lang": pa.array([r[0] for r in rows_a], pa.string()),
             "window": pa.array([r[1] for r in rows_a], pa.int64()),
             "n": pa.array([r[2] for r in rows_a], pa.int64()),
             "lower": pa.array([r[3] for r in rows_a], pa.float64()),
             "upper": pa.array([r[4] for r in rows_a], pa.float64())}
        )
        fe = pa.table(
            {"lang": pa.array([r[0] for r in rows_e], pa.string()),
             "window": pa.array([r[1] for r in rows_e], pa.int64())}
        )
        return fa, fe

    freq_tab, empty_tab = _freq_tables()
    if _on("frequency"):
        run_check("frequency", lambda: rd.from_arrow(freq_tab))
    if _on("empty_windows"):
        run_check("empty_windows", lambda: rd.from_arrow(empty_tab))

    has_row_idx = "row_idx" in pages.schema().base_schema.names
    if not _on("ordering"):
        pass
    elif has_row_idx:
        run_check(
            "ordering",
            lambda: rd.from_arrow(
                pa.table(
                    {"domain": pa.array(ord_df["domain"].astype(str) if len(ord_df) else [], pa.string()),
                     "n_inversions": pa.array(ord_df["n_inversions"].to_numpy(np.int64) if len(ord_df) else [], pa.int64())}
                )
            ),
        )
    else:
        # no global sequence column → block-local ordering would be
        # meaningless (ADVICE r1): record an explicit skip instead of
        # a silently-wrong pass. Callers with unordered input should
        # run stages/ordering.inversion_counts over a real order key.
        verdict_rows.append(
            ("ordering", True, 0, json.dumps({"skipped": "no row_idx column (no global sequence)"}))
        )

    # KS drift on n_tokens across langs from the fit-pass digests;
    # honors checks.ks_drift.{enabled,min_effect} from the YAML config
    import pandas as pd

    ksdf = pd.DataFrame(
        {"lang": pd.Series(dtype=object), "ks_stat": pd.Series(dtype=float),
         "critical": pd.Series(dtype=float), "drift": pd.Series(dtype=bool),
         "n": pd.Series(dtype=np.int64)}
    )
    if _on("ks_drift"):
        from ..stages.drift import ks_2samp_from_sorted, ks_critical

        min_effect = float(ck.get("ks_drift", {}).get("min_effect", 0.15))
        digests = state["tok_digests"]
        counts = state["lang_counts"]
        qs = (np.arange(256) + 0.5) / 256
        pooled = TDigest()
        for d in digests.values():
            pooled.merge(TDigest(d.delta, d.means.copy(), d.weights.copy()))
        bq = np.sort(pooled.quantile(qs))
        m = sum(counts.values())
        ks_rows = []
        for g in sorted(digests):
            a = np.sort(digests[g].quantile(qs))
            d_stat = ks_2samp_from_sorted(a, bq)
            crit = ks_critical(counts[g], m)
            ks_rows.append((g, d_stat, crit, bool(d_stat > max(crit, min_effect)), counts[g]))
        ksdf = pd.DataFrame(ks_rows, columns=["lang", "ks_stat", "critical", "drift", "n"])
        n_drift = int(ksdf["drift"].sum())
        verdict_rows.append(
            ("ks_drift_lang_tokens", n_drift == 0, n_drift, ksdf.to_json(orient="records"))
        )

    # canonical verdict order: with the keyed checks running on an
    # overlap thread their completion order is nondeterministic —
    # report rows in a fixed order regardless
    _CANON = [
        "lang_domain", "charset", "entropy", "token_range",
        "text_byte_identity", "uniqueness_url", "referential_url_ts",
        "frequency", "empty_windows", "ordering", "ks_drift_lang_tokens",
    ]
    verdict_rows.sort(
        key=lambda r: (_CANON.index(r[0]) if r[0] in _CANON else len(_CANON), r[0])
    )

    n_rows_total = state.get("n_rows", 0)
    rows: list[dict] = [
        {
            "partition_id": "all",
            "check": r[0],
            "pass": bool(r[1]),
            "n_rows": n_rows_total,
            "n_violations": int(r[2]),
            "metrics": str(r[3]),
            "lineage": json.dumps({"source": "pages"}),
            "text_sha256_xor": state["text_sha_xor"],
        }
        for r in verdict_rows
    ]
    # per-partition verdicts (north rule: per-partition pass/fail,
    # lineage = input file, byte-identity evidence per partition)
    short_names = {
        "Analysis.NewMatchPathValueDetector": "lang_domain",
        "Analysis.CharsetDetector": "charset",
        "Analysis.EntropyDetector": "entropy",
        "Analysis.ValueRangeDetector": "token_range",
    }
    for pid, info in sorted(state.get("partitions", {}).items()):
        sha_fit = info["sha_xor"].hex() if isinstance(info["sha_xor"], bytes) else info["sha_xor"]
        sha_val = sha_parts_after.get(pid)
        sha_val_hex = sha_val.tobytes().hex() if sha_val is not None else ""
        for full, short in short_names.items():
            n = per_part_counts.get((full, pid), 0)
            rows.append(
                {
                    "partition_id": pid,
                    "check": short,
                    "pass": n == 0,
                    "n_rows": int(info["n_rows"]),
                    "n_violations": int(n),
                    "metrics": "{}",
                    "lineage": json.dumps({"file": pid}),
                    "text_sha256_xor": sha_fit,
                }
            )
        rows.append(
            {
                "partition_id": pid,
                "check": "text_byte_identity",
                "pass": sha_val_hex == sha_fit,
                "n_rows": int(info["n_rows"]),
                "n_violations": 0 if sha_val_hex == sha_fit else 1,
                "metrics": json.dumps({"sha_xor_validate": sha_val_hex}),
                "lineage": json.dumps({"file": pid}),
                "text_sha256_xor": sha_fit,
            }
        )
    verdicts = pa.table(
        {f.name: pa.array([r[f.name] for r in rows], f.type) for f in VERDICT_SCHEMA},
        schema=VERDICT_SCHEMA,
    )
    return {"violations": results, "verdicts": verdicts, "ks_drift": ksdf}


# every column the two wide passes touch; anything else (html, the
# heaviest payload) is pruned before the wide work. NOTE:
# ``select_columns`` pushes its projection into the Parquet scan,
# which silently DROPS the synthetic ``path`` lineage column that
# ``include_paths=True`` adds — use ``drop_columns`` of the unused
# names instead (callers reading from Parquet themselves should
# additionally pass ``columns=[...]`` for true scan pushdown).
_SUITE_COLS = ("url", "warc_ts", "text", "lang", "row_idx", "path", "partition_id")


def prune_to_suite_columns(pages: "rd.Dataset") -> "rd.Dataset":
    sch = pages.schema()
    names = sch.base_schema.names if sch is not None else []
    extra = [c for c in names if c not in _SUITE_COLS]
    if extra:
        return pages.drop_columns(extra)
    return pages


def run_suite(
    pages: "rd.Dataset",
    ts_index: "rd.Dataset | None" = None,
    out_dir: str | None = None,
    config: SuiteConfig | None = None,
) -> dict:
    raw = pages
    pages = prune_to_suite_columns(pages)
    state, narrow = fit_and_narrow(pages, config)
    ext_on = bool(
        ((config.checks if config else None) or {})
        .get("extraction", {}).get("enabled", False)
    )
    out = validate(
        pages, state, ts_index=ts_index, out_dir=out_dir, narrow=narrow,
        raw_pages=raw if ext_on else None,
    )
    out["state"] = state
    return out


# backwards-compatible single-stage derive (used by tests/queries)
def derive(ds: "rd.Dataset") -> "rd.Dataset":
    def add(batch: pa.Table) -> pa.Table:
        nb = _narrow(batch)
        out = batch
        for name in ("n_tokens", "text_len", "domain"):
            out = out.append_column(name, nb[name])
        return out

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

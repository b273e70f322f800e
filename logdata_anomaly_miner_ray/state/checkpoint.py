"""Per-partition / per-check checkpoint manifest for resumable runs.

AMiner persists detector state every 600 s and keeps stream
repositioning data so a restarted child resumes where it left off
(reference: aminer/util/PersistenceUtil.py:84-130,
aminer/input/LogStream.py:30-176, atomic tmp+replace write protocol
PersistenceUtil.py:116-130). The batch analogue: each completed unit
of output (a check, or a partition of a check) gets a manifest entry
with its lineage + metrics, written atomically (tmp file + rename);
a rerun consults the manifest and skips completed units.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any


class CheckpointManifest:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "manifest.json")
        self._entries: dict[str, dict[str, Any]] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._entries = json.load(f)

    def is_done(self, unit: str) -> bool:
        return unit in self._entries

    def entry(self, unit: str) -> dict[str, Any] | None:
        return self._entries.get(unit)

    def mark_done(self, unit: str, **info: Any) -> None:
        self._entries[unit] = {"completed_at": time.time(), **info}
        self._flush()

    def reset(self, unit: str | None = None) -> None:
        if unit is None:
            self._entries = {}
        else:
            self._entries.pop(unit, None)
        self._flush()

    def _flush(self) -> None:
        # atomic replace, mirroring the reference's tmp+rename protocol
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(self._entries, f, indent=1, sort_keys=True)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise


STATE_FORMAT_VERSION = 1
# file magic written before the pickle payload: load_state refuses
# files without it instead of unpickling arbitrary bytes
_STATE_MAGIC = b"LAMRAY-STATE\x01"


def save_state(state: dict, path: str) -> None:
    """Persist a fit pass's merged constraint state (the engine's
    analogue of AMiner's PersistenceUtil store of learned detector
    state, aminer/util/PersistenceUtil.py) — written atomically
    (tmp + rename) so a crash never leaves a torn state file.

    SECURITY: the payload is pickle (it carries numpy arrays and
    sketch objects); loading executes the pickle, so ``--state``
    files must come from a TRUSTED source — treat them like code,
    not like data. The magic prefix only guards against loading the
    wrong kind of file, not against a malicious one."""
    import os
    import pickle

    payload = {"format": STATE_FORMAT_VERSION, "state": state}
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(_STATE_MAGIC)
        pickle.dump(payload, f, protocol=5)
    os.replace(tmp, path)


def load_state(path: str) -> dict:
    """Load a persisted constraint state; refuses files without the
    state magic (never unpickles arbitrary bytes) and unknown format
    versions instead of mis-validating with half-read constraints.
    Only load files you trust — see ``save_state``."""
    import pickle

    with open(path, "rb") as f:
        magic = f.read(len(_STATE_MAGIC))
        if magic != _STATE_MAGIC:
            raise ValueError(
                f"{path!r} is not a saved constraint-state file (bad magic)"
            )
        payload = pickle.load(f)
    if not isinstance(payload, dict) or payload.get("format") != STATE_FORMAT_VERSION:
        raise ValueError(
            f"unsupported state file format: {payload.get('format') if isinstance(payload, dict) else type(payload)}"
        )
    return payload["state"]


def patch_state(state: dict, allow: list[str] = (), block: list[str] = ()) -> list[str]:
    """Allowlist/blocklist mutation of a persisted constraint state —
    the batch analogue of the reference's remote-control
    allowlist_event/blocklist_event (reference:
    aminer/analysis/ValueRangeDetector.py:184-222: allowlisting adds
    the item to the learned constraints and removes it from the
    ignore list; blocklisting adds it to the ignore list and removes
    it from the constraints, so those records are OMITTED from
    analysis rather than flagged).

    Spec strings (repeatable):
      allow: ``lang:L``              add L to the learned lang domain
             ``token_range:L:MIN:MAX``  widen L's token range to
                                        cover [MIN, MAX]
             ``charset:L:CHARS``     mark CHARS as known for L
      block: ``lang:L``              drop L from the domain and add
                                     it to ignore_langs (rows in L
                                     are skipped by validation)
    Mutates ``state`` in place; returns human-readable messages.
    """
    import numpy as np

    msgs: list[str] = []
    ignore = state.setdefault("ignore_langs", [])

    def _parse(spec: str, kind: str) -> list[str]:
        parts = spec.split(":")
        if not parts or parts[0] not in ("lang", "token_range", "charset"):
            raise ValueError(
                f"{kind} spec {spec!r}: expected lang:L | "
                f"token_range:L:MIN:MAX | charset:L:CHARS")
        return parts

    for spec in allow:
        parts = _parse(spec, "allow")
        if parts[0] == "lang":
            lang = parts[1]
            if lang not in state["lang_domain"]:
                state["lang_domain"] = sorted(state["lang_domain"] + [lang])
            if lang in ignore:
                ignore.remove(lang)
            msgs.append(f"Allowlisted lang {lang}.")
        elif parts[0] == "token_range":
            if len(parts) != 4:
                raise ValueError(f"allow spec {spec!r}: token_range:L:MIN:MAX")
            lang, lo, hi = parts[1], int(parts[2]), int(parts[3])
            cur = state["ranges"].get((lang,))
            state["ranges"][(lang,)] = (
                min(lo, cur[0]) if cur else lo,
                max(hi, cur[1]) if cur else hi,
            )
            msgs.append(f"Widened token range for {lang} to cover [{lo}, {hi}].")
        else:  # charset
            if len(parts) < 3:
                raise ValueError(f"allow spec {spec!r}: charset:L:CHARS")
            lang, chars = parts[1], ":".join(parts[2:])
            bm = state["charsets"].get(lang)
            if bm is None:
                raise ValueError(f"allow spec {spec!r}: unknown lang {lang!r}")
            cps = np.array([ord(c) for c in chars], dtype=np.int64)
            cps = cps[cps < len(bm)]
            bm[cps] = True
            msgs.append(f"Allowlisted {len(cps)} codepoints for {lang}.")

    for spec in block:
        parts = _parse(spec, "block")
        if parts[0] != "lang":
            raise ValueError(
                f"block spec {spec!r}: only lang:L can be blocklisted")
        lang = parts[1]
        if lang not in ignore:
            ignore.append(lang)
        if lang in state["lang_domain"]:
            state["lang_domain"] = [l for l in state["lang_domain"] if l != lang]
        msgs.append(f"Blocklisted lang {lang}.")
    return msgs

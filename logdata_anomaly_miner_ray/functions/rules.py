"""Composable predicate rules compiled to vectorized Arrow kernels.

Clean-room recast of AMiner's match-rule engine (reference:
aminer/analysis/Rules.py:36-894): AndMatchRule :130, OrMatchRule
:177, NegationMatchRule :350, PathExistsMatchRule :379,
ValueMatchRule :412, ValueListMatchRule :461, ValueRangeMatchRule
:505, StringRegexMatchRule :556, ModuloTimeMatchRule :596,
IPv4InRFC1918MatchRule :797. AMiner evaluates them per atom against
the match dictionary; here each rule compiles once into a function
``pa.Table -> pa.BooleanArray`` evaluated per batch with
pyarrow.compute — the AllowlistViolationDetector
(aminer/analysis/AllowlistViolationDetector.py:22-96) becomes
"rows where no allowlist rule matches".
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class Rule:
    def evaluate(self, batch: pa.Table) -> pa.Array:  # boolean mask
        raise NotImplementedError

    def __and__(self, other: "Rule") -> "Rule":
        return AndRule([self, other])

    def __or__(self, other: "Rule") -> "Rule":
        return OrRule([self, other])

    def __invert__(self) -> "Rule":
        return NotRule(self)


def _false(n: int) -> pa.Array:
    return pa.array(np.zeros(n, dtype=bool))


@dataclass
class AndRule(Rule):
    rules: Sequence[Rule]

    def evaluate(self, batch: pa.Table) -> pa.Array:
        m = self.rules[0].evaluate(batch)
        for r in self.rules[1:]:
            m = pc.and_kleene(m, r.evaluate(batch))
        return pc.fill_null(m, False)


@dataclass
class OrRule(Rule):
    rules: Sequence[Rule]

    def evaluate(self, batch: pa.Table) -> pa.Array:
        m = self.rules[0].evaluate(batch)
        for r in self.rules[1:]:
            m = pc.or_kleene(m, r.evaluate(batch))
        return pc.fill_null(m, False)


@dataclass
class NotRule(Rule):
    rule: Rule

    def evaluate(self, batch: pa.Table) -> pa.Array:
        return pc.fill_null(pc.invert(self.rule.evaluate(batch)), False)


@dataclass
class PathExistsRule(Rule):
    """Column present AND non-null (a 'path matched' in AMiner)."""

    path: str

    def evaluate(self, batch: pa.Table) -> pa.Array:
        if self.path not in batch.column_names:
            return _false(batch.num_rows)
        return pc.is_valid(batch[self.path])


@dataclass
class ValueMatchRule(Rule):
    path: str
    value: Any

    def evaluate(self, batch: pa.Table) -> pa.Array:
        if self.path not in batch.column_names:
            return _false(batch.num_rows)
        return pc.fill_null(pc.equal(batch[self.path], pa.scalar(self.value)), False)


@dataclass
class ValueListRule(Rule):
    path: str
    values: Sequence[Any]

    def evaluate(self, batch: pa.Table) -> pa.Array:
        if self.path not in batch.column_names:
            return _false(batch.num_rows)
        return pc.fill_null(
            pc.is_in(batch[self.path], value_set=pa.array(list(self.values))), False
        )


@dataclass
class ValueRangeRule(Rule):
    path: str
    lower: float
    upper: float  # inclusive bounds, like the reference

    def evaluate(self, batch: pa.Table) -> pa.Array:
        if self.path not in batch.column_names:
            return _false(batch.num_rows)
        c = batch[self.path]
        return pc.fill_null(
            pc.and_(pc.greater_equal(c, self.lower), pc.less_equal(c, self.upper)),
            False,
        )


@dataclass
class StringRegexRule(Rule):
    path: str
    pattern: str

    def evaluate(self, batch: pa.Table) -> pa.Array:
        if self.path not in batch.column_names:
            return _false(batch.num_rows)
        return pc.fill_null(
            pc.match_substring_regex(pc.cast(batch[self.path], pa.string()), self.pattern),
            False,
        )


def _mod_seconds(col, modulo: int, tz_offset_s: float) -> np.ndarray:
    """float seconds-within-period per row of a timestamp/int64-us
    column, NaN where null — the reference computes ``(epoch_secs +
    utcoffset) % modulo`` in Python floats (Rules.py:668,787); the
    numpy float64 ops here are IEEE-identical."""
    us = pc.cast(col, pa.int64())
    v = us.to_numpy(zero_copy_only=False).astype(np.float64)
    null = pc.is_null(col).to_numpy(zero_copy_only=False)
    v = v / 1e6 + tz_offset_s
    v = np.mod(v, float(modulo))
    v[null] = np.nan
    return v


@dataclass
class ModuloTimeRule(Rule):
    """seconds-within-period ∈ [lower, upper] — BOTH bounds inclusive
    and fractional seconds kept, exactly AMiner's ModuloTimeMatchRule
    (Rules.py:596: ``lower_limit <= test_value <= upper_limit`` on the
    float epoch). ``tz_offset_s`` is the deterministic stand-in for
    the reference's ``datetime.now(tzinfo).utcoffset()`` (it shifts
    epoch seconds into the configured zone before the modulo)."""

    path: str
    modulo: int
    lower: float
    upper: float
    tz_offset_s: float = 0.0

    def evaluate(self, batch: pa.Table) -> pa.Array:
        if self.path not in batch.column_names:
            return _false(batch.num_rows)
        v = _mod_seconds(batch[self.path], self.modulo, self.tz_offset_s)
        with np.errstate(invalid="ignore"):
            m = (v >= self.lower) & (v <= self.upper)
        return pa.array(m)


@dataclass
class IPv4InRFC1918Rule(Rule):
    """Integer-encoded IPv4 in a private range (Rules.py:797)."""

    path: str
    _ranges = ((0x0A000000, 0x0AFFFFFF), (0xAC100000, 0xAC1FFFFF), (0xC0A80000, 0xC0A8FFFF))

    def evaluate(self, batch: pa.Table) -> pa.Array:
        if self.path not in batch.column_names:
            return _false(batch.num_rows)
        v = batch[self.path].to_numpy(zero_copy_only=False)
        m = np.zeros(len(v), dtype=bool)
        for lo, hi in self._ranges:
            m |= (v >= lo) & (v <= hi)
        return pa.array(m)


class MatchAction:
    """Batch recast of AMiner's MatchAction (Rules.py:36-46): invoked
    with the MATCHED sub-batch whenever a wrapped rule matches ≥1 row
    of a batch (the per-atom callback becomes a per-batch callback —
    same information, vectorized granularity)."""

    def match_action(self, matched: pa.Table) -> None:
        raise NotImplementedError


@dataclass
class CollectingMatchAction(MatchAction):
    """EventGenerationMatchAction (Rules.py:48-86) recast: records
    ``(event_type, event_message, matched_rows)`` per firing — the
    handler fan-out happens wherever the collector is drained (a
    driver-side sink or a per-actor buffer)."""

    event_type: str
    event_message: str
    collected: list = field(default_factory=list)

    def __post_init__(self):
        if not isinstance(self.event_type, str) or not self.event_type:
            raise ValueError("event_type must be a non-empty string")
        if not isinstance(self.event_message, str):
            raise TypeError("event_message has to be of type string")

    def match_action(self, matched: pa.Table) -> None:
        self.collected.append((self.event_type, self.event_message, matched))


@dataclass
class AtomFilterMatchAction(MatchAction):
    """AtomFilterMatchAction (Rules.py:89-103) recast: forwards the
    matched sub-batch to handler callables; with
    ``stop_when_handled`` the chain stops at the first handler
    returning truthy (SubhandlerFilter semantics,
    aminer/analysis/AtomFilters.py:34-88)."""

    handlers: Sequence[Any]
    stop_when_handled: bool = False

    def match_action(self, matched: pa.Table) -> None:
        for h in self.handlers:
            if h(matched) and self.stop_when_handled:
                break


@dataclass
class ActionRule(Rule):
    """Attach a MatchAction to any rule. Reference rules take
    ``match_action=`` in every constructor (Rules.py passim); the
    vectorized engine keeps ``evaluate`` pure on every leaf and
    isolates the side effect in this one wrapper."""

    rule: Rule
    action: MatchAction

    def evaluate(self, batch: pa.Table) -> pa.Array:
        m = pc.fill_null(self.rule.evaluate(batch), False)
        if pc.any(m).as_py():
            self.action.match_action(batch.filter(m))
        return m


@dataclass
class ParallelRule(Rule):
    """ParallelMatchRule (Rules.py:224-276): an Or that evaluates ALL
    children — matching never stops at the first hit, so every
    child's ActionRule fires — then fires its own optional action on
    the union of matches. (Vectorized evaluation never short-circuits
    anyway; the class exists for action-firing parity and intent.)"""

    rules: Sequence[Rule]
    action: MatchAction | None = None

    def __post_init__(self):
        if len(self.rules) < 2:
            raise ValueError("at least two sub rules must exist")

    def evaluate(self, batch: pa.Table) -> pa.Array:
        masks = [pc.fill_null(r.evaluate(batch), False) for r in self.rules]
        m = masks[0]
        for x in masks[1:]:
            m = pc.or_(m, x)
        if self.action is not None and pc.any(m).as_py():
            self.action.match_action(batch.filter(m))
        return m


@dataclass
class ValueDependentDelegatedRule(Rule):
    """ValueDependentDelegatedMatchRule (Rules.py:277-349): extract
    the tuple of values at ``target_paths`` — per the reference a
    missing/null path value is SKIPPED (the tuple shortens), and an
    all-missing row looks up key ``None`` (never present: dict keys
    are non-empty tuples) so it falls to ``default_rule`` — then the
    selected delegate decides the row.

    Vectorized: each DISTINCT delegate rule evaluates ONCE per batch;
    per-row selection masks come from the non-null pattern plus value
    equality (a small loop over lookup keys × ordered path subsets,
    all numpy inside — no Python row loop)."""

    target_paths: Sequence[str]
    rule_lookup: dict
    default_rule: Rule | None = None
    action: MatchAction | None = None

    def __post_init__(self):
        if not self.target_paths:
            raise ValueError("target_paths must not be empty")
        for k in self.rule_lookup:
            if not isinstance(k, tuple) or len(k) == 0:
                raise TypeError("rule_lookup keys must be non-empty tuples")

    def evaluate(self, batch: pa.Table) -> pa.Array:
        import itertools

        n = batch.num_rows
        present = [p for p in self.target_paths if p in batch.column_names]
        valid = [
            pc.is_valid(batch[p]).to_numpy(zero_copy_only=False) for p in present
        ]
        out = (
            pc.fill_null(self.default_rule.evaluate(batch), False)
            .to_numpy(zero_copy_only=False)
            .copy()
            if self.default_rule is not None
            else np.zeros(n, dtype=bool)
        )
        k = len(present)
        mask_cache: dict[int, np.ndarray] = {}

        def delegate_mask(rule: Rule) -> np.ndarray:
            if id(rule) not in mask_cache:
                mask_cache[id(rule)] = pc.fill_null(
                    rule.evaluate(batch), False
                ).to_numpy(zero_copy_only=False)
            return mask_cache[id(rule)]

        for key, rule in self.rule_lookup.items():
            L = len(key)
            if L > k:
                continue
            sel_total = np.zeros(n, dtype=bool)
            # which ordered subset of the present paths supplied the
            # L key values (the reference skips missing paths, so a
            # row's extracted tuple follows its non-null pattern)
            for pos in itertools.combinations(range(k), L):
                sel = np.ones(n, dtype=bool)
                for j in range(k):
                    sel &= valid[j] if j in pos else ~valid[j]
                if not sel.any():
                    continue
                for j, kv in zip(pos, key):
                    try:
                        eq = pc.fill_null(
                            pc.equal(batch[present[j]], pa.scalar(kv)), False
                        ).to_numpy(zero_copy_only=False)
                    except pa.ArrowError:  # incomparable key type
                        eq = np.zeros(n, dtype=bool)
                    sel &= eq
                sel_total |= sel
            if sel_total.any():
                out[sel_total] = delegate_mask(rule)[sel_total]
        m = pa.array(out)
        if self.action is not None and out.any():
            self.action.match_action(batch.filter(m))
        return m


@dataclass
class ValueDependentModuloTimeRule(Rule):
    """ValueDependentModuloTimeMatchRule (Rules.py:688-796): the
    limit window is selected by the FIRST present key path's value
    (the reference collects a value list but reads ``value_list[0]``
    — Rules.py:773); missing key → ``default_limit``, no default →
    no match. Seconds = float epoch of ``time_path`` plus
    ``tz_offset_s`` (deterministic stand-in for the reference's
    ``datetime.now(tzinfo).utcoffset()``), mod ``seconds_modulo``;
    match when ``limits[0] <= v <= limits[1]`` — both INCLUSIVE."""

    time_path: str
    seconds_modulo: int
    key_paths: Sequence[str]
    limit_lookup: dict
    default_limit: tuple | None = None
    tz_offset_s: float = 0.0
    action: MatchAction | None = None

    def __post_init__(self):
        if self.seconds_modulo <= 0:
            raise ValueError("seconds_modulo must be bigger than zero")
        for lim in list(self.limit_lookup.values()) + (
            [self.default_limit] if self.default_limit is not None else []
        ):
            lo, hi = lim
            if not lo < hi <= self.seconds_modulo:
                raise ValueError(
                    "limits must satisfy lo < hi <= seconds_modulo"
                )
        if self.default_limit is None and (
            not self.limit_lookup or not self.key_paths
        ):
            raise ValueError(
                "either default_limit or limit_lookup+key_paths required"
            )

    def evaluate(self, batch: pa.Table) -> pa.Array:
        n = batch.num_rows
        if self.time_path not in batch.column_names:
            return _false(n)
        v = _mod_seconds(
            batch[self.time_path], self.seconds_modulo, self.tz_offset_s
        )
        # per-row limits: first PRESENT key path's value decides
        lo = np.full(n, np.nan)
        hi = np.full(n, np.nan)
        if self.default_limit is not None:
            lo[:] = float(self.default_limit[0])
            hi[:] = float(self.default_limit[1])
        assigned = np.zeros(n, dtype=bool)
        for p in self.key_paths:
            if p not in batch.column_names:
                continue
            is_first = (
                pc.is_valid(batch[p]).to_numpy(zero_copy_only=False) & ~assigned
            )
            if not is_first.any():
                continue
            for kv, lim in self.limit_lookup.items():
                try:
                    eq = pc.fill_null(
                        pc.equal(batch[p], pa.scalar(kv)), False
                    ).to_numpy(zero_copy_only=False)
                except pa.ArrowError:
                    continue
                sel = is_first & eq
                lo[sel] = float(lim[0])
                hi[sel] = float(lim[1])
            # a present-but-unknown key still CONSUMES the first slot
            # (lookup miss → default_limit, already pre-filled)
            assigned |= is_first
        with np.errstate(invalid="ignore"):
            m = (v >= lo) & (v <= hi)
        out = pa.array(m)
        if self.action is not None and m.any():
            self.action.match_action(batch.filter(out))
        return out


def allowlist_violations_mask(batch: pa.Table, allowlist: Sequence[Rule]) -> pa.Array:
    """True where NO allowlist rule matches — the
    AllowlistViolationDetector predicate."""
    if not allowlist:
        return pa.array(np.ones(batch.num_rows, dtype=bool))
    return pc.invert(OrRule(list(allowlist)).evaluate(batch))

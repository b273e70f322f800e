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


@dataclass
class ModuloTimeRule(Rule):
    """seconds-within-period ∈ [lower, upper) — AMiner's
    ModuloTimeMatchRule (Rules.py:596)."""

    path: str
    modulo: int
    lower: int
    upper: int

    def evaluate(self, batch: pa.Table) -> pa.Array:
        if self.path not in batch.column_names:
            return _false(batch.num_rows)
        us = pc.cast(batch[self.path], pa.int64())
        secs = pc.divide(us, 1_000_000)
        mod = pc.subtract(
            secs, pc.multiply(pc.floor(pc.divide(pc.cast(secs, pa.float64()), self.modulo)), float(self.modulo))
        )
        return pc.fill_null(
            pc.and_(pc.greater_equal(mod, float(self.lower)), pc.less(mod, float(self.upper))),
            False,
        )


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


def allowlist_violations_mask(batch: pa.Table, allowlist: Sequence[Rule]) -> pa.Array:
    """True where NO allowlist rule matches — the
    AllowlistViolationDetector predicate."""
    if not allowlist:
        return pa.array(np.ones(batch.num_rows, dtype=bool))
    return pc.invert(OrRule(list(allowlist)).evaluate(batch))

"""Property-based tests (hypothesis) for the vectorized kernels —
the reference has no property tests (SURVEY.md §5); these pin the
Arrow-buffer kernels against simple Python oracles on adversarial
inputs (empty rows, unicode, nulls, arbitrary whitespace)."""

import re

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from logdata_anomaly_miner_ray.functions import text as T
from logdata_anomaly_miner_ray.state.sketches import HyperLogLog, Moments, hash_int64

TEXTS = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=60,
        ),
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=60, deadline=None)
@given(TEXTS)
def test_token_counts_property(rows):
    arr = pa.array(rows, pa.string())
    got = T.token_counts(arr).tolist()
    # oracle: split on ASCII whitespace only (the kernel's contract)
    def oracle(s):
        if s is None:
            return 0
        parts = [p for p in re.split("[ \t\n\x0b\x0c\r]+", s) if p]
        return len(parts)

    assert got == [oracle(r) for r in rows]


@settings(max_examples=60, deadline=None)
@given(TEXTS)
def test_bigram_counts_property(rows):
    arr = pa.array(rows, pa.string())
    got = T.bigram_counts(arr)
    # reference semantics: len+1 pairs per row (virtual boundary
    # chars), one (B, B) pair for an empty/null row
    total = sum(len((r or "").encode("utf-8")) + 1 for r in rows)
    assert got.sum() == total


@settings(max_examples=60, deadline=None)
@given(TEXTS)
def test_char_class_fractions_bounds(rows):
    arr = pa.array(rows, pa.string())
    fr = T.char_class_fractions(arr)
    for name in ("alpha_frac", "digit_frac", "space_frac", "punct_frac", "non_ascii_frac"):
        assert ((fr[name] >= 0) & (fr[name] <= 1)).all()
    for i, r in enumerate(rows):
        assert fr["n_bytes"][i] == (0 if r is None else len(r.encode("utf-8")))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=199),
)
def test_moments_merge_associative(vals, split):
    a = np.asarray(vals, dtype=np.float64)
    split = min(split, len(a))
    m = Moments.from_array(a[:split])
    m.merge(Moments.from_array(a[split:]))
    full = Moments.from_array(a)
    assert m.n == full.n
    # catastrophic cancellation (sum |x| >> |sum x|) legitimately costs
    # ~eps * sum|x| absolute error in EITHER path — scale abs tol by it
    cancel_tol = 1e-12 * float(np.abs(a).sum()) / len(a)
    assert m.mean == pytest.approx(full.mean, rel=1e-9, abs=1e-9 + cancel_tol)
    assert m.min == full.min and m.max == full.max


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=500))
def test_hll_never_underestimates_badly(vals):
    a = np.asarray(vals or [0], dtype=np.int64)
    h = HyperLogLog().add_hashes(hash_int64(a))
    true = len(np.unique(np.asarray(vals, dtype=np.int64))) if vals else 0
    if true:
        assert h.estimate() >= true * 0.5
        assert h.estimate() <= true * 2.0 + 10


@settings(max_examples=40, deadline=None)
@given(TEXTS)
def test_row_hash_injective_on_sample(rows):
    """Whole-row polynomial hashes: equal strings hash equal;
    distinct strings distinct (collision odds ~2^-64)."""
    clean = ["" if r is None else r for r in rows]
    arr = pa.array(clean, pa.string())
    data, off = T.flat_utf8(arr)
    h = T.token_hashes(data, off[:-1], off[1:])
    seen = {}
    for s, hv in zip(clean, h):
        if s in seen:
            assert seen[s] == hv
        else:
            seen[s] = hv
    assert len(set(seen.values())) == len(seen)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40)), min_size=2, max_size=60
    )
)
@settings(max_examples=60, deadline=None)
def test_tc_pair_tables_matches_stream_simulation(events):
    """tc_pair_tables == a direct simulation of the reference's
    last-trigger update loop (update_tables_for_feature) on random
    streams with duplicate timestamps."""
    import numpy as np

    from logdata_anomaly_miner_ray.stages.correlation import tc_pair_tables

    events.sort(key=lambda e: e[1])
    ts = np.array([t * 1_000_000 for _, t in events], dtype=np.int64)
    ev = np.array([e for e, _ in events])
    F = 4
    masks = np.stack([ev == f for f in range(F)], axis=1)
    max_delta_us = 5_000_000

    # stream simulation: last_trigger updated AFTER the atom's checks
    last = [None] * F
    cnt = np.zeros((F, F), dtype=np.int64)
    dlt = np.zeros((F, F), dtype=np.int64)
    for i in range(len(ev)):
        g = int(ev[i])
        for f in range(F):
            if last[f] is not None and ts[i] - last[f] <= max_delta_us:
                cnt[f, g] += 1
                dlt[f, g] += ts[i] - last[f]
        last[g] = ts[i]

    c2, d2, trig = tc_pair_tables(ts, masks, max_delta_us)
    assert (c2 == cnt).all() and (d2 == dlt).all()
    assert (trig == masks.sum(axis=0)).all()

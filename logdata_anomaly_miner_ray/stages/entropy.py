"""Character-pair entropy scoring (EntropyDetector recast).

Reference semantics (aminer/analysis/EntropyDetector.py:128-193):
learn a char-pair frequency table over observed values; a value whose
MEAN conditional pair probability falls below ``prob_thresh`` is an
anomaly (random-looking token). Batch recast: the fit pass sums
257x257-bin bigram bincounts per block (boundary-marker pairs
included, mergeable by addition, one ~516 KiB array total); the scoring pass is a stateless vectorized
``map_batches`` against the broadcast table — the actor-pool pattern
mirrors AMiner loading its persisted frequency table at startup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.text import bigram_counts, mean_pair_prob
from ..schema import violations_table
from ._taskcache import cached_task_fn


def fit_bigram_table(ds: "ray.data.Dataset", value_col: str) -> np.ndarray:
    """Learned 257x257 bigram count table (sum over all blocks;
    boundary pairs included — reference EntropyDetector parity)."""

    def partial(batch: pa.Table) -> pa.Table:
        counts = bigram_counts(batch[value_col])
        return pa.table({"counts": pa.array([counts.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    from ..functions.text import N_SYM

    total = np.zeros(N_SYM * N_SYM, dtype=np.int64)
    for b in partials.iter_batches(batch_format="pyarrow"):
        for blob in b["counts"].to_pylist():
            total += np.frombuffer(blob, dtype=np.int64)
    return total


def entropy_scores(
    ds: "ray.data.Dataset",
    value_col: str,
    table_ref: "ray.ObjectRef",
    score_name: str = "mean_pair_prob",
) -> "ray.data.Dataset":
    """Append the per-row mean pair probability column."""

    class Scorer:
        def __init__(self):
            self.table = ray.get(table_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            score = mean_pair_prob(batch[value_col], self.table)
            return batch.append_column(score_name, pa.array(score, pa.float64(), from_pandas=True))

    return ds.map_batches(
        cached_task_fn(Scorer, cache_on=(table_ref, value_col, score_name)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


def entropy_violations(
    ds: "ray.data.Dataset",
    value_col: str,
    table_ref: "ray.ObjectRef",
    prob_thresh: float = 0.05,
    key_col: str | None = None,
    check_name: str = "EntropyDetector",
) -> "ray.data.Dataset":
    """Rows scoring below ``prob_thresh`` (reference default 0.05)."""

    class EntropyCheck:
        def __init__(self):
            self.table = ray.get(table_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            score = mean_pair_prob(batch[value_col], self.table)
            bad = np.flatnonzero(np.nan_to_num(score, nan=1.0) < prob_thresh)
            if len(bad) == 0:
                return violations_table(check_name, "", [], [], [], "")
            keys = (
                np.asarray(
                    pc.cast(batch[key_col], pa.string()).to_numpy(zero_copy_only=False),
                    dtype=object,
                ).astype(str)[bad]
                if key_col
                else [""] * len(bad)
            )
            vals = pc.cast(batch[value_col], pa.string()).take(pa.array(bad)).to_pylist()
            return violations_table(
                check=check_name,
                message="character pair probability below threshold",
                keys=keys,
                affected_paths=[value_col],
                affected_values=[[v if v is not None else "", f"{s:.6f}"] for v, s in zip(vals, score[bad])],
                expected=f'{{"prob_thresh": {prob_thresh}}}',
            )

    return ds.map_batches(
        cached_task_fn(EntropyCheck, cache_on=(table_ref, value_col, prob_thresh, key_col, check_name)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )

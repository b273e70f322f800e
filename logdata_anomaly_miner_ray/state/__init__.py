"""Mergeable per-block partial states (sketches, moments, checkpoints).

AMiner keeps detector state as exact Python sets/dicts in a single
process (reference: aminer/util/PersistenceUtil.py:89-130). At
10^12-row scale exact sets are unbounded, so this package provides
mergeable sketches (HyperLogLog distinct, t-digest quantiles,
Welford moments) computed per Arrow block inside ``map_batches`` and
reduced to one small broadcastable state object.
"""

from .sketches import HyperLogLog, Moments, TDigest  # noqa: F401

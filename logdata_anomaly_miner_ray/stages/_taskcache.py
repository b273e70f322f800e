"""Task-based map_batches with per-worker-process state caching.

Ray Data's two actor-pool shapes both hurt wide passes here:

- an AUTOSCALING pool ``concurrency=(1, N)`` starts with ONE actor
  and ramps while upstream read tasks race ahead — measured 3x
  slower than tasks on the 400k-row bench input (14.6-17.3 s vs
  4.6 s for the fused validate pass);
- a FIXED pool of ``num_cpus`` actors reserves every logical CPU,
  starving the upstream ``ReadParquet`` task pool entirely (the
  stage stalls at ~0 CPU until timeout).

For stages whose per-actor state is CHEAP to build (a ``ray.get``
of a broadcast blob — zero-copy from the object store — plus some
numpy reshaping), plain tasks with a per-worker-process cache give
the "setup once per worker" property of an actor pool without the
pool: the first batch a worker processes constructs the stage
object, every later batch reuses it, and tasks pipeline naturally
with the read under the streaming executor.

Keep REAL actor pools for heavy state (model weights, codec
contexts — see stages/multimodal.py): there, construction cost and
memory ownership justify pinned actors.
"""

from __future__ import annotations

from typing import Any

import ray

# one entry per (class, ctor-args) per worker process. LRU-bounded:
# repeated suite/query invocations in one long-lived Ray session
# mint fresh ObjectRefs (fresh keys) every run — without eviction a
# worker would accumulate every past run's constructed state
# (charset bitmaps, bigram tables, broadcast keep-sets) and pin
# their zero-copy plasma buffers forever.
_CACHE_MAX = 8
_CACHE: dict = {}


def _cache_put(key, obj) -> None:
    # true LRU: callers pop-and-reinsert on hit, so dict order is
    # recency order and the front is always the least recently used
    _CACHE[key] = obj
    while len(_CACHE) > _CACHE_MAX:
        _CACHE.pop(next(iter(_CACHE)))


def _key_part(v) -> Any:
    if isinstance(v, ray.ObjectRef):
        return v.hex()
    return repr(v)


def _cache_key(cls, cache_on, kwargs: dict) -> tuple:
    parts: list[Any] = [cls.__module__, cls.__qualname__]
    parts.extend(_key_part(v) for v in cache_on)
    for k in sorted(kwargs):
        parts.append((k, _key_part(kwargs[k])))
    return tuple(parts)


def cached_task_fn(cls, cache_on: tuple = (), **ctor_kwargs):
    """Return a map_batches UDF that constructs ``cls(**ctor_kwargs)``
    once per worker process and applies it per batch.

    Use instead of ``map_batches(cls, fn_constructor_kwargs=...,
    concurrency=(1, N))`` when construction is cheap (broadcast
    ``ray.get`` + array prep). ObjectRefs are cached by ref
    identity, everything else by ``repr``.

    ``cache_on``: for classes defined LOCALLY inside a stage
    function (the usual closure-over-broadcast-ref pattern), the
    class qualname alone does not distinguish two invocations —
    pass the closed-over refs/parameters here so the worker cache
    keys on them."""
    key = None  # computed lazily on the worker (refs pickle fine)

    def fn(batch):
        nonlocal key
        if key is None:
            key = _cache_key(cls, cache_on, ctor_kwargs)
        obj = _CACHE.pop(key, None)  # pop+reinsert keeps LRU order on hits
        if obj is None:
            obj = cls(**ctor_kwargs)
        _cache_put(key, obj)
        return obj(batch)

    fn.__name__ = f"task:{cls.__name__}"
    fn.__qualname__ = fn.__name__
    return fn

"""Broadcast helpers for small-side lookups inside ``map_batches``.

Pattern: the driver ``ray.put``s the small side ONCE; every task fetches it
through :func:`cached_get`, which deserializes at most once per worker
process however many tasks that worker runs — the broadcast-join shape the
100 TB design relies on instead of shuffle joins.
"""

from __future__ import annotations

import ray

# worker-local cache: keyed by object-ref hex so successive pipelines in one
# process don't leak each other's broadcasts (bounded size)
_CACHE: dict = {}


def cached_get(ref):
    key = ref.hex()
    val = _CACHE.get(key)
    if val is None:
        val = ray.get(ref)
        if len(_CACHE) > 8:
            _CACHE.clear()
        _CACHE[key] = val
    return val


def rows_of(ds) -> list[dict]:
    """Driver-side row list via ONE columnar pull.  ``Dataset.take_all``
    converts row by row (measured ~3 ms/row on pandas blocks — 28 s for a
    10k-row vocabulary); ``to_pandas().to_dict("records")`` is ~100x
    faster.  Only for driver-sized results (vocabularies, pair lists)."""
    return ds.to_pandas().to_dict("records")


def auto_concurrency(cap: int = 16, reserve: int = 2) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized from the cluster: ``(1, N)`` so
    tiny inputs don't spawn idle actors and big inputs use the node.
    ``reserve`` CPUs stay free for the upstream feed — a pool that reserves
    every CPU deadlocks the shuffle that feeds it."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return (1, max(2, min(cap, cpus - reserve)))

"""Process-level cache of jitted stage programs.

Constructing a pipeline stage builds a fresh closure around its Flax module
and jits it; a second stage with identical static configuration would
re-TRACE the whole model graph (seconds of host time for YOLOv10 on a
small host, even with the XLA binary already in the persistent compile
cache). Since model parameters are call arguments — the trace depends only
on the static config — equivalent stages can share one traced program.

Used by pipeline/detector.py, pipeline/classifier.py, pipeline/fused.py;
the cache key must include every value that shapes the trace (model config,
image sizes, thresholds baked as Python constants, dtype, mesh layout).
"""

from __future__ import annotations

import threading
from typing import Any, Callable

_CACHE: dict[Any, Any] = {}
# One lock per cache key would allow concurrent first-builds of distinct
# stages, but builds happen once per process per config — a single lock
# keeps concurrent first calls from tracing the same program twice.
_LOCK = threading.Lock()


def cached(key: Any, builder: Callable[[], Any]) -> Any:
    """Return the cached program for ``key``, building it on first use.

    Entries pin their compiled program (and closed-over Flax module) for the
    process lifetime by design: the set of distinct stage configurations in
    a run is small and re-tracing is the cost being avoided.
    """
    fn = _CACHE.get(key)
    if fn is None:
        with _LOCK:
            fn = _CACHE.get(key)
            if fn is None:
                fn = _CACHE[key] = builder()
    return fn


def clear() -> None:
    with _LOCK:
        _CACHE.clear()

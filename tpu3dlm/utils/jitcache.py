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

from typing import Any, Callable

_CACHE: dict[Any, Any] = {}


def cached(key: Any, builder: Callable[[], Any]) -> Any:
    """Return the cached program for ``key``, building it on first use."""
    fn = _CACHE.get(key)
    if fn is None:
        fn = _CACHE[key] = builder()
    return fn


def clear() -> None:
    _CACHE.clear()

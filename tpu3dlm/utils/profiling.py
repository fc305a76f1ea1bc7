"""Tracing / profiling: per-stage wall-clock + optional jax.profiler traces.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars only);
frames/sec/chip is this framework's north-star metric, so stage timing is a
first-class utility. `trace(dir)` wraps a block in a jax.profiler trace
viewable in TensorBoard/Perfetto; `StageTimer` records named spans and
derives throughput.
"""

from __future__ import annotations

import contextlib
import json
import time


class StageTimer:
    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def throughput(self, frames: int, stages: tuple[str, ...]) -> float:
        total = sum(self.times.get(s, 0.0) for s in stages)
        return frames / total if total > 0 else float("inf")

    def report(self) -> str:
        return json.dumps({k: round(v, 4) for k, v in self.times.items()})


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, iters: int = 1):
    """Time a jitted fn (post-warmup); returns secs/call.

    Forces completion with a HOST READBACK of the first output leaf —
    `jax.block_until_ready` alone can return early on experimental remote
    platforms (observed on the axon tunnel; docs/ARCHITECTURE.md
    "Measurement discipline"), which silently under-reports timings."""
    import jax
    import numpy as np

    def force(o):
        leaves = jax.tree_util.tree_leaves(o)
        if leaves:
            np.asarray(leaves[0])
        return o

    force(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters

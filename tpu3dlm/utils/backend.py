"""Backend availability probe for benches and long-running entrypoints.

The remote TPU backend (axon tunnel) can go UNAVAILABLE for hours — init
hangs ~4 minutes and then errors (observed 2026-08-17). A bench that hangs
on first dispatch tells the driver nothing; these helpers run a tiny
device op under a deadline so callers can fail FAST with a diagnostic
instead.

The probe runs in a daemon thread because a dispatch stuck inside the
runtime's C code cannot be cancelled from Python — on timeout the caller
must ``os._exit`` (the interpreter would otherwise wait on the thread).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time


def probe_backend(deadline_s: float) -> float | None:
    """Dispatch a tiny op + host readback under ``deadline_s`` seconds.

    Returns the probe's wall-clock seconds on success, None on timeout
    (backend unavailable or pathologically slow). A healthy remote-TPU
    first dispatch takes up to ~2 min; pass a deadline with margin.
    """
    import jax.numpy as jnp
    import numpy as np

    ok = threading.Event()

    def _probe():
        np.asarray(jnp.zeros((4,)) + 1.0)  # host readback forces dispatch
        ok.set()

    t0 = time.perf_counter()
    threading.Thread(target=_probe, daemon=True).start()
    if not ok.wait(deadline_s):
        return None
    return time.perf_counter() - t0


def require_backend(metric: str, unit: str = "frames/s") -> None:
    """Bench guard: probe the backend and hard-exit with a one-line JSON
    diagnostic (value null, ``error`` set) when it is unavailable.

    Deadline comes from ``BENCH_BACKEND_TIMEOUT`` (seconds, default 360 —
    clears the ~2 min worst-case healthy first dispatch); set it to 0 to
    skip the probe entirely.
    """
    deadline = float(os.environ.get("BENCH_BACKEND_TIMEOUT", "360"))
    if deadline <= 0:
        return
    took = probe_backend(deadline)
    if took is None:
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": None,
                    "unit": unit,
                    "vs_baseline": None,
                    "error": "backend unavailable: tiny-op probe did not "
                    f"complete within {deadline:.0f}s",
                }
            )
        )
        sys.stdout.flush()
        os._exit(2)  # the probe thread is stuck in C code — hard exit
    print(f"backend probe ok in {took:.1f}s", file=sys.stderr)


def enable_compile_cache(default_dir: str = "/tmp/tpu3dlm_jax_cache") -> None:
    """Point JAX's persistent compilation cache at ``JAX_CACHE_DIR`` (or
    the default). One home for the policy every bench/entrypoint shares —
    remote-TPU compiles cost minutes, so all of them opt in. Safe to call
    any time before the first compile; swallows config errors (older jax
    or already-frozen config) exactly like the inline blocks it replaces.
    """
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", default_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

"""Reproduce the axon-tunnel host->device transfer retention (round 5).

The 300-capture serving soak measured linear host RSS growth
(~2.1 MB/capture) on the axon-tunnelled TPU while the identical workload
on the CPU backend is RSS-flat, Python-level allocation is flat
(tracemalloc: ~70 KB over 30 captures), and `jax.live_arrays()` is flat.
This probe isolates the cause to the PJRT tunnel client: every
host->device TRANSFER retains its full payload natively (invisible to
tracemalloc, not recovered by gc.collect() or malloc_trim), while
compute dispatches retain ~1 KB each.

Measured on v5e-1 via axon (2026-08-21):
  5000 small dispatches, no fresh uploads  -> +1.1 KB/dispatch
  200 x 12 MB fresh-array uploads          -> +12411 KB/dispatch (1:1!)

Implication: per-capture serving on THIS testbed leaks its upload volume
(~2 MB/capture) in the tunnel client; on a directly-attached TPU (no
tunnel) the retention does not exist, and the framework's own memory
behavior is bounded (scripts/bench_serving.py --soak --cpu: slope 0.0).

Usage: PYTHONPATH=.:/root/.axon_site python scripts/probe_tunnel_leak.py
"""

from __future__ import annotations

import gc
import json


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return x * 1.000001 + 1.0

    x = jnp.asarray(np.random.rand(256, 256).astype(np.float32))
    np.asarray(f(x))
    gc.collect()
    base = rss_mb()
    for _ in range(2000):
        x = f(x)
    np.asarray(x)
    gc.collect()
    per_dispatch_kb = (rss_mb() - base) * 1024 / 2000

    g = jax.jit(lambda x: x.sum())
    h = np.random.rand(64, 128, 128, 3).astype(np.float32)  # ~12 MB
    gc.collect()
    base2 = rss_mb()
    n_up = 100
    for _ in range(n_up):
        np.asarray(g(jnp.asarray(h)))
    gc.collect()
    per_upload_kb = (rss_mb() - base2) * 1024 / n_up

    out = {
        "metric": "tunnel_transfer_retention",
        "per_dispatch_kb": round(per_dispatch_kb, 1),
        "per_12mb_upload_kb": round(per_upload_kb, 1),
        "upload_payload_kb": round(h.nbytes / 1024, 1),
        "leak_is_transfer_sized": bool(
            per_upload_kb > 0.8 * h.nbytes / 1024
        ),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

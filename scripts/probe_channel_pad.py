"""Channel-padding MFU probe (PERF.md "Known costs / next levers").

Question: YOLOv10-n's 16-64-channel mid-network convs under-fill the
128-wide MXU contraction (measured whole-model MFU 11.8%). Does padding
conv channels up to the next 128 multiple run at (near) the same
wall-clock — i.e. is the idle MXU capacity free — or does the padded
FLOP count show up 1:1 in time?

If padding is ~free, a "wide-n" variant could buy representational
capacity at no latency cost (an accuracy lever, not an fps lever: the
same real network cannot get faster by computing more). If padding costs
1:1, the lever is dead and we document the negative result like the
space-to-depth stem and int8 probes.

Methodology matches the int8 probe (PERF.md "MXU utilisation"): each
conv shape as a standalone jitted XLA program, timing forced via host
readback of a scalar (``block_until_ready`` returns early on the axon
tunnel), best-of over repeated calls, persistent compile cache.

Run on the TPU host:  timeout 1800 python scripts/probe_channel_pad.py
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu3dlm_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

# (spatial, C_in, C_out) of the dominant YOLOv10-n mid-network convs at
# 640 input (models/yolov10.py spec table), plus their padded-to-128
# counterparts.  Batch matches the int8 probe for comparability.
BATCH = int(os.environ.get("PROBE_BATCH", "512"))
SHAPES = [
    # (label, H==W, C_in, C_out)
    ("160² 32→32", 160, 32, 32),
    ("160² 32→128pad", 160, 128, 128),
    ("80² 64→64", 80, 64, 64),
    ("80² 64→128pad", 80, 128, 128),
    ("40² 128→128", 40, 128, 128),  # already MXU-aligned: control
    ("40² 128→256pad", 40, 256, 256),
]


def conv_fn(cout):
    def f(x, w):
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        return jax.nn.silu(y)

    return jax.jit(f)


def time_one(hw, cin, cout, iters=8):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, hw, hw, cin), dtype=jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, cin, cout), dtype=jnp.bfloat16)
    f = conv_fn(cout)
    y = f(x, w)
    np.asarray(y[0, 0, 0, 0])  # force: compile + first run complete
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        y = f(x, w)
        np.asarray(y[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    flops = 2 * BATCH * hw * hw * 9 * cin * cout
    return best, flops


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}, batch {BATCH}")
    rows = []
    for label, hw, cin, cout in SHAPES:
        dt, flops = time_one(hw, cin, cout)
        tflops = flops / dt / 1e12
        rows.append((label, dt * 1e3, tflops))
        print(f"{label:>20}: {dt * 1e3:8.2f} ms  {tflops:6.1f} TFLOP/s", flush=True)
    # pairwise verdicts: padded vs native wall-clock ratio
    print("\npadding cost (padded_ms / native_ms; ~1.0 == free):")
    for i in range(0, len(rows) - 1, 2):
        nat, pad = rows[i], rows[i + 1]
        print(f"  {nat[0]} vs {pad[0]}: {pad[1] / nat[1]:.2f}x time, "
              f"{pad[2] / nat[2]:.2f}x achieved TFLOP/s")


if __name__ == "__main__":
    main()

"""A/B probe: fused Pallas BEiT attention vs the XLA einsum path, on chip.

Times BeitClassifier forward at the production crop budget (384 crops,
224², bf16) with attn_impl = einsum / pallas, readback-forced, and checks
the two paths agree (the kernel keeps scores f32 in VMEM, so it should sit
BETWEEN the bf16 einsum path and the f32 golden path numerically — drift
vs einsum is expected to be the einsum path's own bf16 score rounding).

Usage: python scripts/probe_beit_attn.py [--crops 384] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--crops", type=int, default=384)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu3dlm.utils.backend import enable_compile_cache

    enable_compile_cache()

    from tpu3dlm.models.beit import BeitClassifier, BeitConfig, preprocess_crops

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    crops = jnp.asarray(
        rng.integers(0, 255, size=(args.crops, 224, 224, 3)), jnp.uint8
    )

    models = {
        impl: BeitClassifier(BeitConfig(attn_impl=impl), dtype=dtype)
        for impl in ("einsum", "pallas")
    }
    # a REAL flax init (LayerNorm scales 1, layer-scale lambdas 0.1, lecun
    # kernels) + perturbation — init_template's all-zeros leaves would
    # collapse the logits toward ties and make drift/agreement vacuous
    variables = jax.jit(models["einsum"].init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    # perturb so attention bias/table actually contribute
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    variables = jax.tree.unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    variables = jax.device_put(variables)

    fns = {
        impl: jax.jit(lambda v, x, m=m: m.apply(v, preprocess_crops(x)))
        for impl, m in models.items()
    }

    logits = {}
    times = {}
    for impl, fn in fns.items():
        out = fn(variables, crops)
        logits[impl] = np.asarray(out, np.float32)  # compile + drain
        samples = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(variables, crops)
            np.asarray(out)
            samples.append((time.perf_counter() - t0) / args.iters)
        times[impl] = float(np.median(samples))
        print(f"{impl:8s} {times[impl] * 1e3:8.1f} ms  "
              f"(samples {[round(s * 1e3, 1) for s in samples]})")

    drift = float(np.max(np.abs(logits["einsum"] - logits["pallas"])))
    agree = float(
        np.mean(logits["einsum"].argmax(-1) == logits["pallas"].argmax(-1))
    )
    print(json.dumps({
        "crops": args.crops,
        "dtype": args.dtype,
        "einsum_ms": round(times["einsum"] * 1e3, 2),
        "pallas_ms": round(times["pallas"] * 1e3, 2),
        "speedup": round(times["einsum"] / times["pallas"], 3),
        "max_logit_drift": round(drift, 4),
        "top1_agreement": agree,
    }))


if __name__ == "__main__":
    main()

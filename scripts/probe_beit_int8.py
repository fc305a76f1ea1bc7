"""A/B probe: int8 MXU BEiT vs the bf16 fast path, on chip.

Times BeitClassifier forward at the production crop budget (384 crops,
224²) with quant = none (bf16) / int8 (encoder Dense layers on the MXU's
2×-rate int8 path, ops/quant.py), readback-forced, and reports top-1
agreement vs the f32 golden path for both — the accuracy bar the bf16
path is held to (tests/test_models.py) applied to the quantized one.

Usage: python scripts/probe_beit_int8.py [--crops 384] [--iters 5]
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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu3dlm.utils.backend import enable_compile_cache

    enable_compile_cache()

    from tpu3dlm.models.beit import BeitClassifier, BeitConfig, preprocess_crops
    from tpu3dlm.models.weights import quantize_beit_variables

    rng = np.random.default_rng(0)
    crops = jnp.asarray(
        rng.integers(0, 255, size=(args.crops, 224, 224, 3)), jnp.uint8
    )

    fmodel = BeitClassifier(BeitConfig(), dtype=jnp.bfloat16)
    f32model = BeitClassifier(BeitConfig(attn_impl="einsum"), dtype=jnp.float32)
    qmodel = BeitClassifier(BeitConfig(quant="int8"), dtype=jnp.bfloat16)

    # a REAL flax init (LayerNorm scales 1, layer-scale lambdas 0.1, lecun
    # kernels) + perturbation — the tests' recipe. init_template would hand
    # back all-zeros leaves, whose near-tied logits make any top-1/drift
    # comparison pass vacuously.
    variables = jax.jit(f32model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    variables = jax.tree.unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    qvariables = jax.device_put(quantize_beit_variables(variables))
    variables = jax.device_put(variables)

    runs = {
        "bf16": (fmodel, variables),
        "int8": (qmodel, qvariables),
        "f32": (f32model, variables),
    }
    fns = {
        name: jax.jit(lambda v, x, m=m: m.apply(v, preprocess_crops(x)))
        for name, (m, _) in runs.items()
    }

    logits = {}
    times = {}
    for name, (m, v) in runs.items():
        fn = fns[name]
        logits[name] = np.asarray(fn(v, crops), np.float32)  # compile+drain
        samples = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(v, crops)
            np.asarray(out)
            samples.append((time.perf_counter() - t0) / args.iters)
        times[name] = float(np.median(samples))
        print(f"{name:5s} {times[name] * 1e3:8.1f} ms  "
              f"(samples {[round(s * 1e3, 1) for s in samples]})")

    def agree(a, b):
        return float(np.mean(logits[a].argmax(-1) == logits[b].argmax(-1)))

    print(json.dumps({
        "crops": args.crops,
        "bf16_ms": round(times["bf16"] * 1e3, 2),
        "int8_ms": round(times["int8"] * 1e3, 2),
        "f32_ms": round(times["f32"] * 1e3, 2),
        "speedup_vs_bf16": round(times["bf16"] / times["int8"], 3),
        "top1_int8_vs_f32": agree("int8", "f32"),
        "top1_bf16_vs_f32": agree("bf16", "f32"),
        "max_prob_drift_int8_vs_f32": round(float(np.max(np.abs(
            np.asarray(jax.nn.softmax(logits["int8"], -1))
            - np.asarray(jax.nn.softmax(logits["f32"], -1))
        ))), 4),
    }))


if __name__ == "__main__":
    main()

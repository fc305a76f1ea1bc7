"""Stage-level timing of the perception+mapping device programs.

The profiling tool behind the round-3 optimisations (PERF.md): it times each
sub-program of the fused scan step standalone — YOLO forward, postprocess,
BEiT at the crop budget, MXU rectify, 2D→3D projection — so the fused step's
time budget is attributable to stages. This is how the projection depth
gather was found to be 110 of 117 ms (now an MXU one-hot matmul,
ops/geometry.py::bbox_sampled_median_depth) and BEiT's f32 attention scores
59 of 249 ms (now compute-dtype, models/beit.py::BeitAttention).

Measurement discipline (docs/ARCHITECTURE.md): timings force a host
readback because `jax.block_until_ready` can return early on experimental
remote platforms. CAVEAT — stages returning large tensors (raw YOLO maps,
rectified crops) are readback-bound through the tunnel, not compute-bound;
their numbers measure transfer. Stages with small outputs (postprocess,
logits, corners, the fused step) are the meaningful ones.

Usage:
    python scripts/profile_stages.py [--frames 128] [--budget 384] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--budget", type=int, default=384, help="crop budget")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--max-det", type=int, default=64)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu3dlm.utils.backend import enable_compile_cache

    enable_compile_cache()

    from tpu3dlm.mapper.projection import project_boxes
    from tpu3dlm.models.beit import BeitClassifier, BeitConfig, preprocess_crops
    from tpu3dlm.models.yolov10 import YOLOv10, postprocess
    from tpu3dlm.ops.image import _rectify_one_mxu
    from tpu3dlm.parallel.inference import full_scan_step_fn, square_box_affine

    F, S, K = args.frames, args.img_size, args.budget
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 255, size=(F, S, S, 3)), jnp.uint8)
    depth = jnp.asarray(np.full((F, 256, 192), 2000.0, np.float32))
    intr = jnp.asarray(
        np.tile(np.array([500.0, 500.0, 320.0, 240.0], np.float32), (F, 1))
    )
    rgb_size = jnp.asarray(np.tile(np.array([1920.0, 1440.0], np.float32), (F, 1)))
    poses = jnp.asarray(np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (F, 1)))
    affine = jnp.asarray(square_box_affine(np.asarray(rgb_size), S))

    yolo = YOLOv10(nc=80, variant="n", dtype=dtype)
    beit = BeitClassifier(BeitConfig(), dtype=dtype)
    yv = yolo.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32))
    bv = beit.init(jax.random.PRNGKey(1), jnp.zeros((1, 224, 224, 3), jnp.float32))

    def bench(name, fn, *fargs):
        out = fn(*fargs)
        np.asarray(jax.tree.leaves(out)[0])  # compile + drain
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*fargs)
        np.asarray(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:36s} {dt * 1e3:9.1f} ms  ({F / dt:8.1f} fps)")
        return dt

    @jax.jit
    def yolo_post(yv, rgb):
        x = rgb.astype(jnp.float32) / 255.0
        raw = yolo.apply(yv, x)["one2one_split"]
        return postprocess(raw, img_size=S, max_det=args.max_det)

    @jax.jit
    def beit_fwd(bv, crops):
        return beit.apply(bv, preprocess_crops(crops))

    @jax.jit
    def rectify_logits(rgb, boxes, bv):
        # rectify → classify in one program so only the logits come back
        x = rgb.astype(jnp.float32) / 255.0
        frames = x[jnp.arange(K) % F]
        crops = jax.vmap(_rectify_one_mxu, in_axes=(0, 0, None))(
            frames, boxes, (224, 224)
        )
        return beit.apply(bv, preprocess_crops((crops * 255.0).astype(jnp.uint8)))

    @jax.jit
    def project(boxes, mask, depth, intr, rgb_size, poses):
        return project_boxes(boxes, mask, depth, intr, rgb_size, poses)

    crops = jnp.asarray(rng.integers(0, 255, size=(K, 224, 224, 3)), jnp.uint8)
    kboxes = jnp.asarray(
        np.tile(np.array([100.0, 100.0, 400.0, 400.0], np.float32), (K, 1))
    )
    fboxes = jnp.asarray(
        rng.uniform(10, S - 10, size=(F, args.max_det, 4)).astype(np.float32)
    )
    fmask = jnp.ones((F, args.max_det), bool)

    step = jax.jit(
        full_scan_step_fn(yolo, beit, S, args.max_det, 0.25, crop_budget=K)
    )

    t_post = bench("detect + postprocess", yolo_post, yv, rgb)
    t_beit = bench(f"classify ({K} crops)", beit_fwd, bv, crops)
    t_rect = bench(f"rectify+classify ({K} crops)", rectify_logits, rgb, kboxes, bv)
    t_proj = bench("project_boxes", project, fboxes, fmask, depth, intr, rgb_size, poses)
    t_full = bench(
        "fused full step", step, yv, bv, rgb, depth, intr, rgb_size, poses, affine
    )
    print(
        f"attributable ≈ {(t_post + t_rect + t_proj) * 1e3:.1f} ms "
        f"vs fused {t_full * 1e3:.1f} ms "
        f"(rectify overhead ≈ {(t_rect - t_beit) * 1e3:.1f} ms)"
    )


if __name__ == "__main__":
    main()

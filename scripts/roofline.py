"""Whole-program HBM roofline for the flagship step (VERDICT r4 weak #6).

The per-op ledger (PERF.md) defends the headline MFU by showing every big
conv `bound_by=HBM` at 500-650 GB/s — but never closed the loop with the
one number that makes the defense airtight: total bytes moved per frame →
the HBM-roofline fps bound → "the headline is X% of the bound".

This script lowers the SAME fused step bench.py times (detect + project,
batch x img_size from the same env knobs), reads XLA's compiled
cost_analysis (flops + bytes accessed), and prints the roofline:

    hbm_bound_fps  = HBM_BW / bytes_per_frame
    mxu_bound_fps  = PEAK_FLOPS / flops_per_frame
    light_speed    = min(both)     — the program cannot run faster than
                                     its slower wall
    headline_vs_roofline = measured_fps / light_speed

v5e-1 peaks: 197 TFLOP/s bf16, 819 GB/s HBM (public chip specs). XLA's
"bytes accessed" is the optimistic per-op sum (each buffer counted once
per use, fused producers not re-counted), so the bound is OPTIMISTIC —
being within ~70-80% of it is speed-of-light territory for a multi-op
program with enqueue gaps.

Usage:
    PYTHONPATH=.:/root/.axon_site python scripts/roofline.py [--fps 5461]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_PEAK_BF16 = 197e12
V5E_HBM_BPS = 819e9


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fps", type=float, default=None,
                    help="measured headline fps to compare (default: "
                    "read BENCH_r04.json value)")
    ap.add_argument("--frames", type=int,
                    default=int(os.environ.get("BENCH_FRAMES", "256")))
    ap.add_argument("--img", type=int,
                    default=int(os.environ.get("BENCH_IMG", "640")))
    ap.add_argument("--variant", default=os.environ.get("BENCH_VARIANT", "n"))
    args = ap.parse_args()

    fps = args.fps
    if fps is None:
        try:
            with open(os.path.join(REPO, "BENCH_r04.json")) as f:
                fps = float(json.load(f)["result"]["value"])
        except Exception:
            fps = None

    from tpu3dlm.utils.backend import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from bench import build_inputs, make_step

    yolo, step = make_step(args.img, 64, variant=args.variant)
    variables = yolo.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.img, args.img, 3), jnp.float32),
    )
    arrays = build_inputs(args.frames, args.img)
    device = jax.devices()[0]
    vs = jax.device_put(variables, device)
    dargs = [jax.device_put(jnp.asarray(a), device) for a in arrays]
    cost = step.lower(vs, *dargs).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    out = {
        "metric": "hbm_roofline",
        "frames": args.frames,
        "img": args.img,
        "variant": args.variant,
        "flops_per_frame": round(flops / args.frames / 1e9, 3),  # GFLOP
        "bytes_per_frame_mb": round(byts / args.frames / 1e6, 3),
        "hbm_bound_fps": round(V5E_HBM_BPS / (byts / args.frames), 1),
        "mxu_bound_fps": round(V5E_PEAK_BF16 / (flops / args.frames), 1),
    }
    out["light_speed_fps"] = min(out["hbm_bound_fps"], out["mxu_bound_fps"])
    out["bound_by"] = (
        "HBM" if out["hbm_bound_fps"] < out["mxu_bound_fps"] else "MXU"
    )
    if fps:
        out["measured_fps"] = fps
        out["headline_vs_roofline"] = round(fps / out["light_speed_fps"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

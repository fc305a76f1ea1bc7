"""Benchmark: RGB-D frames/sec/chip for detect + 3D project (BASELINE.md).

Measures the fused device program (YOLOv10 one-to-one detect → NMS-free
postprocess → 2D→3D projection) over a synthetic scan on the default
backend, and compares against the same workload on host CPU — the
reference's execution substrate is a single-process CPU pipeline with only
the model forward on an accelerator (SURVEY.md §2c), so CPU throughput of
the identical computation is the baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def build_inputs(num_frames: int, img_size: int):
    from tpu3dlm.data import synthetic
    from tpu3dlm.data.dataset import load_scan

    root = os.path.join(tempfile.gettempdir(), "tpu3dlm_bench_scan")
    marker = os.path.join(root, "gold_std", "poses.txt")
    if not os.path.exists(marker):
        synthetic.generate_scan(root, "gold_std", num_frames=num_frames)
    base = os.path.join(root, "gold_std", "rtabmap_extract")
    scan = load_scan(
        image_dir=os.path.join(base, "data_rgb"),
        depth_image_dir=os.path.join(base, "data_depth"),
        calibration_dir=os.path.join(base, "calibration"),
        pose_path=os.path.join(root, "gold_std", "poses.txt"),
        img_size=img_size,
    )
    # tile frames up to num_frames (generator writes 8 by default)
    reps = -(-num_frames // scan.num_frames)

    def tile(x):
        return np.concatenate([np.asarray(x)] * reps)[:num_frames]

    return tuple(
        tile(v) for v in (scan.rgb, scan.depth, scan.intrinsics, scan.rgb_size, scan.poses)
    )


def make_step(img_size: int, max_det: int, variant: str = "n"):
    import jax
    import jax.numpy as jnp

    from tpu3dlm.mapper.projection import project_boxes
    from tpu3dlm.models.yolov10 import YOLOv10, postprocess

    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    stem = os.environ.get("BENCH_STEM", "conv")  # "s2d" = space-to-depth stem
    yolo = YOLOv10(nc=80, variant=variant, dtype=dtype, stem=stem)

    def step(variables, rgb_u8, depth, intrinsics, rgb_size, poses):
        # BENCH_INPUT_CAST=bf16 probes casting u8 straight to the compute
        # dtype: u8→bf16 is exact (0-255 fits the 8-bit mantissa) and the
        # /255 then rounds once to bf16 — numerically equivalent to
        # f32/255→bf16 up to 1 ulp double-rounding — while skipping the
        # f32 materialization of the 630 MB input batch (per-op ledger:
        # m0 convert_element_type 6.3% of device time)
        in_dtype = (
            dtype
            if os.environ.get("BENCH_INPUT_CAST", "f32") == "bf16"
            else jnp.float32
        )
        x = rgb_u8.astype(in_dtype) / 255.0
        # the SPLIT head output: XLA DCEs the unused concatenated maps
        # (and their box/cls concat op) out of the program entirely
        raw = yolo.apply(variables, x)["one2one_split"]
        det = postprocess(
            raw, img_size=img_size, max_det=max_det,
            # BENCH_POSTPROCESS=concat A/Bs the pre-round-4 whole-tensor
            # concat path (bit-identical outputs; see models/yolov10.py)
            per_level=os.environ.get("BENCH_POSTPROCESS", "per_level") != "concat",
        )
        sx = (rgb_size[:, 0] / img_size)[:, None]
        sy = (rgb_size[:, 1] / img_size)[:, None]
        boxes_px = jnp.stack(
            [det["boxes"][..., 0] * sx, det["boxes"][..., 1] * sy,
             det["boxes"][..., 2] * sx, det["boxes"][..., 3] * sy],
            axis=-1,
        )
        corners, valid = project_boxes(
            boxes_px, det["conf"] >= 0.25, depth, intrinsics, rgb_size, poses,
            median_samples=int(os.environ.get("BENCH_MEDIAN_SAMPLES", "16")),
        )
        return corners, valid, det["conf"]

    return yolo, jax.jit(step)


_PEAK_BF16_TFLOPS = {
    # per-chip dense peak (bf16) for MFU; "TPU v5 lite" == v5e
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
}


def flops_of(step, variables, arrays, device, jax):
    """Total FLOPs of one step from XLA's own cost analysis (None if the
    backend doesn't expose it). Counts the whole batched program."""
    import jax.numpy as jnp

    try:
        args = [jax.device_put(jnp.asarray(a), device) for a in arrays]
        vs = jax.device_put(variables, device)
        fn = step if hasattr(step, "lower") else jax.jit(step)
        cost = fn.lower(vs, *args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost.get("flops", 0.0))
        return f if f > 0 else None
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return None


def mfu_fields(flops_total, num_frames, fps, device):
    """TFLOP/s + fraction-of-peak fields for the bench JSON (VERDICT round-1
    item 4: '1146× a 1-core CPU is an easy bar; MFU is the honest one')."""
    if not flops_total:
        return {}
    per_frame = flops_total / num_frames
    tflops = fps * per_frame / 1e12
    out = {
        "gflop_per_frame": round(per_frame / 1e9, 2),
        "tflop_per_sec": round(tflops, 2),
    }
    kind = getattr(device, "device_kind", "")
    for name, peak in _PEAK_BF16_TFLOPS.items():
        if kind.startswith(name):
            out["mfu_vs_bf16_peak"] = round(tflops / peak, 4)
            break
    return out


def _force(out):
    """Force completion via host readback — jax.block_until_ready can return
    early on experimental remote platforms (observed on axon), so timings
    must materialize a result on the host."""
    return np.asarray(out[0] if isinstance(out, (tuple, list)) else out)


def time_fps(step, variables, arrays, device, iters: int, jax):
    """Sustained throughput: enqueue all iterations, force once at the end.

    The device executes queued programs back-to-back (the deployment
    pattern); the final readback drains the whole queue. Per-call readback
    would charge the remote-dispatch round trip to every iteration.
    """
    import jax.numpy as jnp

    args = [jax.device_put(jnp.asarray(a), device) for a in arrays]
    vs = jax.device_put(variables, device)
    _force(step(vs, *args))  # compile + warmup, fully drained
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = step(vs, *args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    return arrays[0].shape[0] / dt


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeat bench runs skip the multi-minute
    # YOLO compile (first run pays it once)
    from tpu3dlm.utils.backend import enable_compile_cache

    enable_compile_cache()

    # Backend watchdog: the remote TPU backend can go UNAVAILABLE for hours
    # (init hangs ~4 min then errors — observed 2026-08-17). A hung bench
    # tells the driver nothing — fail FAST with a diagnostic JSON line.
    from tpu3dlm.utils.backend import require_backend

    require_backend("rgbd_detect_project_frames_per_sec_per_chip")

    # batch sweep on v5e-1 (round 3, after the MXU median-sampling fix):
    # 128 → 3455, 256 → 3658 fps. Before the fix the projection gather
    # bottlenecked the step and 128 was the sweet spot (PERF.md)
    num_frames = int(os.environ.get("BENCH_FRAMES", "256"))
    img_size = int(os.environ.get("BENCH_IMG", "640"))
    # 40 queued iterations per timed window: the round-5 per-op ledger
    # showed 3 iterations leave the chip idle 25.7% of the trace (enqueue
    # edges). Knee study on v5e-1 (same program): depth 3 → 3.1k fps,
    # 10 → 4.0k (idle 10.2%), 20 → 4.7k, 40 → 5.0k, 80 → 5.04k (+0.9%).
    # Sustained throughput — a full queue, the serving pattern — is the
    # metric; 40 sits at the knee without inflating the window.
    iters = int(os.environ.get("BENCH_ITERS", "40"))
    variant = os.environ.get("BENCH_VARIANT", "n")

    arrays = build_inputs(num_frames, img_size)
    yolo, step = make_step(img_size, max_det=64, variant=variant)
    variables = yolo.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    )

    default_dev = jax.devices()[0]
    trace_dir = os.environ.get("BENCH_PROFILE", "")
    if trace_dir:
        # capture an xplane trace of the timed region (view with
        # tensorboard-plugin-profile or xprof); falls back silently where
        # the platform doesn't support profiling
        try:
            with jax.profiler.trace(trace_dir):
                fps_samples = [
                    time_fps(step, variables, arrays, default_dev, iters, jax)
                ]
        except Exception as e:
            print(f"profiler unavailable ({e}); timing without trace", file=sys.stderr)
            fps_samples = [
                time_fps(step, variables, arrays, default_dev, iters, jax)
            ]
    else:
        # median of several timed windows: single draws over the remote
        # tunnel spread ±15% (PERF.md); the median rejects the stall mode
        # the way bench_align's steady estimator does. Each window is
        # already a `iters`-deep queued-dispatch measurement.
        reps = max(1, int(os.environ.get("BENCH_STEADY_REPS", "5")))
        fps_samples = [
            time_fps(step, variables, arrays, default_dev, iters, jax)
            for _ in range(reps)
        ]
    fps = float(np.median(fps_samples))

    # Baseline: the same jitted program on host CPU — the reference pipeline
    # is CPU-bound Python (SURVEY.md §2c), so CPU throughput of the identical
    # computation bounds it from above. 5 single-iteration samples over ≥8
    # frames, trimmed mean (drop min+max) — the earlier 3-sample mean carried
    # a 20%-of-mean spread into the headline denominator (ADVICE r2). Note
    # the asymmetry folded into vs_baseline: the device leg measures
    # sustained queued throughput (BENCH_ITERS-deep queue, the serving
    # pattern) while the CPU denominator runs depth-1 — documented here and
    # in BENCH_BASELINE.json rather than "fixed", because queueing is the
    # deployment pattern on the accelerator and is meaningless on the
    # in-process CPU backend. BENCH_CPU_BASELINE=0 skips the live leg and
    # reports the last stored measurement (BENCH_BASELINE.json, written on
    # every live CPU measurement).
    baseline_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
    # non-default variants store under their own key — a BENCH_VARIANT=m run
    # must not clobber the headline n-variant denominator
    base_key = "cpu_fps_detect_project" + ("" if variant == "n" else f"_{variant}")
    vs_baseline = 0.0
    measured_cpu_fps = None
    if os.environ.get("BENCH_CPU_BASELINE", "1") != "0":
        try:
            cpu = jax.devices("cpu")[0]
            if cpu != default_dev:
                # the forced-CPU compile runs under an EPHEMERAL cache dir:
                # loading persistent XLA:CPU AOT blobs logs a
                # `cpu_aot_loader` "machine mismatch … SIGILL" wall into
                # the driver artifact even on a same-host reload (the
                # dryrun got this fix first — __graft_entry__.py); the
                # persistent cache is restored right after for any
                # remaining accelerator compiles (mfu cost analysis)
                from tpu3dlm.utils.backend import ephemeral_compile_cache

                ephemeral_compile_cache()
                try:
                    nb = max(8, int(os.environ.get("BENCH_CPU_FRAMES", "8")))
                    # a short BENCH_FRAMES run can't supply 8 frames —
                    # record what was actually timed, not the request
                    nb = min(nb, int(arrays[0].shape[0]))
                    cpu_arrays = tuple(a[:nb] for a in arrays)
                    samples = sorted(
                        time_fps(step, variables, cpu_arrays, cpu, 1, jax)
                        for _ in range(5)
                    )
                    measured_cpu_fps = float(np.mean(samples[1:-1]))
                finally:
                    enable_compile_cache()
            else:
                vs_baseline = 1.0
        except Exception as e:
            print(f"cpu baseline unavailable: {e}", file=sys.stderr)
    if measured_cpu_fps is not None:
        vs_baseline = fps / max(measured_cpu_fps, 1e-9)
        try:
            # merge: bench_e2e.py stores its own key in the same file
            stored = {}
            try:
                with open(baseline_file) as f:
                    stored = json.load(f)
            except Exception:
                pass
            stored.update({base_key: round(measured_cpu_fps, 4),
                           base_key + "_samples": [round(s, 4) for s in samples],
                           base_key + "_spread": round(max(samples) - min(samples), 4),
                           "cpu_frames": nb, "cpu_iters": len(samples),
                           "img_size": img_size})
            with open(baseline_file, "w") as f:
                json.dump(stored, f)
        except OSError:
            pass
    elif vs_baseline == 0.0:
        try:
            with open(baseline_file) as f:
                stored = json.load(f)[base_key]
            vs_baseline = fps / max(stored, 1e-9)
        except Exception:
            print("no stored CPU baseline; vs_baseline=0", file=sys.stderr)

    rec = {
        "metric": "rgbd_detect_project_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 3),
    }
    if len(fps_samples) > 1:
        rec["steady_samples_fps"] = [round(s, 1) for s in fps_samples]
        rec["steady_spread_fps"] = round(max(fps_samples) - min(fps_samples), 1)
    if variant != "n":
        rec["yolo_variant"] = variant
    if os.environ.get("BENCH_STEM", "conv") != "conv":
        rec["stem"] = os.environ["BENCH_STEM"]
    rec.update(
        mfu_fields(
            flops_of(step, variables, arrays, default_dev, jax),
            num_frames, fps, default_dev,
        )
    )
    print(json.dumps(rec))
    if (
        variant == "n"
        and default_dev.platform != "cpu"
        and num_frames >= 256
        and img_size == 640
        and os.environ.get("BENCH_STEM", "conv") == "conv"
        and os.environ.get("BENCH_INPUT_CAST", "f32") == "f32"
        and os.environ.get("BENCH_MEDIAN_SAMPLES", "16") == "16"
        and os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
    ):
        # refresh the committed last-known-good so a future outage round
        # still carries evidence (utils/backend.unavailable_record) — but
        # only for the headline config; a debug-sized run must not
        # overwrite the committed number
        from tpu3dlm.utils.backend import record_last_good

        record_last_good(rec["metric"], fps, rec["unit"])


if __name__ == "__main__":
    main()

"""Streaming vs whole-scan fused inference throughput.

VERDICT round-1 item 3 wants evidence that chunked ingestion
(data/dataset.iter_scan_chunks + FusedScanRunner.run_stream) holds
steady-state fps near the whole-scan number. Both paths here are timed
END-TO-END — host decode + device inference — because that is what
streaming changes: the whole-scan path decodes everything, then infers;
the streaming path overlaps decode with device compute, so it can win
end-to-end even though it adds chunk dispatch overhead.

Run (TPU):  PYTHONPATH=/root/.axon_site:/root/repo \
                python scripts/bench_stream.py [--frames 128] [--chunk 32]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _leg_main(args):
    """Single-leg child for --rss mode: run ONE ingestion leg in a fresh
    process and report its own peak RSS — the memory claim (whole-scan is
    O(scan) host memory, streaming is O(chunk)) is only measurable when
    each leg owns its process high-water mark."""
    import resource

    import numpy as np

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tpu3dlm.utils.backend import enable_compile_cache

    enable_compile_cache()
    from tpu3dlm.data import synthetic
    from tpu3dlm.data.dataset import iter_scan_chunks, load_scan
    from tpu3dlm.pipeline.fused import FusedScanRunner

    root = os.path.join(
        tempfile.gettempdir(), f"tpu3dlm_stream_scan_{args.frames}"
    )
    if not os.path.exists(os.path.join(root, "gold_std", "poses.txt")):
        synthetic.generate_scan(root, "gold_std", num_frames=args.frames)
    base = os.path.join(root, "gold_std", "rtabmap_extract")
    dirs = dict(
        image_dir=os.path.join(base, "data_rgb"),
        depth_image_dir=os.path.join(base, "data_depth"),
        calibration_dir=os.path.join(base, "calibration"),
        pose_path=os.path.join(root, "gold_std", "poses.txt"),
    )
    runner = FusedScanRunner(img_size=args.img_size, max_det=64)

    def stream():
        return runner.run_stream(
            iter_scan_chunks(
                chunk_frames=args.chunk, img_size=args.img_size, **dirs
            )
        )

    def whole():
        return runner(load_scan(img_size=args.img_size, **dirs))

    leg = {"whole": whole, "stream": stream}[args.leg]
    # warm compiles with a leg-matched tiny pass so the warmup itself
    # cannot set the high-water mark the leg is trying to demonstrate:
    # streaming warms through the chunk program only
    leg()
    t0 = time.perf_counter()
    det, _ = leg()
    wall = time.perf_counter() - t0
    n = int(np.asarray(det.mask).shape[0])
    print(
        json.dumps(
            {
                "leg": args.leg,
                "frames": n,
                "wall_s": round(wall, 2),
                "fps": round(n / wall, 1),
                "maxrss_mb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
                ),
                "kept": int(np.asarray(det.mask).sum()),
            }
        )
    )


def _rss_main(args):
    """--rss orchestrator: run whole-scan and streaming legs in SEPARATE
    subprocesses (the parent never initialises the device — only one
    process can hold the TPU) and aggregate their peak-RSS reports."""
    import subprocess

    me = os.path.abspath(__file__)
    out = {"metric": "stream_vs_whole_memory", "frames": args.frames,
           "chunk": args.chunk}
    kept = {}
    for leg in ("whole", "stream"):
        cmd = [sys.executable, me, "--leg", leg, "--frames", str(args.frames),
               "--chunk", str(args.chunk), "--img-size", str(args.img_size)]
        if args.cpu:
            cmd.append("--cpu")
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=5400)
        if r.returncode != 0:
            print(f"{leg} leg failed: {r.stderr.strip()[-500:]}", file=sys.stderr)
            sys.exit(1)
        rep = json.loads(r.stdout.strip().splitlines()[-1])
        out[f"{leg}_fps"] = rep["fps"]
        out[f"{leg}_maxrss_mb"] = rep["maxrss_mb"]
        kept[leg] = rep["kept"]
    if kept["whole"] != kept["stream"]:
        print(
            f"SANITY FAILURE: kept-detection counts differ {kept}",
            file=sys.stderr,
        )
        out["sanity_ok"] = False
    else:
        out["sanity_ok"] = True
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--rss", action="store_true",
        help="memory-evidence mode: run whole vs stream legs in separate "
        "subprocesses and report each leg's own peak RSS",
    )
    ap.add_argument("--leg", choices=("whole", "stream"), default=None,
                    help=argparse.SUPPRESS)  # internal: --rss child
    args = ap.parse_args()
    if args.leg:
        return _leg_main(args)
    if args.rss:
        return _rss_main(args)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from tpu3dlm.utils.backend import enable_compile_cache

    enable_compile_cache()

    from tpu3dlm.data import synthetic
    from tpu3dlm.data.dataset import iter_scan_chunks, load_scan
    from tpu3dlm.pipeline.fused import FusedScanRunner

    root = os.path.join(
        tempfile.gettempdir(), f"tpu3dlm_stream_scan_{args.frames}"
    )
    marker = os.path.join(root, "gold_std", "poses.txt")
    if not os.path.exists(marker):
        synthetic.generate_scan(root, "gold_std", num_frames=args.frames)
    base = os.path.join(root, "gold_std", "rtabmap_extract")
    dirs = dict(
        image_dir=os.path.join(base, "data_rgb"),
        depth_image_dir=os.path.join(base, "data_depth"),
        calibration_dir=os.path.join(base, "calibration"),
        pose_path=os.path.join(root, "gold_std", "poses.txt"),
    )

    runner = FusedScanRunner(img_size=args.img_size, max_det=64)

    # warmup: compile both the full-chunk program (streaming uses chunk-
    # sized batches) and the whole-scan program
    warm = load_scan(img_size=args.img_size, **dirs)
    runner(warm)
    runner.run_stream(
        iter_scan_chunks(chunk_frames=args.chunk, img_size=args.img_size, **dirs)
    )
    del warm

    t0 = time.perf_counter()
    scan = load_scan(img_size=args.img_size, **dirs)
    det_w, _ = runner(scan)
    t_whole = time.perf_counter() - t0
    n = scan.num_frames
    del scan

    t0 = time.perf_counter()
    det_s, _ = runner.run_stream(
        iter_scan_chunks(chunk_frames=args.chunk, img_size=args.img_size, **dirs)
    )
    t_stream = time.perf_counter() - t0

    # cached streaming: pass 1 decodes + writes the scanpack, pass 2 serves
    # memory-mapped chunks with zero image decodes (the production repeat-
    # run / replay path). Timed pass is the cached one.
    pack = os.path.join(base, f"scan_{args.img_size}.pack")
    if os.path.exists(pack):
        os.remove(pack)
    runner.run_stream(
        iter_scan_chunks(
            chunk_frames=args.chunk, img_size=args.img_size, cache=True, **dirs
        )
    )
    t0 = time.perf_counter()
    det_c, _ = runner.run_stream(
        iter_scan_chunks(
            chunk_frames=args.chunk, img_size=args.img_size, cache=True, **dirs
        )
    )
    t_cached = time.perf_counter() - t0

    import numpy as np

    if not np.array_equal(det_s.mask, det_w.mask):
        print("SANITY FAILURE: stream/whole detections differ", file=sys.stderr)
    if not np.array_equal(det_c.mask, det_w.mask):
        print("SANITY FAILURE: cached-stream detections differ", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "stream_vs_whole_fused_e2e",
                "frames": n,
                "chunk": args.chunk,
                "whole_fps": round(n / t_whole, 1),
                "stream_fps": round(n / t_stream, 1),
                "stream_cached_fps": round(n / t_cached, 1),
                "stream_over_whole": round(t_whole / t_stream, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

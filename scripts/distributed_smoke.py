"""Multi-process `jax.distributed` smoke: the REAL multi-controller path.

VERDICT r2 item 7/"next round" 4: all prior multi-device evidence was
single-process virtual-device; this script launches N OS processes that
initialise through `jax.distributed.initialize` (gloo CPU collectives,
``--devices-per-proc`` local devices each — each process models one host),
build the N·D-device GLOBAL mesh, and run

  1. the sharded fused scan step (detect → rectify → classify → project,
     frame axis sharded over the cross-process mesh)      [2-proc mode]
  2. one DP finetune train step (`shard_map` + pmean gradient all-reduce
     crossing the process boundary)                       [2-proc mode]
  3. query-sharded ICP: the registration query axis spans the process
     boundary (GSPMD partitions the whole solve; its correspondence and
     normal-equation reductions cross processes)          [all modes]
  4. target-sharded NN: explicit `shard_map` + all_gather + argmin across
     the process boundary (parallel/nn.target_sharded_nn) [all modes]

then the parent compares everything against the single-process reference
and prints ONE JSON line: {"metric": "distributed_<N>proc_smoke", ...}.

Run standalone:
    python scripts/distributed_smoke.py                  # 2 procs × 1 dev
    python scripts/distributed_smoke.py --procs 4 --devices-per-proc 2

(The 4×2 mode runs legs 3+4 only: the fused-step compile is the cost hog
on this 1-core host and its cross-process parity is already certified by
the 2-proc artifact; the 4-proc artifact exists to certify the ALIGNMENT
collectives at >2 processes — VERDICT r3 task 6.)

Exercised in CI via tests/test_parallel.py (2-proc quick path and the
4-proc slow-tier test).

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


def _nn_data():
    """Deterministic registration problem for the alignment legs: query =
    rotated+translated subset of the target (a real ICP basin). Sizes
    divide every supported global device count (2, 4, 8)."""
    rng = np.random.default_rng(7)
    t = rng.uniform(-1, 1, (1024, 3)).astype(np.float32)
    ang = 0.08
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    q = (t[:512] @ R.T + np.array([0.05, -0.03, 0.02], np.float32)).astype(
        np.float32
    )
    return q, t


def _params(yolo, beit):
    import jax
    import jax.numpy as jnp

    yolo_vars = yolo.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32))
    beit_vars = beit.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROPSZ, CROPSZ, 3), jnp.float32)
    )
    return yolo_vars, beit_vars


def child(process_id: int, port: int, out_dir: str, procs: int = 2,
          devices_per_proc: int = 1) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if devices_per_proc > 1:
        jax.config.update("jax_num_cpu_devices", devices_per_proc)

    from tpu3dlm.parallel.mesh import distributed_init

    distributed_init(
        coordinator=f"localhost:{port}", num_processes=procs,
        process_id=process_id,
    )
    assert jax.process_count() == procs, "distributed bring-up failed"

    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()  # global: devices_per_proc CPU devices per process
    assert len(devs) == procs * devices_per_proc, devs
    mesh = Mesh(np.array(devs), ("batch",))
    sharded = NamedSharding(mesh, P("batch"))
    rep = NamedSharding(mesh, P())

    def gput(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharded, lambda idx: x[idx]
        )

    saved = {}
    if procs == 2 and devices_per_proc == 1:
        # legs 1+2 (fused scan + finetune) — 2-proc mode only: the YOLO
        # compile dominates a 1-core host and the >2-proc artifact exists
        # for the alignment collectives (module docstring)
        from tpu3dlm.parallel.finetune import make_beit_train_step
        from tpu3dlm.parallel.inference import (
            sharded_full_scan_step, square_box_affine,
        )

        rgb, depth, intr, rgb_size, poses, crops, labels = _data()
        affine = square_box_affine(rgb_size, S)
        yolo, beit = _models()
        yolo_vars, beit_vars = _params(yolo, beit)
        yolo_r = jax.device_put(yolo_vars, rep)
        beit_r = jax.device_put(beit_vars, rep)

        step = sharded_full_scan_step(mesh, yolo, beit, img_size=S, max_det=4)
        out = step(
            yolo_r, beit_r, gput(rgb), gput(depth), gput(intr),
            gput(rgb_size), gput(poses), gput(affine),
        )
        # each process saves ITS local shard (rows of the global frame axis)
        saved.update(
            {k: np.asarray(v.addressable_shards[0].data) for k, v in out.items()}
        )

        tx = optax.adamw(1e-3)
        train = make_beit_train_step(beit, tx, mesh)
        params = jax.device_put(beit_vars, rep)
        opt_state = jax.device_put(tx.init(beit_vars), rep)
        new_params, _, loss = train(
            params, opt_state, gput(crops), gput(labels)
        )
        saved["loss"] = float(np.asarray(loss.addressable_shards[0].data))
        saved["leaf"] = np.asarray(
            jax.tree.leaves(new_params)[0].addressable_shards[0].data
        )

    # legs 3+4 (all modes): the ICP query axis spans the process boundary,
    # and the target-sharded NN's all_gather+argmin crosses it explicitly
    from tpu3dlm.ops.icp import icp
    from tpu3dlm.parallel.nn import target_sharded_nn

    q_np, t_np = _nn_data()
    res = icp(
        gput(q_np), jax.device_put(t_np, rep),
        iterations=6, max_correspondence_dist=0.5,
    )
    saved["icp_T"] = np.asarray(res.transform.addressable_shards[0].data)
    saved["icp_rmse"] = float(np.asarray(res.rmse.addressable_shards[0].data))

    idx, d2 = target_sharded_nn(mesh)(jax.device_put(q_np, rep), gput(t_np))
    saved["nn_idx"] = np.asarray(idx.addressable_shards[0].data)
    saved["nn_d2"] = np.asarray(d2.addressable_shards[0].data)

    np.savez(os.path.join(out_dir, f"proc{process_id}.npz"), **saved)
    print(f"proc {process_id} ok", flush=True)


def reference(out_path: str, fused_legs: bool = True) -> None:
    """Single-process, single-device reference results."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    saved = {}
    if fused_legs:
        import optax

        from tpu3dlm.parallel.finetune import make_beit_train_step
        from tpu3dlm.parallel.inference import (
            full_scan_step_fn, square_box_affine,
        )
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
            beit_vars, tx.init(beit_vars), jnp.asarray(crops),
            jnp.asarray(labels),
        )
        saved["loss"] = float(loss)
        saved["leaf"] = np.asarray(jax.tree.leaves(new_params)[0])
        saved.update({k: np.asarray(v) for k, v in out.items()})

    from tpu3dlm.ops.icp import icp
    from tpu3dlm.ops.pallas.pairwise import nearest_neighbors_xla

    q_np, t_np = _nn_data()
    res = icp(
        jnp.asarray(q_np), jnp.asarray(t_np),
        iterations=6, max_correspondence_dist=0.5,
    )
    saved["icp_T"] = np.asarray(res.transform)
    saved["icp_rmse"] = float(res.rmse)
    idx, d2 = nearest_neighbors_xla(jnp.asarray(q_np), jnp.asarray(t_np))
    saved["nn_idx"] = np.asarray(idx)
    saved["nn_d2"] = np.asarray(d2)
    np.savez(out_path, **saved)


def main(n_procs: int = 2, devices_per_proc: int = 1) -> int:
    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out_dir = tempfile.mkdtemp(prefix="tpu3dlm_dist_")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # children configure their own device count
    me = os.path.abspath(__file__)
    metric = f"distributed_{n_procs}proc_smoke"
    procs = [
        subprocess.Popen(
            [sys.executable, me, "--child", str(i), "--port", str(port),
             "--out-dir", out_dir, "--procs", str(n_procs),
             "--devices-per-proc", str(devices_per_proc)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(n_procs)
    ]
    try:
        outs = [p.communicate(timeout=1200) for p in procs]
    finally:
        for p in procs:  # a timeout must not leave the siblings running
            if p.poll() is None:
                p.kill()
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or f"proc {i} ok" not in out:
            print(json.dumps({
                "metric": metric, "ok": False,
                "error": f"proc {i} rc={p.returncode}: {err[-800:]}",
            }))
            return 1

    fused_legs = n_procs == 2 and devices_per_proc == 1
    ref_path = os.path.join(out_dir, "ref.npz")
    reference(ref_path, fused_legs=fused_legs)
    ref = np.load(ref_path)
    loaded = [
        np.load(os.path.join(out_dir, f"proc{i}.npz")) for i in range(n_procs)
    ]
    p0 = loaded[0]

    rec = {"metric": metric, "ok": True,
           "devices_per_proc": devices_per_proc,
           "global_devices": n_procs * devices_per_proc}
    ok = True
    if fused_legs:
        diffs = {}
        for k in ("boxes", "conf", "label", "damage", "mask", "corners"):
            got = np.concatenate([pp[k] for pp in loaded], axis=0)
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
        cross_proc = float(
            np.max(np.abs(p0["leaf"] - loaded[1]["leaf"]))
        )
        ok &= loss_diff < 1e-5 and leaf_diff < 1e-5 and cross_proc == 0.0
        rec.update(
            fused_diffs=diffs,
            finetune_loss_diff=loss_diff,
            finetune_param_leaf_diff=leaf_diff,
            cross_process_param_divergence=cross_proc,
        )

    # alignment legs (all modes): the ICP transform solved with its query
    # axis spanning processes must match the single-device solve (f32
    # reduction order differs under sharding — small tolerance), agree
    # ACROSS processes exactly, and the target-sharded NN must reproduce
    # the exact single-device indices through its cross-process all_gather
    icp_ref_diff = float(np.max(np.abs(p0["icp_T"] - ref["icp_T"])))
    icp_cross = max(
        float(np.max(np.abs(pp["icp_T"] - p0["icp_T"]))) for pp in loaded
    )
    nn_idx_ok = all(
        bool(np.array_equal(pp["nn_idx"], ref["nn_idx"])) for pp in loaded
    )
    nn_d2_diff = max(
        float(np.max(np.abs(pp["nn_d2"] - ref["nn_d2"]))) for pp in loaded
    )
    ok &= icp_ref_diff < 1e-3 and icp_cross == 0.0
    ok &= nn_idx_ok and nn_d2_diff < 1e-5
    rec.update(
        ok=bool(ok),
        icp_transform_vs_reference=icp_ref_diff,
        icp_cross_process_divergence=icp_cross,
        nn_indices_exact=nn_idx_ok,
        nn_d2_diff=nn_d2_diff,
    )
    print(json.dumps(rec))
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--out-dir", default="")
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=1)
    args = ap.parse_args()
    if args.child is None:
        sys.exit(main(args.procs, args.devices_per_proc))
    child(args.child, args.port, args.out_dir, args.procs,
          args.devices_per_proc)

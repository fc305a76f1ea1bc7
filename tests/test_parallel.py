"""Multi-chip tests on the virtual 8-device CPU mesh: sharded full-scan
inference and the DP finetune step (SURVEY.md §4: distributed behavior is
validated with xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpu3dlm.models.beit import BeitClassifier, BeitConfig
from tpu3dlm.models.yolov10 import YOLOv10
from tpu3dlm.parallel.finetune import init_finetune, make_beit_train_step
from tpu3dlm.parallel.inference import sharded_full_scan_step
from tpu3dlm.parallel.mesh import make_mesh, pad_to_devices, replicate, shard_batch


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    return make_mesh(8)


TINY_BEIT_CFG = BeitConfig(
    image_size=32, hidden_size=32, num_layers=1, num_heads=2,
    intermediate_size=64, num_labels=2,
)


@pytest.fixture(scope="module")
def tiny_models():
    """Shared tiny YOLO+BEiT and their params: five classes used to pay an
    identical init trace each (~3 s a piece on this 1-core host)."""
    yolo = YOLOv10(nc=3, variant="n")
    beit = BeitClassifier(TINY_BEIT_CFG)
    yolo_vars = yolo.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    beit_vars = beit.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    return yolo, beit, yolo_vars, beit_vars


class TestMesh:
    def test_make_mesh(self, mesh8):
        assert mesh8.devices.size == 8
        assert mesh8.axis_names == ("batch",)

    def test_too_many_devices(self):
        with pytest.raises(ValueError):
            make_mesh(10_000)

    def test_pad_and_shard(self, mesh8):
        x = np.ones((13, 4), np.float32)
        (xp,), n = pad_to_devices((x,), mesh8)
        assert xp.shape == (16, 4) and n == 13
        xs = shard_batch(xp, mesh8)
        assert len(xs.sharding.device_set) == 8


class TestShardedInference:
    def test_full_scan_step_8dev(self, mesh8, tiny_models):
        F, S = 8, 64
        yolo, beit, yolo_vars, beit_vars = tiny_models
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 255, size=(F, S, S, 3)).astype(np.uint8)
        depth = np.full((F, 64, 48), 2000.0, np.float32)
        intr = np.tile(np.array([100.0, 100.0, 32.0, 32.0], np.float32), (F, 1))
        rgb_size = np.tile(np.array([S, S], np.float32), (F, 1))
        poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (F, 1))


        from tpu3dlm.parallel.inference import square_box_affine

        step = sharded_full_scan_step(mesh8, yolo, beit, img_size=S, max_det=4)
        yolo_r = replicate(yolo_vars, mesh8)
        beit_r = replicate(beit_vars, mesh8)
        batch = shard_batch(
            (jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(intr),
             jnp.asarray(rgb_size), jnp.asarray(poses),
             jnp.asarray(square_box_affine(rgb_size, S))),
            mesh8,
        )
        out = step(yolo_r, beit_r, *batch)
        assert out["corners"].shape == (F, 4, 4, 3)
        assert out["damage"].shape == (F, 4)
        # outputs are sharded over the mesh
        assert len(out["corners"].sharding.device_set) == 8

    def test_sharded_matches_single_device(self, mesh8, tiny_models):
        """The mesh must not change numerics (modulo float noise)."""
        F, S = 8, 64
        yolo, beit, yolo_vars, beit_vars = tiny_models
        rng = np.random.default_rng(1)
        rgb = rng.integers(0, 255, size=(F, S, S, 3)).astype(np.uint8)
        depth = np.full((F, 64, 48), 2000.0, np.float32)
        intr = np.tile(np.array([100.0, 100.0, 32.0, 32.0], np.float32), (F, 1))
        rgb_size = np.tile(np.array([S, S], np.float32), (F, 1))
        poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (F, 1))

        from tpu3dlm.parallel.inference import full_scan_step_fn, square_box_affine

        affine = jnp.asarray(square_box_affine(rgb_size, S))
        single = jax.jit(full_scan_step_fn(yolo, beit, S, 4, 0.25))
        want = single(yolo_vars, beit_vars, jnp.asarray(rgb), jnp.asarray(depth),
                      jnp.asarray(intr), jnp.asarray(rgb_size), jnp.asarray(poses),
                      affine)

        step = sharded_full_scan_step(mesh8, yolo, beit, img_size=S, max_det=4)
        got = step(
            replicate(yolo_vars, mesh8), replicate(beit_vars, mesh8),
            *shard_batch((jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(intr),
                          jnp.asarray(rgb_size), jnp.asarray(poses), affine), mesh8),
        )
        np.testing.assert_allclose(
            np.asarray(got["corners"]), np.asarray(want["corners"]), atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(got["label"]), np.asarray(want["label"]))


class TestShardedCropBudget:
    def test_budget_selection_matches_single_device(self, mesh8, tiny_models):
        """crop_budget < F·max_det under sharding: the global top-k crop
        selection + scatter must pick the SAME crops as the single-device
        program (VERDICT round-1 weak #3 — previously only tested at
        k = F·D where selection is a no-op). Relies on GSPMD lowering the
        program's global top-k correctly over the sharded frame axis."""
        F, S, D, BUDGET = 8, 64, 4, 6
        yolo, beit, yolo_vars, beit_vars = tiny_models
        rng = np.random.default_rng(7)
        rgb = rng.integers(0, 255, size=(F, S, S, 3)).astype(np.uint8)
        depth = np.full((F, 64, 48), 2000.0, np.float32)
        intr = np.tile(np.array([100.0, 100.0, 32.0, 32.0], np.float32), (F, 1))
        rgb_size = np.tile(np.array([S, S], np.float32), (F, 1))
        poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (F, 1))

        from tpu3dlm.parallel.inference import full_scan_step_fn, square_box_affine

        affine = jnp.asarray(square_box_affine(rgb_size, S))
        # conf_thresh 0 so every padded slot is a live candidate and the
        # budget (6) genuinely truncates the 32 slots
        single = jax.jit(
            full_scan_step_fn(yolo, beit, S, D, 0.0, crop_budget=BUDGET)
        )
        want = single(yolo_vars, beit_vars, jnp.asarray(rgb), jnp.asarray(depth),
                      jnp.asarray(intr), jnp.asarray(rgb_size), jnp.asarray(poses),
                      affine)
        n_classified = int((np.asarray(want["damage"]) >= 0).sum())
        assert 0 < n_classified <= BUDGET  # the budget actually bit

        step = sharded_full_scan_step(
            mesh8, yolo, beit, img_size=S, max_det=D, conf_thresh=0.0,
            crop_budget=BUDGET,
        )
        got = step(
            replicate(yolo_vars, mesh8), replicate(beit_vars, mesh8),
            *shard_batch((jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(intr),
                          jnp.asarray(rgb_size), jnp.asarray(poses), affine), mesh8),
        )
        # identical selection AND identical classifications
        np.testing.assert_array_equal(
            np.asarray(got["damage"]), np.asarray(want["damage"])
        )
        np.testing.assert_allclose(
            np.asarray(got["conf"]), np.asarray(want["conf"]), atol=1e-5
        )


class TestFinetune:
    def test_dp_train_step_decreases_loss(self, mesh8):
        beit = BeitClassifier(
            BeitConfig(image_size=32, hidden_size=32, num_layers=1, num_heads=2,
                       intermediate_size=64, num_labels=2)
        )
        params, tx, opt_state = init_finetune(beit, jax.random.PRNGKey(0), lr=5e-3)
        step = make_beit_train_step(beit, tx, mesh8)

        rng = np.random.default_rng(0)
        # learnable toy task: class = bright vs dark crop
        labels = np.tile(np.array([0, 1], np.int32), 8)[:16]
        crops = np.where(
            labels[:, None, None, None] == 1,
            rng.integers(180, 255, size=(16, 32, 32, 3)),
            rng.integers(0, 70, size=(16, 32, 32, 3)),
        ).astype(np.uint8)

        crops_s = shard_batch(jnp.asarray(crops), mesh8)
        labels_s = shard_batch(jnp.asarray(labels), mesh8)
        params_r = replicate(params, mesh8)
        opt_r = replicate(opt_state, mesh8)

        losses = []
        for _ in range(5):
            params_r, opt_r, loss = step(params_r, opt_r, crops_s, labels_s)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses


class TestMultiChipNN:
    """Multi-chip nearest-neighbour scaling (parallel/nn.py): query-sharded
    and target-sharded variants must equal the single-device kernels."""

    def test_target_sharded_matches_single(self, mesh8, rng):
        from tpu3dlm.parallel.nn import target_sharded_nn
        from tpu3dlm.ops.pallas.pairwise import nearest_neighbors_xla

        a = rng.normal(size=(256, 3)).astype(np.float32)
        b = rng.normal(size=(8 * 300, 3)).astype(np.float32)
        idx1, d21 = nearest_neighbors_xla(jnp.asarray(a), jnp.asarray(b))
        nn = target_sharded_nn(mesh8)
        idx2, d22 = nn(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
        np.testing.assert_allclose(np.asarray(d21), np.asarray(d22), atol=1e-5)

    def test_query_sharded_icp_matches_single(self, mesh8, rng):
        from tpu3dlm.ops.icp import icp_point_to_plane
        from tpu3dlm.ops.pointcloud import estimate_normals_grid
        from tpu3dlm.parallel.nn import shard_queries

        n = 2000
        base = np.concatenate([
            np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), np.full(n, 2.0)], 1),
            np.stack([rng.uniform(-1, 1, n // 2), np.full(n // 2, 1.0),
                      rng.uniform(1, 2, n // 2)], 1),
            np.stack([np.full(n // 2, -1.0), rng.uniform(-1, 1, n // 2),
                      rng.uniform(1, 2, n // 2)], 1),
        ]).astype(np.float32)
        src = base[rng.choice(base.shape[0], 1024, replace=False)] + np.array(
            [0.05, -0.03, 0.08], np.float32
        )
        normals = jnp.asarray(estimate_normals_grid(base, voxel=0.2))

        want = icp_point_to_plane(
            jnp.asarray(src), jnp.asarray(base), normals,
            max_correspondence_dist=0.5, iterations=10,
        )
        qs, tr = shard_queries(mesh8, jnp.asarray(src), jnp.asarray(base))
        nr = jax.device_put(
            normals, jax.sharding.NamedSharding(mesh8, jax.sharding.PartitionSpec())
        )
        got = icp_point_to_plane(
            qs, tr, nr, max_correspondence_dist=0.5, iterations=10
        )
        np.testing.assert_allclose(
            np.asarray(got.transform), np.asarray(want.transform), atol=1e-4
        )
        assert len(qs.sharding.device_set) == 8


class TestDistributedInit:
    def test_single_host_bringup(self):
        """distributed_init() performs a real 1-process coordinator bring-up
        (the framework's communication-backend path, SURVEY.md §5) — run in
        a fresh subprocess because the runtime must start before backends."""
        import os
        import subprocess
        import sys

        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu');\n"
            "from tpu3dlm.parallel.mesh import distributed_init\n"
            "distributed_init()\n"
            "assert jax.process_count() == 1\n"
            "import jax.numpy as jnp\n"
            "assert float(jnp.sum(jnp.arange(4.0))) == 6.0\n"
            "print('bringup-ok')\n"
        )
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=300, env=env,
        )
        assert "bringup-ok" in out.stdout, out.stderr[-800:]

    def test_noop_when_backends_up(self):
        from tpu3dlm.parallel.mesh import distributed_init

        distributed_init()  # backends already initialised → swallowed no-op

    def test_two_process_collective(self):
        """REAL multi-process bring-up: two OS processes initialise through
        `distributed_init(coordinator, num_processes=2, process_id=i)` with
        gloo CPU collectives and run a cross-process `psum` over the global
        2-device mesh — the actual DCN code path (each process models one
        host), not a virtual-device simulation. Both must agree on the
        globally-reduced value."""
        import os
        import socket
        import subprocess
        import sys

        # ephemeral coordinator port: a hardcoded one collides when two
        # suite runs share the machine (bind-then-release keeps the race
        # window tiny)
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        code = (
            "import sys\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "jax.config.update('jax_cpu_collectives_implementation', 'gloo')\n"
            "from tpu3dlm.parallel.mesh import distributed_init\n"
            "pid = int(sys.argv[1])\n"
            f"distributed_init(coordinator='localhost:{port}',\n"
            "                 num_processes=2, process_id=pid)\n"
            "assert jax.process_count() == 2\n"
            "import numpy as np\n"
            "import jax.numpy as jnp\n"
            "from jax.sharding import Mesh, NamedSharding, PartitionSpec as P\n"
            "devs = jax.devices()  # global: 1 local device per process\n"
            "assert len(devs) == 2, devs\n"
            "mesh = Mesh(np.array(devs), ('batch',))\n"
            "local = jnp.full((1, 4), float(pid + 1))\n"
            "g = jax.make_array_from_single_device_arrays(\n"
            "    (2, 4), NamedSharding(mesh, P('batch')),\n"
            "    [jax.device_put(local, jax.local_devices()[0])])\n"
            "f = jax.shard_map(lambda a: jax.lax.psum(jnp.sum(a), 'batch'),\n"
            "                  mesh=mesh, in_specs=P('batch'), out_specs=P())\n"
            "out = jax.jit(f)(g)\n"
            "val = float(out.addressable_shards[0].data)\n"
            "assert val == 12.0, val  # 4*1 (proc 0) + 4*2 (proc 1)\n"
            "print(f'proc {pid} psum-ok', flush=True)\n"
        )
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env.pop("XLA_FLAGS", None)  # 1 device per process, not the test mesh
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", code, str(i)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env,
            )
            for i in range(2)
        ]
        try:
            outs = [p.communicate(timeout=300) for p in procs]
        finally:
            for p in procs:  # a timeout must not leave the sibling running
                if p.poll() is None:
                    p.kill()
        for i, (p, (out, err)) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} rc={p.returncode}: {err[-800:]}"
            assert f"proc {i} psum-ok" in out, (out, err[-400:])


class TestPallasAttentionUnderMesh:
    """VERDICT r2 item 2: the fused Pallas BEiT attention kernel must stay
    active under multi-chip sharding (pipeline/fused.py used to silently
    fall back to einsum for mesh_devices > 1). The sharded step now runs
    the classify under shard_map, so the kernel partitions per-device."""

    def _data(self, F, S, seed=3):
        rng = np.random.default_rng(seed)
        rgb = rng.integers(0, 255, size=(F, S, S, 3)).astype(np.uint8)
        depth = np.full((F, 64, 48), 2000.0, np.float32)
        intr = np.tile(np.array([100.0, 100.0, 32.0, 32.0], np.float32), (F, 1))
        rgb_size = np.tile(np.array([S, S], np.float32), (F, 1))
        poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (F, 1))
        return rgb, depth, intr, rgb_size, poses

    def test_kernel_active_on_mesh_and_matches_einsum(self, mesh8, monkeypatch, tiny_models):
        import dataclasses

        from tpu3dlm.ops.pallas import attention
        from tpu3dlm.parallel.inference import square_box_affine

        calls = {"n": 0}
        orig = attention.beit_attention_packed_pallas

        def counting(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        monkeypatch.setattr(attention, "beit_attention_packed_pallas", counting)
        # run the REAL kernel (interpret mode) on the CPU mesh — not the
        # einsum twin — so this validates the pallas_call inside shard_map
        monkeypatch.setattr(attention, "FORCE_INTERPRET", True)

        F, S = 8, 64
        cfg_p = BeitConfig(
            image_size=32, hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, num_labels=2, attn_impl="pallas",
        )
        cfg_e = dataclasses.replace(cfg_p, attn_impl="einsum")
        # param structure is impl-independent — the shared fixture's tree
        # drives both attention paths
        yolo, _, yolo_vars, beit_vars = tiny_models
        beit_p = BeitClassifier(cfg_p)
        beit_e = BeitClassifier(cfg_e)
        rgb, depth, intr, rgb_size, poses = self._data(F, S)

        affine = jnp.asarray(square_box_affine(rgb_size, S))
        batch = shard_batch(
            (jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(intr),
             jnp.asarray(rgb_size), jnp.asarray(poses), affine),
            mesh8,
        )
        yolo_r, beit_r = replicate(yolo_vars, mesh8), replicate(beit_vars, mesh8)

        step_p = sharded_full_scan_step(mesh8, yolo, beit_p, img_size=S, max_det=4)
        got = step_p(yolo_r, beit_r, *batch)
        assert calls["n"] >= 1, "pallas kernel was not traced into the mesh program"
        assert len(got["damage"].sharding.device_set) == 8

        step_e = sharded_full_scan_step(mesh8, yolo, beit_e, img_size=S, max_det=4)
        want = step_e(yolo_r, beit_r, *batch)
        np.testing.assert_array_equal(
            np.asarray(got["damage"]), np.asarray(want["damage"])
        )
        np.testing.assert_allclose(
            np.asarray(got["conf"]), np.asarray(want["conf"]), atol=1e-5
        )

    def test_fused_runner_no_longer_downgrades_attn_impl(self):
        from tpu3dlm.models.weights import init_template
        from tpu3dlm.pipeline.fused import FusedScanRunner

        # zero-compile param templates — this asserts config handling only,
        # so paying a cold yolo.init compile (~25 s) would be pure waste
        cfg = BeitConfig(
            image_size=32, hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, num_labels=2,
        )
        yolo = YOLOv10(nc=3, variant="n")
        beit = BeitClassifier(cfg)
        runner = FusedScanRunner(
            img_size=64, max_det=4, nc=3, variant="n", beit_config=cfg,
            yolo_variables=init_template(yolo, jnp.zeros((1, 64, 64, 3))),
            beit_variables=init_template(beit, jnp.zeros((1, 32, 32, 3))),
            mesh_devices=8,
        )
        assert runner.beit.cfg.attn_impl == "auto"

    def test_shard_map_classify_pads_non_divisible_budget(
        self, mesh8, tiny_models, monkeypatch
    ):
        """crop_budget not divisible by the mesh size must still work (the
        shard_map wrapper pads the crop axis and trims the logits). The
        wrapper only engages for the pallas attention path — einsum stays
        plain GSPMD — so force the kernel (interpret mode on CPU)."""
        import dataclasses

        from tpu3dlm.ops.pallas import attention
        from tpu3dlm.parallel.inference import square_box_affine

        monkeypatch.setattr(attention, "FORCE_INTERPRET", True)
        F, S, BUDGET = 8, 64, 5  # 5 % 8 != 0
        yolo, _, yolo_vars, beit_vars = tiny_models
        beit = BeitClassifier(
            dataclasses.replace(TINY_BEIT_CFG, attn_impl="pallas")
        )
        rgb, depth, intr, rgb_size, poses = self._data(F, S, seed=11)
        affine = jnp.asarray(square_box_affine(rgb_size, S))
        step = sharded_full_scan_step(
            mesh8, yolo, beit, img_size=S, max_det=4, conf_thresh=0.0,
            crop_budget=BUDGET,
        )
        out = step(
            replicate(yolo_vars, mesh8), replicate(beit_vars, mesh8),
            *shard_batch((jnp.asarray(rgb), jnp.asarray(depth),
                          jnp.asarray(intr), jnp.asarray(rgb_size),
                          jnp.asarray(poses), affine), mesh8),
        )
        n_classified = int((np.asarray(out["damage"]) >= 0).sum())
        assert 0 < n_classified <= BUDGET


@pytest.mark.slow
def test_two_process_fused_and_finetune_steps():
    """Full multi-controller exercise (VERDICT r2 item 4): 2 OS processes
    through `jax.distributed.initialize` run the sharded fused scan step
    AND one DP finetune step over the cross-process mesh; the script's
    parent asserts parity with single-process results and prints one JSON
    line with ok=true. See scripts/distributed_smoke.py."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "distributed_smoke.py")],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] is True, rec
    assert rec["fused_diffs"]["corners"] < 1e-4
    assert rec["cross_process_param_divergence"] == 0.0
    # the 2-proc artifact also carries the alignment legs now
    assert rec["nn_indices_exact"] is True
    assert rec["icp_cross_process_divergence"] == 0.0


@pytest.mark.slow
def test_four_process_icp_alignment_legs():
    """VERDICT r3 task 6: 4 OS processes × 2 virtual devices each run the
    alignment-leg collectives over the 8-device cross-process mesh — the
    ICP query axis spans process boundaries (GSPMD) and the target-sharded
    NN's all_gather+argmin crosses them explicitly — with parity against
    the single-process solve and exact cross-process agreement."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "distributed_smoke.py"),
         "--procs", "4", "--devices-per-proc", "2"],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] is True, rec
    assert rec["global_devices"] == 8
    assert rec["nn_indices_exact"] is True
    assert rec["icp_transform_vs_reference"] < 1e-3
    assert rec["icp_cross_process_divergence"] == 0.0

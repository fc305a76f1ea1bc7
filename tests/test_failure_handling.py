"""Failure-detection parity tests (SURVEY.md §5): corrupt/missing inputs
must fail loudly at ingestion or degrade exactly the way the reference
does (pickle-write swallow, gold-std None-on-missing — covered in
test_pipeline_e2e) — never produce silently-wrong arrays.
"""

import os

import numpy as np
import pytest

from tpu3dlm.data.dataset import load_depth_image, load_rgb_image
from tpu3dlm.data.ply import load_ply
from tpu3dlm.data.poses import load_poses


class TestIngestionFailures:
    def test_missing_rgb_raises(self):
        with pytest.raises(FileNotFoundError):
            load_rgb_image("/nonexistent/frame.jpg")

    def test_missing_depth_raises(self):
        with pytest.raises(FileNotFoundError):
            load_depth_image("/nonexistent/1.png", 256, 192)

    def test_non_rgba_depth_png_rejected(self, tmp_path):
        """A depth PNG that is not CV_8UC4 cannot be byte-reinterpreted —
        must raise, not mis-decode (reference dataset.py:68-81 depends on
        the exact encoding)."""
        import cv2

        p = str(tmp_path / "bad.png")
        cv2.imwrite(p, np.zeros((8, 8), np.uint8))  # single channel
        with pytest.raises(ValueError, match="CV_8UC4"):
            load_depth_image(p, 8, 8)

    def test_wrong_depth_shape_raises(self, tmp_path):
        import cv2

        from tpu3dlm.data.rtabmap_db import encode_depth

        p = str(tmp_path / "d.png")
        cv2.imwrite(p, encode_depth(np.ones((4, 6), np.float32)))
        with pytest.raises(ValueError):
            load_depth_image(p, 100, 100)  # 24 floats cannot reshape to 10k

    def test_truncated_ply_raises(self, tmp_path):
        p = str(tmp_path / "t.ply")
        with open(p, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")  # no end_header
        with pytest.raises(ValueError):
            load_ply(p)

    def test_non_ply_raises(self, tmp_path):
        p = str(tmp_path / "x.ply")
        with open(p, "wb") as f:
            f.write(b"not a ply at all")
        with pytest.raises(ValueError, match="not a PLY"):
            load_ply(p)

    def test_nan_points_dropped_on_load(self, tmp_path):
        """Open3D remove_nan_points parity (ply.py docstring)."""
        from tpu3dlm.data.ply import save_ply

        pts = np.array([[0, 0, 0], [np.nan, 1, 1], [2, 2, 2]], np.float32)
        p = str(tmp_path / "n.ply")
        save_ply(p, pts)
        loaded, _ = load_ply(p)
        assert loaded.shape == (2, 3)

    def test_missing_poses_raises(self):
        with pytest.raises((FileNotFoundError, OSError)):
            load_poses("/nonexistent/poses.txt")


class TestCheckpointFailures:
    def test_corrupt_msgpack_raises(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from tpu3dlm.models.beit import BeitClassifier, BeitConfig
        from tpu3dlm.models.weights import load_flax_checkpoint

        p = str(tmp_path / "bad.msgpack")
        with open(p, "wb") as f:
            f.write(b"\x00garbage")
        model = BeitClassifier(
            BeitConfig(image_size=32, hidden_size=32, num_layers=1,
                       num_heads=2, intermediate_size=64, num_labels=2)
        )
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        with pytest.raises(Exception):
            load_flax_checkpoint(p, template)

    def test_wrong_architecture_checkpoint_rejected(self, tmp_path):
        """A checkpoint saved for one architecture must not silently load
        into another (structure/shape mismatches raise)."""
        import jax
        import jax.numpy as jnp

        from tpu3dlm.models.beit import BeitClassifier, BeitConfig
        from tpu3dlm.models.weights import load_flax_checkpoint, save_flax_checkpoint

        small = BeitClassifier(
            BeitConfig(image_size=32, hidden_size=32, num_layers=1,
                       num_heads=2, intermediate_size=64, num_labels=2)
        )
        big = BeitClassifier(
            BeitConfig(image_size=32, hidden_size=64, num_layers=2,
                       num_heads=2, intermediate_size=128, num_labels=2)
        )
        vs = small.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        p = str(tmp_path / "small.msgpack")
        save_flax_checkpoint(p, vs)
        template = big.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        with pytest.raises(Exception):
            load_flax_checkpoint(p, template)


class TestBackendProbe:
    def test_probe_backend_succeeds_on_cpu(self):
        """The bench watchdog's tiny-op probe completes on a healthy
        backend and reports its wall-clock (utils/backend.py — benches
        fail fast with a JSON diagnostic when the remote TPU is down)."""
        from tpu3dlm.utils.backend import probe_backend

        took = probe_backend(60.0)
        assert took is not None and took < 60.0

    def test_probe_backend_timeout_returns_none(self, monkeypatch):
        """A probe that cannot finish inside the deadline reports None
        (the caller hard-exits with the diagnostic) instead of hanging."""
        import threading

        import tpu3dlm.utils.backend as backend_mod

        class _StuckThread:
            def __init__(self, target=None, daemon=None):
                pass  # never runs the target — simulates a hung dispatch

            def start(self):
                pass

        monkeypatch.setattr(
            backend_mod.threading, "Thread", _StuckThread
        )
        assert backend_mod.probe_backend(0.05) is None


class TestCorruptGoldPickle:
    """A gold pickle that EXISTS but is unreadable (load_gold_std → None,
    reference task_def.py:200-209 swallow semantics) must not silently
    skip the maintenance comparison stage: the CLI rebuilds the gold
    baseline exactly like the missing-pickle path, and raises loudly when
    even the rebuild cannot be read back."""

    def _env(self, tmp_path, monkeypatch):
        from tpu3dlm.utils.config import ConfigLoader, write_default_config

        cfg_path = str(tmp_path / "configs" / "variables.cfg")
        write_default_config(cfg_path)
        monkeypatch.chdir(tmp_path)  # cli defaults to <cwd>/configs
        cfg_gold = ConfigLoader(cfg_path, "gold_std")
        os.makedirs(os.path.dirname(cfg_gold.pickle_path), exist_ok=True)
        with open(cfg_gold.pickle_path, "wb") as f:
            f.write(b"not a pickle")
        return cfg_path

    def test_cli_rebuilds_gold_on_corrupt_pickle(self, tmp_path, monkeypatch):
        import tpu3dlm.cli as cli
        import tpu3dlm.pipeline.task as task

        self._env(tmp_path, monkeypatch)
        state = {"rebuilt": False}
        calls = []

        def fake_setup(folder, cfg, cfg_goldstd=None, goldstd_var=None):
            calls.append((folder, goldstd_var))
            if folder == "gold_std":
                state["rebuilt"] = True

        monkeypatch.setattr(task, "setup_pipeline", fake_setup)
        monkeypatch.setattr(
            task, "load_gold_std",
            lambda p: {"stub": True} if state["rebuilt"] else None,
        )
        cli.main(["--data", "maintenance"])
        # gold rebuilt first, then maintenance ran WITH the baseline
        assert calls[0][0] == "gold_std"
        assert calls[1][0] == "maintenance"
        assert calls[1][1] == {"stub": True}

    def test_cli_raises_when_rebuild_still_unreadable(self, tmp_path, monkeypatch):
        import tpu3dlm.cli as cli
        import tpu3dlm.pipeline.task as task

        self._env(tmp_path, monkeypatch)
        monkeypatch.setattr(
            task, "setup_pipeline", lambda *a, **k: None
        )
        monkeypatch.setattr(task, "load_gold_std", lambda p: None)
        with pytest.raises(RuntimeError, match="unreadable"):
            cli.main(["--data", "maintenance"])

"""Standalone per-module __main__ harness tests (reference's de-facto test
strategy, SURVEY.md §4: each stage resumes from the pickle checkpoint)."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tpu3dlm.data import synthetic
from tpu3dlm.utils.config import ConfigLoader, write_default_config


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    """A project dir with config + gold_std/maintenance scans + a seeded pickle."""
    root = tmp_path_factory.mktemp("proj")
    cfg_path = str(root / "configs" / "variables.cfg")
    write_default_config(cfg_path)
    text = open(cfg_path).read()
    for a, b in [("img_size = 640", "img_size = 128"),
                 ("num_classes = 80", "num_classes = 3"),
                 ("min_points = 1000", "min_points = 50")]:
        text = text.replace(a, b)
    open(cfg_path, "w").write(text)

    data_root = str(root / "configs" / "data")
    gold = synthetic.generate_scan(data_root, "gold_std", num_frames=3, seed=0)
    maint = synthetic.generate_scan(data_root, "maintenance", num_frames=3, seed=1)

    # seed pickles with GT predictions (damage col inserted at -2)
    for folder, scene in (("gold_std", gold), ("maintenance", maint)):
        cfg = ConfigLoader(cfg_path, folder)
        preds = {
            f: [b[:4] + [0, b[4], b[5]] for b in boxes]
            for f, boxes in scene.gt_boxes_2d.items()
        }
        os.makedirs(os.path.dirname(cfg.pickle_path), exist_ok=True)
        with open(cfg.pickle_path, "wb") as fh:
            pickle.dump({"predictions": preds}, fh)
    return str(root), cfg_path


def run_module(mod, args, cwd):
    env = dict(os.environ, TPU3DLM_PLATFORM="cpu", PYTHONPATH="/root/repo")
    return subprocess.run(
        [sys.executable, "-m", mod, *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=500,
    )


class TestProjectionHarness:
    def test_resume_from_pickle(self, project):
        root, cfg_path = project
        r = run_module(
            "tpu3dlm.mapper.projection",
            ["--data", "gold_std", "--config", cfg_path], cwd=root,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        cfg = ConfigLoader(cfg_path, "gold_std")
        with open(cfg.pickle_path, "rb") as f:
            saved = pickle.load(f)
        assert "global_bboxes_data" in saved
        rows = [r for rows in saved["global_bboxes_data"].values() for r in rows]
        assert rows and len(rows[0]) == 7


class TestMappingHarness:
    def test_point_cloud_export(self, project):
        root, cfg_path = project
        # ensure projection + optimised boxes exist
        cfg = ConfigLoader(cfg_path, "gold_std")
        with open(cfg.pickle_path, "rb") as f:
            saved = pickle.load(f)
        if "global_bboxes_data" not in saved:
            run_module("tpu3dlm.mapper.projection",
                       ["--data", "gold_std", "--config", cfg_path], cwd=root)
            with open(cfg.pickle_path, "rb") as f:
                saved = pickle.load(f)
        saved.setdefault("optimised_bboxes", saved["global_bboxes_data"])
        saved.setdefault("pose_df", None)
        with open(cfg.pickle_path, "wb") as f:
            pickle.dump(saved, f)

        r = run_module(
            "tpu3dlm.mapper.mapping",
            ["--data", "gold_std", "--model", "pc", "--config", cfg_path], cwd=root,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        out = os.path.join(os.path.dirname(cfg.ply_path), "map_pc.ply")
        assert os.path.exists(out)

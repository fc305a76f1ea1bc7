"""End-to-end pipeline tests: gold-std run then maintenance run with
alignment + comparison, through the CLI mode logic (reference
task_def.py:218-249), on synthetic scans with a small test config."""

import os
import pickle

import numpy as np
import pytest

from tpu3dlm.data import synthetic
from tpu3dlm.utils.config import ConfigLoader, write_default_config

# whole-file slow tier: full two-scan pipelines (pyproject markers)
pytestmark = pytest.mark.slow

TEST_OVERRIDES = """
[default]
img_size = 128
batch_size = 2
conf_thresh = 0.45
max_det = 8
num_classes = 3
min_points = 50
visualise = false
preprocess_point_cloud = false
"""


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("proj")
    cfg_path = str(root / "configs" / "variables.cfg")
    write_default_config(cfg_path)
    # append test overrides (later duplicate keys override in configparser? no
    # — same section twice is an error, so patch values inline instead)
    text = open(cfg_path).read()
    for k, v in [
        ("img_size = 640", "img_size = 128"),
        ("batch_size = 64", "batch_size = 2"),
        ("conf_thresh = 0.5", "conf_thresh = 0.45"),
        ("max_det = 64", "max_det = 8"),
        ("num_classes = 80", "num_classes = 3"),
        ("min_points = 1000", "min_points = 50"),
        # this test asserts record/flow structure, not registration
        # accuracy — full-scale ICP (16k × 30 iters) on the CPU suite
        # costs minutes for nothing here
        ("icp_max_points = 16384", "icp_max_points = 2048"),
        ("icp_iterations = 30", "icp_iterations = 10"),
    ]:
        assert k in text
        text = text.replace(k, v)
    open(cfg_path, "w").write(text)

    data_root = str(root / "configs" / "data")
    Tw = np.eye(4, dtype=np.float32)
    Tw[:3, 3] = [0.4, -0.3, 0.1]
    synthetic.generate_scan(
        data_root, "gold_std", num_frames=3, seed=0, cloud_points_per_m2=800
    )
    synthetic.generate_scan(
        data_root, "maintenance", num_frames=3, seed=1,
        world_transform=Tw, drop_sign_indices=(2,), cloud_points_per_m2=800,
    )
    return str(root), cfg_path


class TestConfig:
    def test_loader_types_and_expansion(self, env):
        root, cfg_path = env
        cfg = ConfigLoader(cfg_path, "gold_std")
        assert cfg.img_size == 128
        assert isinstance(cfg.conf_thresh, float)
        assert cfg.visualise is False
        assert cfg.db_path.endswith("data/gold_std/data.db")
        assert os.path.isabs(cfg.db_path)

    def test_per_folder_expansion(self, env):
        root, cfg_path = env
        cfg = ConfigLoader(cfg_path, "maintenance")
        assert "maintenance" in cfg.pickle_path
        assert "gold_std" not in cfg.pickle_path

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            ConfigLoader("/nonexistent/x.cfg", "gold_std")


class TestEndToEnd:
    def test_gold_then_maintenance(self, env):
        root, cfg_path = env
        from tpu3dlm.pipeline.task import load_gold_std, setup_pipeline

        cfg_gold = ConfigLoader(cfg_path, "gold_std")
        cfg_maint = ConfigLoader(cfg_path, "maintenance")

        # gold-standard run
        p1 = setup_pipeline("gold_std", cfg_gold, None)
        assert os.path.exists(cfg_gold.pickle_path)
        with open(cfg_gold.pickle_path, "rb") as f:
            saved = pickle.load(f)
        for key in ("predictions", "global_bboxes_data", "optimised_bboxes", "pose_df"):
            assert key in saved
        # record shapes: [x1,y1,x2,y2,dmg,conf,label] 2D, 4 corners + 3 in 3D
        some_frame = next(iter(saved["predictions"].values()))
        if some_frame:
            assert len(some_frame[0]) == 7
        some3d = next(iter(saved["global_bboxes_data"].values()))
        if some3d:
            assert len(some3d[0]) == 7
            assert np.shape(some3d[0][0]) == (3,)

        # maintenance run with gold-std comparison
        goldstd_var = load_gold_std(cfg_gold.pickle_path)
        assert goldstd_var is not None
        p2 = setup_pipeline("maintenance", cfg_maint, cfg_gold, goldstd_var)
        assert os.path.exists(cfg_maint.csv_output)
        rows = p2.data_to_save.get("comparison_rows", [])
        assert isinstance(rows, list)
        assert "transformations" in p2.data_to_save

    def test_animation_gets_raw_comparison_cloud(self, env, monkeypatch):
        """The alignment animation REPLAYS the recorded transforms, so the
        pipeline must hand VisualiseAlignment the raw (unaligned)
        comparison cloud — feeding it compare()'s aligned return value
        applied the whole chain twice and the video ended misaligned."""
        import tpu3dlm.alignment.visualise as vis_mod
        from tpu3dlm.data.ply import load_ply
        from tpu3dlm.pipeline.task import load_gold_std, setup_pipeline

        root, cfg_path = env
        cfg_gold = ConfigLoader(cfg_path, "gold_std")
        cfg_maint = ConfigLoader(cfg_path, "maintenance")
        if not os.path.exists(cfg_gold.pickle_path):
            setup_pipeline("gold_std", cfg_gold, None)
        goldstd_var = load_gold_std(cfg_gold.pickle_path)

        captured = {}

        class _FakeVis:
            def __init__(self, base, comparison, **kw):
                captured["comparison"] = np.asarray(comparison)

            def create_video(self, transformations, output_video=None, **kw):
                captured["n_transforms"] = len(transformations)
                return 0

        monkeypatch.setattr(vis_mod, "VisualiseAlignment", _FakeVis)
        cfg_maint.alignment_vis = True
        setup_pipeline("maintenance", cfg_maint, cfg_gold, goldstd_var)

        # the visualiser received the capture's own cloud, untransformed
        raw_cloud, _ = load_ply(cfg_maint.ply_path)
        np.testing.assert_array_equal(
            captured["comparison"], np.asarray(raw_cloud, np.float32)
        )
        assert captured["n_transforms"] >= 1

    def test_load_gold_std_missing(self):
        from tpu3dlm.pipeline.task import load_gold_std

        assert load_gold_std("/nonexistent/file.pkl") is None

    def test_stage_times_recorded(self, env):
        root, cfg_path = env
        cfg_gold = ConfigLoader(cfg_path, "gold_std")
        with open(cfg_gold.pickle_path, "rb") as f:
            saved = pickle.load(f)
        assert {"extract", "detect", "map"} <= set(saved["stage_times"])


class TestStreamingPipeline:
    def test_streaming_matches_whole_scan(self, env):
        """streaming_chunk > 0 + fused_inference streams the capture in
        fixed-shape chunks with bounded memory, producing the same record
        structure and detections as whole-scan ingestion (VERDICT round-1
        item 3)."""
        root, cfg_path = env
        from tpu3dlm.pipeline.task import Pipeline

        class _Cfg:
            pass

        def clone(cfg, **over):
            c = _Cfg()
            for k, v in vars(cfg).items():
                setattr(c, k, v)
            for k, v in over.items():
                setattr(c, k, v)
            return c

        cfg = ConfigLoader(cfg_path, "gold_std")
        pkl_s = os.path.join(root, "stream.pkl")
        pkl_w = os.path.join(root, "whole.pkl")
        p_s = Pipeline(
            "gold_std",
            clone(cfg, fused_inference=True, streaming_chunk=2,
                  infer_dtype="f32", pickle_path=pkl_s),
        )
        out_s = p_s.run()
        p_w = Pipeline(
            "gold_std",
            clone(cfg, fused_inference=True, streaming_chunk=0,
                  infer_dtype="f32", pickle_path=pkl_w),
        )
        out_w = p_w.run()

        assert out_s["predictions"].keys() == out_w["predictions"].keys()
        for f in out_w["predictions"]:
            rows_s = out_s["predictions"][f]
            rows_w = out_w["predictions"][f]
            assert len(rows_s) == len(rows_w)
            for rs, rw in zip(rows_s, rows_w):
                np.testing.assert_allclose(
                    np.asarray(rs[:4], np.float32),
                    np.asarray(rw[:4], np.float32), atol=1e-4,
                )
        assert out_s["optimised_bboxes"].keys() == out_w["optimised_bboxes"].keys()


class TestResume:
    def test_resume_skips_detect(self, env):
        root, cfg_path = env
        from tpu3dlm.pipeline.task import Pipeline

        cfg_gold = ConfigLoader(cfg_path, "gold_std")
        assert os.path.exists(cfg_gold.pickle_path)  # written by earlier test
        p = Pipeline("gold_std", cfg_gold)
        p.run(resume=True)
        assert "detect" not in p.stage_times  # reused checkpointed detections
        assert "map" in p.stage_times

    def test_resume_under_streaming_reruns_detect(self, env):
        """Resume must be IGNORED in streaming mode: the placeholder scan
        (no frames in memory) cannot re-project checkpointed detections,
        so detect re-runs instead of silently producing garbage boxes."""
        root, cfg_path = env
        from tpu3dlm.pipeline.task import Pipeline

        class _Cfg:
            pass

        cfg = ConfigLoader(cfg_path, "gold_std")
        c = _Cfg()
        for k, v in vars(cfg).items():
            setattr(c, k, v)
        c.fused_inference = True
        c.streaming_chunk = 2
        c.infer_dtype = "f32"
        c.pickle_path = os.path.join(root, "stream_resume.pkl")

        out1 = Pipeline("gold_std", c).run()
        p = Pipeline("gold_std", c)
        out2 = p.run(resume=True)
        assert "detect" in p.stage_times  # resume ignored, detect re-ran
        assert out2["predictions"].keys() == out1["predictions"].keys()
        n_boxes = sum(len(v) for v in out2["optimised_bboxes"].values())
        assert n_boxes == sum(len(v) for v in out1["optimised_bboxes"].values())

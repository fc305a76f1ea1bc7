"""Detector + classifier stage tests over the synthetic scan (random weights:
we assert contract shapes/semantics, not accuracy)."""

import os

import numpy as np
import pytest

from tpu3dlm.data import synthetic
from tpu3dlm.data.dataset import load_scan
from tpu3dlm.pipeline.classifier import DamageDetector
from tpu3dlm.pipeline.detector import ObjectDetector


@pytest.fixture(scope="module")
def scan(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scans"))
    synthetic.generate_scan(root, "gold_std", num_frames=3)
    base = os.path.join(root, "gold_std", "rtabmap_extract")
    return load_scan(
        image_dir=os.path.join(base, "data_rgb"),
        depth_image_dir=os.path.join(base, "data_depth"),
        calibration_dir=os.path.join(base, "calibration"),
        pose_path=os.path.join(root, "gold_std", "poses.txt"),
        img_size=128,
    )


class TestObjectDetector:
    def test_detect_contract(self, scan):
        det = ObjectDetector(
            conf_thresh=0.0, img_size=128, batch_size=2, max_det=16, nc=3
        )
        out = det(scan)
        F = scan.num_frames
        assert out.boxes.shape == (F, 16, 4)
        assert out.conf.shape == (F, 16)
        assert out.mask.dtype == bool
        # boxes are in ORIGINAL pixels (480x640)
        assert out.boxes[..., 2].max() <= 480 * 1.5
        # damage unset before classification
        assert (out.damage == -1).all()

    def test_conf_threshold_masks(self, scan):
        det = ObjectDetector(conf_thresh=1.1, img_size=128, batch_size=4, max_det=8, nc=3)
        out = det(scan)
        assert not out.mask.any()

    def test_batch_padding_consistent(self, scan):
        """Detections must not depend on the batch chunking."""
        d1 = ObjectDetector(conf_thresh=0.0, img_size=128, batch_size=2, max_det=8, nc=3)
        d2 = ObjectDetector(
            conf_thresh=0.0, img_size=128, batch_size=7, max_det=8, nc=3,
            variables=d1.variables,
        )
        o1, o2 = d1(scan), d2(scan)
        np.testing.assert_allclose(o1.boxes, o2.boxes, atol=1e-4)
        np.testing.assert_allclose(o1.conf, o2.conf, atol=1e-5)


class TestDamageDetector:
    def test_rejects_bad_model_type(self):
        with pytest.raises(ValueError):
            DamageDetector(model_type="bogus")

    def test_classify_detections_fills_damage(self, scan):
        from tpu3dlm.models.beit import BeitConfig

        det = ObjectDetector(conf_thresh=0.0, img_size=128, batch_size=4, max_det=4, nc=3)
        dets = det(scan)
        clf = DamageDetector(
            config=BeitConfig(
                image_size=32, hidden_size=32, num_layers=1, num_heads=2,
                intermediate_size=64, num_labels=2,
            ),
            batch_size=8,
            id2label={0: "Undamaged", 1: "Damaged"},
        )
        out = clf.classify_detections(scan, dets)
        m = np.asarray(out.damage)
        assert m.shape == dets.conf.shape
        assert set(np.unique(m[np.asarray(dets.mask)])) <= {0, 1}
        assert (m[~np.asarray(dets.mask)] == -1).all()

    def test_get_class_label(self):
        from tpu3dlm.models.beit import BeitConfig

        clf = DamageDetector(
            config=BeitConfig(
                image_size=32, hidden_size=32, num_layers=1, num_heads=2,
                intermediate_size=64, num_labels=2,
            ),
            id2label={0: "Undamaged", 1: "Damaged"},
        )
        assert clf.get_class_label(1) == "damaged"
        assert clf.get_class_label([0, 1]) == ["undamaged", "damaged"]


class TestJitCache:
    @pytest.mark.slow  # traces several full stages
    def test_equivalent_stages_share_traced_programs(self):
        """Two stages with identical static config must reuse one traced
        program (utils/jitcache.py) — re-tracing costs seconds per pipeline
        instance; params are call args so sharing is safe."""
        import jax.numpy as jnp

        d1 = ObjectDetector(img_size=64, nc=3, max_det=4, batch_size=2)
        d2 = ObjectDetector(img_size=64, nc=3, max_det=4, batch_size=2, rng_seed=7)
        assert d1._detect_batch is d2._detect_batch

        d3 = ObjectDetector(img_size=96, nc=3, max_det=4, batch_size=2)
        assert d3._detect_batch is not d1._detect_batch

        from tpu3dlm.models.beit import BeitConfig

        kw = dict(image_size=32, hidden_size=32, num_layers=1, num_heads=2,
                  intermediate_size=64, num_labels=2)
        c1 = DamageDetector(config=BeitConfig(**kw))
        c2 = DamageDetector(config=BeitConfig(**kw), rng_seed=5)
        assert c1._classify_batch is c2._classify_batch
        assert c1._rectify_classify_batch is c2._rectify_classify_batch
        c3 = DamageDetector(config=BeitConfig(**{**kw, "num_layers": 2}))
        assert c3._classify_batch is not c1._classify_batch

        # different dtype → different program
        c4 = DamageDetector(config=BeitConfig(**kw), dtype=jnp.bfloat16)
        assert c4._classify_batch is not c1._classify_batch

        # and the shared program still computes with EACH instance's params
        rng = np.random.default_rng(0)
        crops = rng.integers(0, 255, size=(3, 32, 32, 3)).astype(np.uint8)
        out1 = np.asarray(c1._classify_batch(c1.variables, crops))
        out2 = np.asarray(c2._classify_batch(c2.variables, crops))
        assert out1.shape == out2.shape == (3,)


class TestWeightCache:
    def test_weights_shared_across_pipelines_until_file_changes(self, tmp_path):
        """Two Pipeline instances pointing at the same checkpoint must get
        the IDENTICAL device-resident weight tree (task._cached_device_weights
        — re-reading + re-uploading ~11 MB per scan was ~70% of the two-scan
        e2e wall-clock), and touching the file (new mtime) must rebuild."""
        import os
        import time as _time

        import jax.numpy as jnp
        from flax import serialization

        from tpu3dlm.models import weights as W
        from tpu3dlm.models.yolov10 import YOLOv10
        from tpu3dlm.pipeline import task

        model = YOLOv10(nc=3, variant="n")
        tmpl = W.init_template(model, jnp.zeros((1, 64, 64, 3), jnp.float32))
        ckpt = str(tmp_path / "yolo.msgpack")
        with open(ckpt, "wb") as f:
            f.write(serialization.to_bytes(tmpl))

        class _Cfg:
            yolo_weights = ckpt
            img_size = 64
            num_classes = 3

        p1 = task.Pipeline.__new__(task.Pipeline)
        p1.cfg = _Cfg()
        p1.logger = task.logging.getLogger("t")
        p2 = task.Pipeline.__new__(task.Pipeline)
        p2.cfg = _Cfg()
        p2.logger = p1.logger

        w1 = p1._load_yolo_weights()
        w2 = p2._load_yolo_weights()
        assert w1 is w2  # same cache entry, no reload/re-upload

        # mtime bump → cache miss → fresh tree
        _time.sleep(0.01)
        os.utime(ckpt)
        w3 = p1._load_yolo_weights()
        assert w3 is not w1


class TestAnnotatedExport:
    def test_save_img_writes_frames(self, scan, tmp_path):
        out = str(tmp_path / "annotated")
        det = ObjectDetector(
            conf_thresh=0.0, img_size=128, batch_size=4, max_det=4, nc=3,
            save_img=out, names={0: "sign_a", 1: "sign_b", 2: "sign_c"},
        )
        det(scan)
        import os

        files = sorted(os.listdir(out))
        assert len(files) == scan.num_frames
        import cv2

        img = cv2.imread(os.path.join(out, files[0]))
        assert img is not None and img.shape == (128, 128, 3)

"""Fused-path tests: one-jit scan inference vs the staged pipeline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dlm.data import synthetic
from tpu3dlm.data.dataset import load_scan
from tpu3dlm.mapper import project_detections
from tpu3dlm.models.beit import BeitConfig
from tpu3dlm.pipeline.classifier import DamageDetector
from tpu3dlm.pipeline.detector import ObjectDetector
from tpu3dlm.pipeline.fused import FusedScanRunner


@pytest.fixture(scope="module")
def scan_dirs(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scans"))
    synthetic.generate_scan(root, "gold_std", num_frames=3)
    base = os.path.join(root, "gold_std", "rtabmap_extract")
    return dict(
        image_dir=os.path.join(base, "data_rgb"),
        depth_image_dir=os.path.join(base, "data_depth"),
        calibration_dir=os.path.join(base, "calibration"),
        pose_path=os.path.join(root, "gold_std", "poses.txt"),
    )


@pytest.fixture(scope="module")
def scan(scan_dirs):
    return load_scan(img_size=128, **scan_dirs)


SMALL_BEIT = BeitConfig(
    image_size=32, hidden_size=32, num_layers=1, num_heads=2,
    intermediate_size=64, num_labels=2,
)


class TestFusedRunner:
    @pytest.mark.slow  # full staged + fused pipelines
    def test_matches_staged_pipeline(self, scan):
        """Fused single-jit path must agree with the staged path (same
        weights, f32 both)."""
        staged_det = ObjectDetector(
            conf_thresh=0.3, img_size=128, batch_size=4, max_det=8, nc=3,
        )
        staged_clf = DamageDetector(config=SMALL_BEIT, batch_size=32)

        fused = FusedScanRunner(
            img_size=128, conf_thresh=0.3, max_det=8, nc=3,
            beit_config=SMALL_BEIT,
            yolo_variables=staged_det.variables,
            beit_variables=staged_clf.variables,
            dtype=jnp.float32,
        )

        d1 = staged_clf.classify_detections(scan, staged_det(scan))
        g1 = project_detections(scan, d1)
        d2, g2 = fused(scan)

        np.testing.assert_array_equal(np.asarray(d1.mask), np.asarray(d2.mask))
        np.testing.assert_allclose(
            np.asarray(d1.boxes), np.asarray(d2.boxes), atol=0.5
        )
        m = np.asarray(d1.mask)
        np.testing.assert_allclose(
            np.asarray(g1.corners)[m], np.asarray(g2.corners)[m], atol=0.02
        )
        np.testing.assert_array_equal(
            np.asarray(d1.damage)[m], np.asarray(d2.damage)[m]
        )

    def test_frame_bucket_padding_exact(self, scan):
        """Whole-scan __call__ pads F to a bucket (3 → 4 here); the result
        must be IDENTICAL to running the step at the exact frame count —
        inert zero frames cannot perturb detections, crop selection, or
        projection."""
        fused = FusedScanRunner(
            img_size=128, conf_thresh=0.3, max_det=8, nc=3,
            beit_config=SMALL_BEIT, dtype=jnp.float32,
        )
        d_pad, g_pad = fused(scan)  # bucket-padded path
        d_exact, g_exact = fused._finalize(
            fused._dispatch(scan), scan.num_frames  # exact-shape program
        )
        for a, b in [
            (d_pad.mask, d_exact.mask),
            (d_pad.boxes, d_exact.boxes),
            (d_pad.damage, d_exact.damage),
            (g_pad.corners, g_exact.corners),
        ]:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sharded_fused_runs(self, scan):
        assert jax.device_count() >= 8
        fused = FusedScanRunner(
            img_size=128, conf_thresh=0.3, max_det=4, nc=3,
            beit_config=SMALL_BEIT, mesh_devices=8, dtype=jnp.float32,
        )
        det, gboxes = fused(scan)
        assert det.boxes.shape == (3, 4, 4)
        assert gboxes.corners.shape == (3, 4, 4, 3)

    def test_stream_matches_whole_scan(self, scan_dirs, scan):
        """Chunked streaming (incl. a zero-padded last chunk) must produce
        exactly the whole-scan fused result, with bounded in-flight depth
        and lazy chunk decode (VERDICT round-1 item 3)."""
        from tpu3dlm.data.dataset import iter_scan_chunks

        fused = FusedScanRunner(
            img_size=128, conf_thresh=0.3, max_det=8, nc=3,
            beit_config=SMALL_BEIT, dtype=jnp.float32,
        )
        d_whole, g_whole = fused(scan)

        events = []

        def tracked_chunks():
            # 3 frames in chunks of 2 → second chunk exercises padding
            for i, item in enumerate(
                iter_scan_chunks(chunk_frames=2, img_size=128, **scan_dirs)
            ):
                events.append(("produce", i))
                yield item

        orig_finalize = fused._finalize

        def finalize(out, n):
            events.append(("drain", n))
            return orig_finalize(out, n)

        fused._finalize = finalize
        d_s, g_s = fused.run_stream(tracked_chunks(), max_inflight=1)
        fused._finalize = orig_finalize

        assert d_s.boxes.shape[0] == scan.num_frames
        np.testing.assert_array_equal(d_s.mask, np.asarray(d_whole.mask))
        np.testing.assert_allclose(
            d_s.boxes, np.asarray(d_whole.boxes), atol=1e-5
        )
        m = d_s.mask
        np.testing.assert_allclose(
            np.asarray(g_s.corners)[m], np.asarray(g_whole.corners)[m], atol=1e-5
        )
        np.testing.assert_array_equal(d_s.damage, np.asarray(d_whole.damage))

        # memory bound: never more than max_inflight chunks pending (the
        # documented O(chunk_frames · max_inflight) bound), and draining
        # interleaves with production (not all-produce-then-drain)
        assert fused.stream_peak_inflight <= 1
        first_drain = events.index(("drain", 2))
        assert ("produce", 1) in events[:first_drain + 1] or events[
            first_drain + 1
        ] == ("produce", 1)

    def test_concurrent_streams_match_serial(self, scan_dirs, scan):
        """Two captures streaming CONCURRENTLY (ScanWatcher concurrency>1:
        each Pipeline owns a runner, the runners share the cached step
        program through utils/jitcache) must both reproduce the serial
        whole-scan result exactly — the decode worker threads, in-flight
        queues, and device dispatch must not cross-talk."""
        from concurrent.futures import ThreadPoolExecutor

        from tpu3dlm.data.dataset import iter_scan_chunks

        ref = FusedScanRunner(
            img_size=128, conf_thresh=0.3, max_det=8, nc=3,
            beit_config=SMALL_BEIT, dtype=jnp.float32,
        )
        d_ref, g_ref = ref(scan)

        def one_stream(_):
            runner = FusedScanRunner(
                img_size=128, conf_thresh=0.3, max_det=8, nc=3,
                beit_config=SMALL_BEIT, dtype=jnp.float32,
                yolo_variables=ref.yolo_variables,
                beit_variables=ref.beit_variables,
            )
            return runner.run_stream(
                iter_scan_chunks(chunk_frames=2, img_size=128, **scan_dirs),
                max_inflight=1,
            )

        with ThreadPoolExecutor(2) as pool:
            results = list(pool.map(one_stream, range(2)))
        for d_s, g_s in results:
            np.testing.assert_array_equal(d_s.mask, np.asarray(d_ref.mask))
            np.testing.assert_allclose(
                d_s.boxes, np.asarray(d_ref.boxes), atol=1e-5
            )
            m = d_s.mask
            np.testing.assert_allclose(
                np.asarray(g_s.corners)[m], np.asarray(g_ref.corners)[m],
                atol=1e-5,
            )
            np.testing.assert_array_equal(
                d_s.damage, np.asarray(d_ref.damage)
            )

    def test_stream_sharded_matches_whole_scan(self, scan_dirs, scan):
        """Streaming chunks THROUGH the 8-device mesh path (each chunk
        sharded over the frame axis, incl. chunk + mesh padding together)
        must equal the unsharded whole-scan result."""
        from tpu3dlm.data.dataset import iter_scan_chunks

        assert jax.device_count() >= 8
        plain = FusedScanRunner(
            img_size=128, conf_thresh=0.3, max_det=4, nc=3,
            beit_config=SMALL_BEIT, dtype=jnp.float32,
        )
        sharded = FusedScanRunner(
            img_size=128, conf_thresh=0.3, max_det=4, nc=3,
            beit_config=SMALL_BEIT, mesh_devices=8, dtype=jnp.float32,
            yolo_variables=plain.yolo_variables,
            beit_variables=plain.beit_variables,
        )
        d_w, g_w = plain(scan)
        d_s, g_s = sharded.run_stream(
            iter_scan_chunks(chunk_frames=2, img_size=128, **scan_dirs)
        )
        assert d_s.boxes.shape[0] == scan.num_frames
        np.testing.assert_array_equal(d_s.mask, np.asarray(d_w.mask))
        np.testing.assert_allclose(d_s.boxes, np.asarray(d_w.boxes), atol=1e-5)
        m = d_s.mask
        np.testing.assert_allclose(
            np.asarray(g_s.corners)[m], np.asarray(g_w.corners)[m], atol=1e-4
        )

    def test_letterbox_matches_staged(self, scan_dirs):
        """The fused path must handle letterboxed scans (what converted
        finetuned checkpoints expect) and agree with the staged path —
        VERDICT r1 item 5: 'fast path' and 'real weights' must not be
        mutually exclusive."""
        lb_scan = load_scan(img_size=128, resize_mode="letterbox", **scan_dirs)
        assert lb_scan.letterbox is not None

        staged_det = ObjectDetector(
            conf_thresh=0.3, img_size=128, batch_size=4, max_det=8, nc=3,
        )
        staged_clf = DamageDetector(config=SMALL_BEIT, batch_size=32)
        fused = FusedScanRunner(
            img_size=128, conf_thresh=0.3, max_det=8, nc=3,
            beit_config=SMALL_BEIT,
            yolo_variables=staged_det.variables,
            beit_variables=staged_clf.variables,
            dtype=jnp.float32,
        )

        d1 = staged_clf.classify_detections(lb_scan, staged_det(lb_scan))
        g1 = project_detections(lb_scan, d1)
        d2, g2 = fused(lb_scan)

        np.testing.assert_array_equal(np.asarray(d1.mask), np.asarray(d2.mask))
        m = np.asarray(d1.mask)
        np.testing.assert_allclose(
            np.asarray(d1.boxes)[m], np.asarray(d2.boxes)[m], atol=0.5
        )
        np.testing.assert_allclose(
            np.asarray(g1.corners)[m], np.asarray(g2.corners)[m], atol=0.02
        )
        np.testing.assert_array_equal(
            np.asarray(d1.damage)[m], np.asarray(d2.damage)[m]
        )

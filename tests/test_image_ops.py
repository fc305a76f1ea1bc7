"""Image-op tests: bilinear sampling, homography solve/warp, crop rectification."""

import cv2
import jax.numpy as jnp
import numpy as np

from tpu3dlm.ops.image import (
    rectify_crops,
    resize_bilinear,
    solve_homography_4pt,
    warp_homography,
)


class TestHomography:
    def test_solve_matches_cv2(self, rng):
        src = rng.uniform(10, 100, size=(4, 2)).astype(np.float32)
        dst = rng.uniform(0, 200, size=(4, 2)).astype(np.float32)
        H_ours = np.asarray(solve_homography_4pt(jnp.array(src), jnp.array(dst)))
        H_cv, _ = cv2.findHomography(src, dst)
        np.testing.assert_allclose(H_ours, H_cv, rtol=1e-3, atol=1e-3)

    def test_identity(self):
        pts = jnp.array([[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]])
        H = np.asarray(solve_homography_4pt(pts, pts))
        np.testing.assert_allclose(H, np.eye(3), atol=1e-5)

    def test_warp_matches_cv2(self, rng):
        img = rng.uniform(0, 255, size=(40, 50, 3)).astype(np.float32)
        # box → full image rect (the reference's rectification case,
        # detector.py:202-213)
        x1, y1, x2, y2 = 5.0, 8.0, 30.0, 25.0
        src = np.array([[x1, y1], [x1, y2], [x2, y2], [x2, y1]], np.float32)
        h, w = 40, 50
        dst = np.array([[0, 0], [0, h - 1], [w - 1, h - 1], [w - 1, 0]], np.float32)
        H_cv, _ = cv2.findHomography(src, dst)
        want = cv2.warpPerspective(img, H_cv, (w, h))
        got = np.asarray(
            warp_homography(jnp.array(img), jnp.array(H_cv, dtype=jnp.float32), (h, w))
        )
        # interiors match (borders differ: cv2 uses constant border)
        np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], atol=1.0)


class TestRectify:
    def test_crop_of_constant_region(self):
        img = np.zeros((64, 64, 3), np.float32)
        img[10:20, 30:40] = 7.0
        crops = rectify_crops(
            jnp.array(img)[None], jnp.array([[[30.0, 10.0, 39.0, 19.0]]]), out_hw=(8, 8)
        )
        np.testing.assert_allclose(np.asarray(crops)[0, 0], 7.0, atol=1e-5)

    def test_matches_manual_linspace(self, rng):
        img = rng.uniform(0, 1, size=(32, 32, 1)).astype(np.float32)
        bbox = [4.0, 6.0, 20.0, 28.0]
        crops = np.asarray(
            rectify_crops(jnp.array(img)[None], jnp.array([[bbox]]), out_hw=(5, 5))
        )[0, 0]
        # corners sample exactly the bbox corners
        np.testing.assert_allclose(crops[0, 0, 0], img[6, 4, 0], rtol=1e-5)
        np.testing.assert_allclose(crops[4, 4, 0], img[28, 20, 0], rtol=1e-5)

    def test_batch_shapes(self, rng):
        imgs = jnp.array(rng.uniform(size=(3, 16, 16, 3)), jnp.float32)
        boxes = jnp.array(rng.uniform(2, 12, size=(3, 5, 4)), jnp.float32)
        crops = rectify_crops(imgs, boxes, out_hw=(7, 9))
        assert crops.shape == (3, 5, 7, 9, 3)


class TestResize:
    def test_downsample_constant(self):
        img = jnp.full((16, 16, 2), 3.5)
        out = np.asarray(resize_bilinear(img, (4, 4)))
        np.testing.assert_allclose(out, 3.5, atol=1e-6)

    def test_matches_cv2_roughly(self, rng):
        img = rng.uniform(0, 1, size=(32, 48, 3)).astype(np.float32)
        got = np.asarray(resize_bilinear(jnp.array(img), (16, 24)))
        want = cv2.resize(img, (24, 16), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(got, want, atol=0.05)


class TestLetterbox:
    def test_jax_letterbox_geometry(self):
        from tpu3dlm.ops.image import letterbox
        import jax.numpy as jnp

        img = jnp.full((100, 50, 3), 200.0)
        canvas, scale, (px, py) = letterbox(img, 100)
        assert canvas.shape == (100, 100, 3)
        assert scale == 1.0 and py == 0 and px == 25
        # pad fill on the sides, content in the middle
        assert float(canvas[50, 0, 0]) == 114.0
        assert float(canvas[50, 50, 0]) == 200.0

    def test_np_letterbox_matches(self):
        from tpu3dlm.data.dataset import _letterbox_np

        img = np.full((100, 50, 3), 200, np.uint8)
        canvas, scale, px, py = _letterbox_np(img, 100)
        assert canvas.shape == (100, 100, 3)
        assert scale == 1.0 and (px, py) == (25, 0)
        assert canvas[50, 0, 0] == 114 and canvas[50, 50, 0] == 200


class TestLetterboxScanRoundtrip:
    def test_boxes_map_back_to_original(self, tmp_path, rng):
        """GT box → letterboxed detector space → ObjectDetector back-map must
        recover the original pixels (the reference semantic: predictions in
        original image pixels, detector.py:148-155)."""
        from tpu3dlm.data import synthetic
        from tpu3dlm.data.dataset import load_scan, _letterbox_np
        import os

        root = str(tmp_path)
        scene = synthetic.generate_scan(root, "gold_std", num_frames=2)
        base = os.path.join(root, "gold_std", "rtabmap_extract")
        scan = load_scan(
            os.path.join(base, "data_rgb"), os.path.join(base, "data_depth"),
            os.path.join(base, "calibration"), os.path.join(root, "gold_std", "poses.txt"),
            img_size=128, resize_mode="letterbox",
        )
        assert scan.letterbox is not None and scan.letterbox.shape == (2, 3)
        s, px, py = scan.letterbox[0]
        # forward-map a GT box into detector space, then apply the detector's
        # inverse mapping formula
        gt = scene.gt_boxes_2d[0][0][:4]
        det_space = [gt[0] * s + px, gt[1] * s + py, gt[2] * s + px, gt[3] * s + py]
        back = [(det_space[0] - px) / s, (det_space[1] - py) / s,
                (det_space[2] - px) / s, (det_space[3] - py) / s]
        np.testing.assert_allclose(back, gt, rtol=1e-5)


class TestRectifyMXU:
    def test_matches_gather_rectifier(self, rng):
        from tpu3dlm.ops.image import rectify_crops, rectify_crops_mxu

        imgs = jnp.array(rng.uniform(0, 255, size=(2, 40, 50, 3)), jnp.float32)
        boxes = jnp.array(
            [[[5.0, 8.0, 30.0, 25.0], [0.0, 0.0, 49.0, 39.0]],
             [[10.0, 10.0, 12.0, 12.0], [20.0, 5.0, 45.0, 35.0]]]
        )
        a = np.asarray(rectify_crops(imgs, boxes, out_hw=(16, 16)))
        b = np.asarray(rectify_crops_mxu(imgs, boxes, out_hw=(16, 16)))
        np.testing.assert_allclose(a, b, atol=1e-2)

"""Hard-eval corpus generator invariants (pipeline/hardeval.py +
data/synthetic.py hard-mode axes): each stress axis must do exactly what
its ground-truth contract says, because a mis-specified axis silently
turns the below-ceiling gate into noise."""

from __future__ import annotations

import os

import numpy as np
import pytest

from tpu3dlm.data import synthetic
from tpu3dlm.pipeline import hardeval


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path)


def _load_depth(root, folder, idx=1):
    import cv2

    from tpu3dlm.data.rtabmap_db import reinterpret_depth

    p = os.path.join(root, folder, "rtabmap_extract", "data_depth", f"{idx}.png")
    return reinterpret_depth(cv2.imread(p, cv2.IMREAD_UNCHANGED))


class TestHardAxes:
    def test_distractors_rendered_but_never_gt(self, root):
        scene = synthetic.generate_scan(
            root, "d", num_frames=2, cloud_points_per_m2=200,
            distractors=hardeval.distractor_set(),
        )
        # GT labels only ever come from the real signs
        labels = {int(r[5]) for rows in scene.gt_boxes_2d.values() for r in rows}
        assert labels <= {s.label for s in scene.signs}
        # the distractor color appears in the rendered RGB
        import cv2

        img = cv2.imread(
            os.path.join(root, "d", "rtabmap_extract", "data_rgb", "1.jpg")
        )[:, :, ::-1]
        d0 = hardeval.distractor_set()[0].color
        dist = np.abs(img.astype(int) - np.array(d0)[None, None]).sum(-1)
        assert (dist < 30).any(), "distractor not rendered"

    def test_occlusion_shrinks_or_hides_gt(self, root):
        plain = synthetic.generate_scan(
            root, "p", num_frames=3, cloud_points_per_m2=200,
        )
        occ = synthetic.generate_scan(
            root, "o", num_frames=3, cloud_points_per_m2=200,
            occluders=hardeval.occluder_set(),
        )

        def area(scene):
            tot = 0.0
            for rows in scene.gt_boxes_2d.values():
                for r in rows:
                    tot += (r[2] - r[0]) * (r[3] - r[1])
            return tot

        # occluders can only remove visible sign pixels (mask-based GT is
        # pixel-quantised, so allow a tiny tolerance)
        assert area(occ) < area(plain) * 1.001
        n_plain = sum(len(v) for v in plain.gt_boxes_2d.values())
        n_occ = sum(len(v) for v in occ.gt_boxes_2d.values())
        assert n_occ <= n_plain

    def test_mask_gt_matches_projection_when_unoccluded(self, root):
        """With extras present but NOT overlapping any sign, the mask-based
        ground truth must agree with the corner-projection ground truth to
        pixel quantisation."""
        far_distractor = [synthetic.Sign(5.0, 5.0, 5.5, 5.5, 2.9, (10, 10, 10))]
        a = synthetic.generate_scan(
            root, "a", num_frames=2, cloud_points_per_m2=200,
        )
        b = synthetic.generate_scan(
            root, "b", num_frames=2, cloud_points_per_m2=200,
            distractors=far_distractor,
        )
        for f in a.gt_boxes_2d:
            ra, rb = a.gt_boxes_2d[f], b.gt_boxes_2d[f]
            assert len(ra) == len(rb)
            for box_a, box_b in zip(ra, rb):
                np.testing.assert_allclose(box_a[:4], box_b[:4], atol=1.5)
                assert box_a[5] == box_b[5]

    def test_depth_noise_and_dropout_applied(self, root):
        synthetic.generate_scan(root, "clean", num_frames=1, cloud_points_per_m2=200)
        synthetic.generate_scan(
            root, "noisy", num_frames=1, cloud_points_per_m2=200,
            depth_noise_m=0.03, depth_dropout=0.2,
        )
        clean = _load_depth(root, "clean")
        noisy = _load_depth(root, "noisy")
        frac_zero = float((noisy <= 0).mean())
        assert 0.1 < frac_zero < 0.35  # ~20% holes
        valid = (noisy > 0) & (clean > 0)
        diff = np.abs(noisy[valid] - clean[valid])
        assert 0.005 < float(diff.mean()) < 0.1  # metres-scale noise present

    def test_oblique_changes_trajectory(self, root):
        a = synthetic.generate_scan(root, "s", num_frames=3, cloud_points_per_m2=200)
        b = synthetic.generate_scan(
            root, "w", num_frames=3, cloud_points_per_m2=200,
            yaw_amplitude=0.4, x_span=(-1.2, 2.4),
        )
        assert not np.allclose(a.poses, b.poses)

    def test_confusable_strength_monotone(self):
        base = synthetic.default_signs()
        mild = hardeval.confusable_signs(0.2)
        hard = hardeval.confusable_signs(0.6)

        def dist_to_grey(signs):
            return sum(
                sum(abs(v - 180) for v in s.color) for s in signs
            )

        assert dist_to_grey(hard) < dist_to_grey(mild) < dist_to_grey(base)
        # geometry and labels untouched
        for s0, s1 in zip(base, hard):
            assert (s0.x0, s0.y0, s0.x1, s0.y1, s0.label) == (
                s1.x0, s1.y0, s1.x1, s1.y1, s1.label
            )

    def test_default_corpus_unchanged(self, root):
        """The hard-mode kwargs must not perturb the default generator
        output (every existing fixture/golden test depends on it)."""
        a = synthetic.generate_scan(root, "x", num_frames=2, cloud_points_per_m2=200)
        b = synthetic.generate_scan(
            root, "y", num_frames=2, cloud_points_per_m2=200,
            distractors=[], occluders=[], depth_noise_m=0.0, depth_dropout=0.0,
        )
        assert a.gt_boxes_2d == b.gt_boxes_2d
        np.testing.assert_array_equal(a.poses, b.poses)
        da, db = _load_depth(root, "x"), _load_depth(root, "y")
        np.testing.assert_array_equal(da, db)


class TestSeededCorpus:
    """Round-5 multi-seed corpus invariants (hardeval.axis_kwargs)."""

    def test_axis_kwargs_deterministic_per_seed(self):
        a = hardeval.axis_kwargs("combined", 11)
        b = hardeval.axis_kwargs("combined", 11)
        assert str(a) == str(b)

    def test_axis_kwargs_vary_across_seeds(self):
        a = hardeval.axis_kwargs("base", 11)
        b = hardeval.axis_kwargs("base", 23)
        assert str(a["signs"]) != str(b["signs"])
        assert a["yaw_phase"] != b["yaw_phase"]

    def test_occluders_still_cross_signs(self):
        """The bounded jitter must preserve the structural invariant the
        occlusion axis depends on: each panel's x-range stays inside the
        x-range of the sign it was placed to occlude."""
        for seed in hardeval.EVAL_SEEDS:
            kw = hardeval.axis_kwargs("occlusion", seed)
            signs, occ = kw["signs"], kw["occluders"]
            for o, s in zip(occ, (signs[0], signs[2])):
                assert o.x0 < s.x1 and o.x1 > s.x0, (seed, o, s)

    def test_generated_scan_deterministic(self, root):
        a = hardeval.generate_axis_scan(root, "base", num_frames=2, seed=11)
        b = hardeval.generate_axis_scan(
            root + "/again", "base", num_frames=2, seed=11
        )
        assert a.gt_boxes_2d == b.gt_boxes_2d
        np.testing.assert_array_equal(a.poses, b.poses)
        pa = os.path.join(root, "base_s11", "rtabmap_extract", "data_rgb", "1.jpg")
        pb = os.path.join(root, "again", "base_s11", "rtabmap_extract",
                          "data_rgb", "1.jpg")
        assert open(pa, "rb").read() == open(pb, "rb").read()

    def test_gt_volume_meets_power_floor(self, root):
        """5 seeds x 14 frames must pool >= 150 GT boxes on the gated axes
        (spot-checked on the two that lose boxes: occlusion, combined)."""
        for axis in ("occlusion", "combined"):
            tot = sum(
                sum(len(v) for v in hardeval.generate_axis_scan(
                    root, axis, num_frames=14, seed=s
                ).gt_boxes_2d.values())
                for s in hardeval.EVAL_SEEDS
            )
            assert tot >= 150, (axis, tot)


class TestDamagePerturbations:
    def test_blur_and_exposure_change_pixels_not_shape(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
        for axis in ("blur", "exposure"):
            out = hardeval._perturb_scan_rgb(rgb, axis, np.random.default_rng(1))
            assert out.shape == rgb.shape and out.dtype == np.uint8
            assert not np.array_equal(out, rgb)

    def test_crop_occlusion_paints_inside_boxes(self):
        class _Scan:
            letterbox = None
            rgb_size = np.array([[64.0, 64.0], [64.0, 64.0]])
            rgb = np.zeros((2, 64, 64, 3), np.uint8)

        rgb = np.full((2, 64, 64, 3), 200, np.uint8)
        gt = {0: [[8.0, 8.0, 40.0, 40.0, 0.9, 0]], 1: []}
        out = hardeval._perturb_scan_rgb(
            rgb, "crop_occlusion", np.random.default_rng(2),
            gt_boxes_px=gt, scan=_Scan(),
        )
        changed = np.nonzero((out[0] != 200).any(-1))
        assert changed[0].size > 0
        assert changed[0].min() >= 7 and changed[0].max() <= 41
        assert changed[1].min() >= 7 and changed[1].max() <= 41
        np.testing.assert_array_equal(out[1], rgb[1])  # no gt, untouched

    def test_box_jitter_bounded_and_masked(self):
        rng = np.random.default_rng(3)
        boxes = np.tile(np.array([10.0, 10.0, 30.0, 30.0], np.float32),
                        (2, 4, 1))
        mask = np.zeros((2, 4), bool)
        mask[0, :2] = True
        out = hardeval._jitter_boxes(boxes, mask, rng, frac=0.1)
        moved = np.abs(out - boxes)
        assert moved[mask].max() <= 2.0 + 1e-5  # 10% of the 20-px size
        np.testing.assert_array_equal(out[~mask], boxes[~mask])
        assert (moved[mask] > 0).any()


class TestVariantPlumbing:
    """--variant (PERF.md deployment point C): the eval stack must build
    the detector at the requested YOLOv10 width, or an s/m checkpoint
    would silently fail to load (template mismatch) — or worse, an
    n-template would load garbage into a wider artifact's numbers."""

    def test_load_detector_round_trips_s_variant(self, tmp_path):
        import jax.numpy as jnp

        from tpu3dlm.models import weights as W
        from tpu3dlm.models.yolov10 import YOLOv10

        model = YOLOv10(nc=2, variant="s")
        template = W.init_template(
            model, jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        path = str(tmp_path / "yolo_s.msgpack")
        W.save_flax_checkpoint(path, template)

        det = hardeval._load_detector(path, 64, 2, 0.3, variant="s")
        assert det.model.variant == "s"
        # the n-width template must NOT accept the s checkpoint
        with pytest.raises(Exception):
            hardeval._load_detector(path, 64, 2, 0.3, variant="n")

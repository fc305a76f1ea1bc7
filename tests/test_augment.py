"""In-jit detection augmentation (ops/augment.py) and the extended native
training options (augment / EMA / cosine schedule / val hook) in
pipeline/selftrain.finetune_yolo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dlm.ops.augment import _crop_zoom, augment_detection_batch

# whole-file slow tier: finetune/augment steps compile whole train programs (pyproject markers)
pytestmark = pytest.mark.slow

S = 64


def _batch(n=3, b=2, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.uniform(size=(n, S, S, 3)), jnp.float32)
    boxes = jnp.asarray(
        np.stack(
            [np.array([[10, 12, 30, 34], [40, 8, 58, 26]], np.float32)] * n
        )
    )
    mask = jnp.ones((n, b), bool)
    return imgs, boxes, mask


class TestAugmentBatch:
    def test_shapes_and_determinism(self):
        imgs, boxes, mask = _batch()
        key = jax.random.PRNGKey(7)
        a1 = augment_detection_batch(key, imgs, boxes, mask)
        a2 = augment_detection_batch(key, imgs, boxes, mask)
        for x, y in zip(a1, a2):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert a1[0].shape == imgs.shape
        assert a1[1].shape == boxes.shape
        assert a1[2].shape == mask.shape
        b1 = augment_detection_batch(jax.random.PRNGKey(8), imgs, boxes, mask)
        assert not np.allclose(np.asarray(a1[0]), np.asarray(b1[0]))

    def test_all_off_is_identity(self):
        imgs, boxes, mask = _batch()
        out = augment_detection_batch(
            jax.random.PRNGKey(0), imgs, boxes, mask,
            hflip_p=0.0, brightness=0.0, contrast=0.0, zoom_p=0.0,
        )
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(imgs), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(boxes))
        np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(mask))

    def test_forced_hflip_mirrors_image_and_boxes(self):
        imgs, boxes, mask = _batch()
        out = augment_detection_batch(
            jax.random.PRNGKey(0), imgs, boxes, mask,
            hflip_p=1.0, brightness=0.0, contrast=0.0, zoom_p=0.0,
        )
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(imgs)[:, :, ::-1, :], atol=1e-6
        )
        want_x1 = (S - 1.0) - np.asarray(boxes)[..., 2]
        want_x2 = (S - 1.0) - np.asarray(boxes)[..., 0]
        np.testing.assert_allclose(np.asarray(out[1])[..., 0], want_x1, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[1])[..., 2], want_x2, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out[1])[..., [1, 3]], np.asarray(boxes)[..., [1, 3]],
            atol=1e-5,
        )

    def test_identity_zoom_is_exact(self):
        # zoom_min = 1 → window is the full inclusive-corner span → the
        # interpolation matrices are exact one-hot rows (identity resample)
        imgs, boxes, mask = _batch()
        out = augment_detection_batch(
            jax.random.PRNGKey(3), imgs, boxes, mask,
            hflip_p=0.0, brightness=0.0, contrast=0.0,
            zoom_p=1.0, zoom_min=1.0,
        )
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(imgs), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(boxes), atol=1e-3)
        assert np.asarray(out[2]).all()

    def test_boxes_stay_in_frame(self):
        imgs, boxes, mask = _batch(n=8)
        out = augment_detection_batch(
            jax.random.PRNGKey(11), imgs, boxes, mask,
            hflip_p=0.5, zoom_p=1.0, zoom_min=0.5,
        )
        bb = np.asarray(out[1])
        assert bb.min() >= -1e-3 and bb.max() <= (S - 1.0) + 1e-3

    def test_jit_and_grad_safe(self):
        imgs, boxes, mask = _batch()
        f = jax.jit(lambda k, i, b, m: augment_detection_batch(k, i, b, m)[0].sum())
        v = f(jax.random.PRNGKey(0), imgs, boxes, mask)
        assert np.isfinite(float(v))
        g = jax.grad(
            lambda i: augment_detection_batch(
                jax.random.PRNGKey(0), i, boxes, mask
            )[0].sum()
        )(imgs)
        assert np.isfinite(np.asarray(g)).all()


class TestCropZoom:
    def test_patch_stays_inside_mapped_box(self):
        """A bright patch centered in a gt box must still be covered by the
        transformed box whenever the box survives the crop."""
        img = jnp.zeros((S, S, 3), jnp.float32)
        img = img.at[28:33, 38:43, :].set(1.0)  # patch center ~(40, 30) xy
        boxes = jnp.asarray([[36.0, 26.0, 45.0, 35.0]])
        mask = jnp.ones((1,), bool)
        hits = 0
        for seed in range(12):
            out_img, out_boxes, out_mask = _crop_zoom(
                jax.random.PRNGKey(seed), img, boxes, mask, p=1.0, zoom_min=0.5
            )
            if not bool(out_mask[0]):
                continue
            hits += 1
            flat = np.asarray(out_img).sum(-1)
            py, px = np.unravel_index(np.argmax(flat), flat.shape)
            x1, y1, x2, y2 = np.asarray(out_boxes[0])
            assert x1 - 2 <= px <= x2 + 2 and y1 - 2 <= py <= y2 + 2, (
                seed, (px, py), (x1, y1, x2, y2))
        assert hits >= 6  # most draws keep a centered box visible

    def test_box_cropped_out_gets_masked(self):
        """A corner box must be masked for at least one strong-zoom draw."""
        img = jnp.zeros((S, S, 3), jnp.float32)
        boxes = jnp.asarray([[0.0, 0.0, 4.0, 4.0]])
        mask = jnp.ones((1,), bool)
        dropped = 0
        for seed in range(50):
            _, _, m = _crop_zoom(
                jax.random.PRNGKey(seed), img, boxes, mask, p=1.0, zoom_min=0.5
            )
            dropped += int(~np.asarray(m)[0])
        assert dropped > 0


class TestTrainingOptions:
    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(0)
        imgs = (rng.uniform(size=(2, S, S, 3)) * 255).astype(np.uint8)
        boxes = np.array(
            [[[10, 10, 30, 30], [0, 0, 0, 0]],
             [[20, 20, 50, 50], [0, 0, 0, 0]]], np.float32
        )
        labels = np.zeros((2, 2), np.int32)
        mask = np.array([[True, False], [True, False]])
        return imgs, boxes, labels, mask

    def test_finetune_with_all_options(self, data):
        from tpu3dlm.pipeline.selftrain import finetune_yolo

        imgs, boxes, labels, mask = data
        history = []
        variables = finetune_yolo(
            imgs, boxes, labels, mask, nc=2, img_size=S,
            steps=3, lr=1e-3, log_every=0,
            augment=True, ema_decay=0.9, schedule="cosine",
            val_every=2, val_history=history,
        )
        assert "params" in variables and "batch_stats" in variables
        leaves = jax.tree.leaves(variables)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # val at steps 0, 2 (final step also scores but 2 == steps-1)
        assert [h["step"] for h in history] == [0, 2]
        for h in history:
            assert 0.0 <= h["map50"] <= 1.0 and "map50_95" in h

    def test_ema_checkpoint_differs_from_raw(self, data):
        from tpu3dlm.pipeline.selftrain import finetune_yolo

        imgs, boxes, labels, mask = data
        kw = dict(nc=2, img_size=S, steps=2, lr=5e-3, log_every=0, seed=1)
        raw = finetune_yolo(imgs, boxes, labels, mask, **kw)
        ema = finetune_yolo(imgs, boxes, labels, mask, ema_decay=0.99, **kw)
        d_raw = jax.tree.leaves(raw["params"])
        d_ema = jax.tree.leaves(ema["params"])
        diffs = [float(np.abs(a - b).max()) for a, b in zip(d_raw, d_ema)]
        assert max(diffs) > 0  # EMA at decay .99 stays near init after 2 steps

    def test_augment_empty_dict_means_defaults(self, data, monkeypatch):
        """augment={} is documented as 'default augmentation kwargs'
        (make_yolo_train_step) — it must build the AUGMENTED (keyed) train
        step, not silently collapse to disabled via `augment or None`."""
        import tpu3dlm.pipeline.selftrain as st

        seen = {}
        from tpu3dlm.parallel import finetune as ft

        orig = ft.make_yolo_train_step

        def spy(yolo, tx, mesh, img_size, augment=None, sample_batch=None):
            seen["augment"] = augment
            return orig(yolo, tx, mesh, img_size, augment=augment,
                        sample_batch=sample_batch)

        monkeypatch.setattr(ft, "make_yolo_train_step", spy)
        imgs, boxes, labels, mask = data
        st.finetune_yolo(imgs, boxes, labels, mask, nc=2, img_size=S,
                         steps=1, log_every=0, augment={})
        assert seen["augment"] == {}  # not None

    def test_bad_schedule_rejected(self, data):
        from tpu3dlm.pipeline.selftrain import finetune_yolo

        imgs, boxes, labels, mask = data
        with pytest.raises(ValueError, match="schedule"):
            finetune_yolo(imgs, boxes, labels, mask, nc=2, img_size=S,
                          steps=1, schedule="linear")


class TestCropAugment:
    def test_shapes_dtype_and_determinism(self):
        import jax
        import numpy as np

        from tpu3dlm.ops.augment import augment_crop_batch

        rng = np.random.default_rng(0)
        crops = rng.integers(0, 255, (6, 32, 32, 3), np.uint8)
        k = jax.random.PRNGKey(3)
        a = np.asarray(augment_crop_batch(k, crops))
        b = np.asarray(augment_crop_batch(k, crops))
        assert a.shape == crops.shape and a.dtype == np.uint8
        np.testing.assert_array_equal(a, b)  # pure function of the key
        assert not np.array_equal(a, crops)

    def test_gain_range_reaches_dark_and_bright(self):
        """Across many keys the augmentation must produce BOTH strongly
        darkened and strongly brightened crops — covering the stress
        eval's exposure axis is the entire point."""
        import jax
        import numpy as np

        from tpu3dlm.ops.augment import augment_crop_batch

        crops = np.full((64, 16, 16, 3), 128, np.uint8)
        out = np.asarray(
            augment_crop_batch(jax.random.PRNGKey(0), crops,
                               hflip_p=0.0, erase_p=0.0)
        )
        means = out.reshape(64, -1).mean(axis=1)
        assert means.min() < 80 and means.max() > 180, (
            means.min(), means.max()
        )

    def test_beit_finetune_with_augment_runs(self):
        import numpy as np

        from tpu3dlm.models.beit import BeitConfig
        from tpu3dlm.pipeline.selftrain import finetune_beit

        rng = np.random.default_rng(1)
        crops = rng.integers(0, 255, (8, 16, 16, 3), np.uint8)
        labels = np.array([0, 1] * 4, np.int32)
        cfg = BeitConfig(num_labels=2, image_size=16, hidden_size=16,
                         num_layers=1, num_heads=2, intermediate_size=32)
        params = finetune_beit(crops, labels, cfg, steps=2, augment=True,
                               log_every=0)
        assert params is not None

"""Damage classification stage: batched BEiT over rectified sign crops.

API parity target: ``DamageDetector`` (reference src/damage/classifier.py)
— same model_type switch ("simple" → coarse, "detailed" → fine head) and
id2label lookup — but all crops of all frames classify in ONE jitted call
over a padded (N, 224, 224, 3) tensor, replacing the reference's per-crop
loop (classifier.py:66-85, whose own docstring lists batching as the needed
improvement). The homography rectification feeding it is the vmapped warp
in ops/image.py instead of per-box cv2 calls + temp PNG files
(detector.py:197-231).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dlm.data.scan import Detections, Scan
from tpu3dlm.models.beit import BeitClassifier, BeitConfig, preprocess_crops
from tpu3dlm.ops.image import _rectify_one_mxu


class DamageDetector:
    """Batched BEiT damage classifier over detection crops."""

    def __init__(
        self,
        model_type: str = "simple",
        num_labels: int = 2,
        id2label: dict[int, str] | None = None,
        config: BeitConfig | None = None,
        variables=None,
        batch_size: int = 64,
        rng_seed: int = 0,
        dtype=jnp.float32,
    ):
        if model_type not in ("simple", "detailed"):
            raise ValueError("Invalid model type. Choose either 'detailed' or 'simple'.")
        self.model_type = model_type
        self.config = config or BeitConfig(num_labels=num_labels)
        self.id2label = id2label or {i: f"class_{i}" for i in range(self.config.num_labels)}
        self.batch_size = batch_size
        self.model = BeitClassifier(self.config, dtype=dtype)
        self.logger = logging.getLogger(__name__)
        if variables is None:
            self.logger.warning(
                "DamageDetector initialised with random weights — convert a "
                "finetuned BEiT checkpoint via models/weights.py for real use."
            )
            variables = self.model.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros(
                    (1, self.config.image_size, self.config.image_size, 3), jnp.float32
                ),
            )
        # pin weights to device once (host trees re-upload every batch)
        self.variables = jax.device_put(variables)

        from tpu3dlm.utils.jitcache import cached

        model = self.model
        size = self.config.image_size

        def _build_classify():
            @jax.jit
            def _classify_batch(variables, crops_u8):
                logits = model.apply(variables, preprocess_crops(crops_u8))
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)

            return _classify_batch

        def _build_rectify_classify():
            @jax.jit
            def _rectify_classify_batch(variables, frames_u8, boxes):
                """Fused rectify→classify on a fixed-size batch of selected
                (frame, box) pairs — same select-then-rectify recipe as the
                fused path (parallel/inference.py), so the staged stage never
                materialises F×max_boxes crops."""
                x = frames_u8.astype(jnp.float32) / 255.0
                crops = jax.vmap(_rectify_one_mxu, in_axes=(0, 0, None))(
                    x, boxes, (size, size)
                )
                # ROUND, don't truncate: a source pixel of 181 comes back
                # from the /255 -> *255 float round trip as 180.99998, and
                # astype truncation would bias every crop dark by up to
                # 1/255 vs the reference's PNG path
                crops_u8 = jnp.clip(
                    jnp.round(crops * 255.0), 0, 255
                ).astype(jnp.uint8)
                logits = model.apply(variables, preprocess_crops(crops_u8))
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)

            return _rectify_classify_batch

        # params are call args → equivalently-configured classifiers share
        # one traced program (utils/jitcache.py)
        self._classify_batch = cached(
            ("classify", self.config, dtype), _build_classify
        )
        self._rectify_classify_batch = cached(
            ("rectify_classify", self.config, dtype), _build_rectify_classify
        )

    def classify_crops(self, crops: np.ndarray) -> np.ndarray:
        """(N, S, S, 3) uint8 crops → (N,) int32 class ids, chunked on device."""
        from tpu3dlm.utils.shapes import padded_batches

        N = crops.shape[0]
        out = np.zeros(N, np.int32)
        for (chunk,), start, n_valid in padded_batches([crops], self.batch_size):
            ids = np.asarray(self._classify_batch(self.variables, jnp.asarray(chunk)))
            out[start : start + n_valid] = ids[:n_valid]
        return out

    def classify_detections(self, scan: Scan, det: Detections) -> Detections:
        """Rectify each valid detection crop and classify; fills `det.damage`.

        Boxes are in original-image pixels; scan.rgb is stored at detector
        resolution, so boxes are rescaled before cropping.
        """
        rgb_np = np.asarray(scan.rgb)
        F, S = rgb_np.shape[0], rgb_np.shape[1]
        wh = np.asarray(scan.rgb_size)
        boxes = np.asarray(det.boxes).copy()
        if scan.letterbox is not None:  # original px → letterboxed frame px
            lb = np.asarray(scan.letterbox)
            boxes[..., 0] = boxes[..., 0] * lb[:, 0][:, None] + lb[:, 1][:, None]
            boxes[..., 2] = boxes[..., 2] * lb[:, 0][:, None] + lb[:, 1][:, None]
            boxes[..., 1] = boxes[..., 1] * lb[:, 0][:, None] + lb[:, 2][:, None]
            boxes[..., 3] = boxes[..., 3] * lb[:, 0][:, None] + lb[:, 2][:, None]
        else:
            boxes[..., 0] *= (S / wh[:, 0])[:, None]
            boxes[..., 2] *= (S / wh[:, 0])[:, None]
            boxes[..., 1] *= (S / wh[:, 1])[:, None]
            boxes[..., 3] *= (S / wh[:, 1])[:, None]

        # select THEN rectify: only valid (frame, box) pairs reach the MXU
        # resample and BEiT — the padded slots are the vast majority
        mask = np.asarray(det.mask)
        mask_flat = mask.reshape(-1)
        damage_flat = np.full(mask_flat.shape[0], -1, np.int32)
        valid_idx = np.nonzero(mask_flat)[0]
        if valid_idx.size:
            frame_idx = valid_idx // mask.shape[1]
            boxes_sel = boxes.reshape(-1, 4)[valid_idx]
            from tpu3dlm.utils.shapes import padded_batches

            # note: rgb_np[fi] re-uploads a frame once per box it contains.
            # Gathering on device would need the full (F, ...) scan resident
            # per call — a per-capture-length shape that retraces in
            # serving; the fused path (parallel/inference.py) is the
            # duplicate-free route for throughput-critical use
            for (idx, fi, bsel), _start, n_valid in padded_batches(
                [valid_idx, frame_idx, boxes_sel], self.batch_size
            ):
                ids = np.asarray(
                    self._rectify_classify_batch(
                        self.variables, jnp.asarray(rgb_np[fi]), jnp.asarray(bsel)
                    )
                )
                damage_flat[idx[:n_valid]] = ids[:n_valid]
        damage = damage_flat.reshape(F, -1)
        import dataclasses

        return dataclasses.replace(det, damage=damage)

    def get_class_label(self, class_idx):
        """id → lowercase label (reference classifier.py:92-99)."""
        if isinstance(class_idx, list):
            return [self._id2label(i) for i in class_idx]
        return self._id2label(class_idx)

    def _id2label(self, idx):
        return self.id2label[int(idx)].lower()

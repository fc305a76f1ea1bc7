"""Detection stage: batched YOLOv10 over a Scan → padded Detections.

API parity target: ``ObjectDetector`` (reference src/detector/detector.py)
— same constructor knobs (conf_thresh, iou_thresh, img_size, batch_size) and
the same output record semantics ([x1, y1, x2, y2, conf, label] in original
image pixels, detector.py:136-157) — but the implementation is one jitted
device program per frame-batch instead of ultralytics' file-based predict
(save_txt → parse txt → per-frame host loop, detector.py:82-134).

NMS-free: the YOLOv10 one-to-one head needs no IoU suppression at inference
(max_det top-k + confidence threshold), so the whole stage is static-shape.
The iou_thresh knob is accepted for config parity and ignored (documented).
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dlm.data.scan import Detections, Scan
from tpu3dlm.models.yolov10 import YOLOv10, postprocess


class ObjectDetector:
    """Runs YOLOv10 detection over a Scan's RGB frames on device."""

    def __init__(
        self,
        conf_thresh: float = 0.25,
        iou_thresh: float = 0.7,  # parity only; one-to-one head needs no NMS
        img_size: int = 640,
        batch_size: int = 16,
        max_det: int = 64,
        nc: int = 80,
        variant: str = "n",
        variables=None,
        rng_seed: int = 0,
        dtype=jnp.float32,
        save_img: str | None = None,  # dir for annotated frames (parity:
        # reference detector.py:159-189 save_img/processing_path)
        names: dict[int, str] | None = None,
    ):
        self.conf_thresh = conf_thresh
        self.iou_thresh = iou_thresh
        self.img_size = img_size
        self.batch_size = batch_size
        self.max_det = max_det
        self.save_img = save_img
        self.names = names or {i: f"class_{i}" for i in range(nc)}
        rng = np.random.default_rng(0)
        self.colors = {
            i: tuple(int(c) for c in rng.integers(0, 255, 3)) for i in range(nc)
        }
        self.model = YOLOv10(nc=nc, variant=variant, dtype=dtype)
        self.logger = logging.getLogger(__name__)
        if variables is None:
            self.logger.warning(
                "ObjectDetector initialised with random weights — convert a "
                "finetuned checkpoint via models/weights.py for real use."
            )
            variables = self.model.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, img_size, img_size, 3), jnp.float32),
            )
        # pin weights to device once (host trees re-upload every batch)
        self.variables = jax.device_put(variables)

        from tpu3dlm.utils.jitcache import cached

        model = self.model
        img_size_, max_det_ = self.img_size, self.max_det

        def _build():
            @partial(jax.jit, static_argnames=())
            def _detect_batch(variables, images_u8):
                x = images_u8.astype(jnp.float32) / 255.0
                # split head output → XLA DCEs the box/cls concat
                raw = model.apply(variables, x)["one2one_split"]
                return postprocess(raw, img_size=img_size_, max_det=max_det_)

            return _detect_batch

        # params are call args, so equivalently-configured detectors share
        # one traced program (re-tracing YOLOv10 costs seconds per instance)
        self._detect_batch = cached(
            ("detect", nc, variant, dtype, img_size_, max_det_), _build
        )

    def __call__(self, scan: Scan) -> Detections:
        return self.detect(scan)

    def detect(self, scan: Scan) -> Detections:
        """Scan → Detections with boxes in ORIGINAL image pixels."""
        rgb = np.asarray(scan.rgb)
        F = rgb.shape[0]
        if F == 0:
            # np.concatenate([]) below would raise; an empty scan is a
            # legitimate (if degenerate) input — return empty Detections
            return Detections(
                boxes=np.zeros((0, self.max_det, 4), np.float32),
                conf=np.zeros((0, self.max_det), np.float32),
                label=np.zeros((0, self.max_det), np.int32),
                damage=np.full((0, self.max_det), -1, np.int32),
                mask=np.zeros((0, self.max_det), bool),
            )
        from tpu3dlm.utils.shapes import padded_batches

        outs = []
        for (chunk,), _start, n_valid in padded_batches([rgb], self.batch_size):
            res = self._detect_batch(self.variables, jnp.asarray(chunk))
            from tpu3dlm.utils.host import to_host

            outs.append(jax.tree.map(lambda a: a[:n_valid], to_host(res)))
        boxes = np.concatenate([o["boxes"] for o in outs])[:F]
        conf = np.concatenate([o["conf"] for o in outs])[:F]
        label = np.concatenate([o["label"] for o in outs])[:F]

        # detector space (img_size × img_size) → original pixels
        wh = np.asarray(scan.rgb_size)  # (F, 2)
        if scan.letterbox is not None:
            lb = np.asarray(scan.letterbox)  # (F, 3) scale, pad_x, pad_y
            s = lb[:, 0][:, None]
            px = lb[:, 1][:, None]
            py = lb[:, 2][:, None]
            boxes = np.stack(
                [(boxes[..., 0] - px) / s, (boxes[..., 1] - py) / s,
                 (boxes[..., 2] - px) / s, (boxes[..., 3] - py) / s],
                axis=-1,
            )
            boxes[..., [0, 2]] = np.clip(boxes[..., [0, 2]], 0, wh[:, None, 0:1])
            boxes[..., [1, 3]] = np.clip(boxes[..., [1, 3]], 0, wh[:, None, 1:2])
            boxes = boxes.astype(np.float32)
        else:
            sx = (wh[:, 0] / self.img_size)[:, None]
            sy = (wh[:, 1] / self.img_size)[:, None]
            boxes = np.stack(
                [boxes[..., 0] * sx, boxes[..., 1] * sy,
                 boxes[..., 2] * sx, boxes[..., 3] * sy],
                axis=-1,
            )
            # clip to the frame — parity with the reference, whose YOLO-txt
            # normalized coordinates are inherently within the image
            # (src/detector/detector.py:136-157)
            boxes[..., [0, 2]] = np.clip(boxes[..., [0, 2]], 0, wh[:, None, 0:1])
            boxes[..., [1, 3]] = np.clip(boxes[..., [1, 3]], 0, wh[:, None, 1:2])
            boxes = boxes.astype(np.float32)

        mask = conf >= self.conf_thresh
        det = Detections(
            boxes=boxes,
            conf=conf.astype(np.float32),
            label=label.astype(np.int32),
            damage=np.full(conf.shape, -1, np.int32),
            mask=mask,
        )
        if self.save_img:
            self._save_annotated(scan, det)
        return det

    def _save_annotated(self, scan: Scan, det: Detections) -> None:
        """Write annotated frames (boxes + class names) to save_img — parity
        with the reference's processed-image export (detector.py:159-189)."""
        import os

        import cv2

        os.makedirs(self.save_img, exist_ok=True)
        rgb = np.asarray(scan.rgb)
        S = rgb.shape[1]
        wh = np.asarray(scan.rgb_size)
        for f in range(rgb.shape[0]):
            img = cv2.cvtColor(rgb[f], cv2.COLOR_RGB2BGR).copy()
            for b in range(det.boxes.shape[1]):
                if not det.mask[f, b]:
                    continue
                # original px → stored-frame px for drawing
                if scan.letterbox is not None:
                    s, px, py = np.asarray(scan.letterbox)[f]
                    x1, y1, x2, y2 = det.boxes[f, b] * s + [px, py, px, py]
                else:
                    sx, sy = S / wh[f, 0], S / wh[f, 1]
                    x1, y1, x2, y2 = det.boxes[f, b] * [sx, sy, sx, sy]
                lab = int(det.label[f, b])
                color = self.colors.get(lab, (0, 255, 0))
                cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), color, 2)
                cv2.putText(
                    img, self.names.get(lab, str(lab)),
                    (int(x1), max(int(y1) - 6, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1,
                )
            cv2.imwrite(os.path.join(self.save_img, f"image_{f}.png"), img)

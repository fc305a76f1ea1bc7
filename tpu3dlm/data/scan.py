"""The `Scan` pytree — the single in-memory data model for a capture.

Replaces the reference's loose mix of torch Dataset items, pandas DataFrames
and per-frame Python dicts (src/detector/dataset.py, src/mapper/database_query.py,
task_def.py:60-74) with fixed-shape stacked arrays so that every downstream
stage is one `jit`-compiled transform and the frame axis can be sharded over
a device mesh.

Conventions (matching the reference's record semantics, SURVEY.md §7):
* depth is float32 in millimetres (metres x 1000 — src/detector/dataset.py:77);
  `scale_depth=1000` converts back to metres at unprojection time.
* pose rows are [tx, ty, tz, qx, qy, qz, qw].
* detections are padded to a static `max_boxes` with a validity mask; a 2D
  record is conceptually [x1, y1, x2, y2, damage, conf, label] and a 3D
  record is 4 global corners + [damage, conf, label].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Scan:
    """One RGB-D capture: frames, depths, calibration, trajectory."""

    rgb: Any  # (F, H, W, 3) uint8 or float32 — RGB frames (may be host numpy)
    depth: Any  # (F, Hd, Wd) float32, millimetres
    intrinsics: Any  # (F, 4) float32 — fx, fy, cx, cy at RGB resolution
    rgb_size: Any  # (F, 2) float32 — image_width, image_height of RGB frames
    poses: Any  # (F, 7) float32 — tx, ty, tz, qx, qy, qz, qw
    timestamps: Any = None  # (F,) float64 seconds, optional
    letterbox: Any = None  # (F, 3) float32 [scale, pad_x, pad_y] when frames
    # were letterboxed to the detector square (ultralytics-style); None when
    # plain square-resized

    @property
    def num_frames(self) -> int:
        return int(np.shape(self.depth)[0])

    @property
    def depth_hw(self) -> tuple[int, int]:
        return int(np.shape(self.depth)[1]), int(np.shape(self.depth)[2])


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Detections:
    """Padded per-frame 2D detections: the ragged-to-static bridge.

    boxes[f, b] is only meaningful where mask[f, b]; padded rows are zero.
    """

    boxes: Any  # (F, B, 4) float32 — x1, y1, x2, y2 in RGB pixels
    conf: Any  # (F, B) float32
    label: Any  # (F, B) int32
    damage: Any  # (F, B) int32 — damage class (classifier output), -1 = unset
    mask: Any  # (F, B) bool

    @property
    def max_boxes(self) -> int:
        return int(np.shape(self.boxes)[1])

    def to_frame_dict(self) -> dict[int, list[list[float]]]:
        """Export to the reference's prediction record shape:
        {frame_index: [[x1, y1, x2, y2, damage, conf, label], ...]}
        (src/detector/detector.py:126-129)."""
        from tpu3dlm.utils.host import to_host

        boxes, conf, label, damage, mask = to_host(
            (self.boxes, self.conf, self.label, self.damage, self.mask)
        )
        out: dict[int, list[list[float]]] = {}
        for f in range(boxes.shape[0]):
            rows = []
            for b in range(boxes.shape[1]):
                if mask[f, b]:
                    x1, y1, x2, y2 = (float(v) for v in boxes[f, b])
                    rows.append(
                        [x1, y1, x2, y2, int(damage[f, b]), float(conf[f, b]), int(label[f, b])]
                    )
            out[f] = rows
        return out


def detections_from_frame_dict(
    predictions: dict[int, list[list[float]]],
    num_frames: int,
    max_boxes: int | None = None,
) -> Detections:
    """Build padded Detections from the reference-shaped prediction dict."""
    counts = [len(predictions.get(f, [])) for f in range(num_frames)]
    B = max_boxes if max_boxes is not None else max(1, max(counts, default=1))
    boxes = np.zeros((num_frames, B, 4), np.float32)
    conf = np.zeros((num_frames, B), np.float32)
    label = np.zeros((num_frames, B), np.int32)
    damage = np.full((num_frames, B), -1, np.int32)
    mask = np.zeros((num_frames, B), bool)
    for f in range(num_frames):
        for b, rec in enumerate(predictions.get(f, [])[:B]):
            if len(rec) == 7:
                x1, y1, x2, y2, dmg, c, lab = rec
            else:  # pre-classification record [x1,y1,x2,y2,conf,label]
                x1, y1, x2, y2, c, lab = rec
                dmg = -1
            boxes[f, b] = [x1, y1, x2, y2]
            conf[f, b] = c
            label[f, b] = int(lab)
            damage[f, b] = int(dmg)
            mask[f, b] = True
    return Detections(boxes=boxes, conf=conf, label=label, damage=damage, mask=mask)

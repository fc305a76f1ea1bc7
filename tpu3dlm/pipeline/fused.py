"""Fused scan inference: detect → rectify → classify → project in ONE jit.

The staged path (pipeline/detector.py + classifier.py + mapper/projection.py)
mirrors the reference's architecture stage-for-stage; this module is the
production fast path: the whole perception+projection program compiles once
(parallel/inference.full_scan_step_fn), frames stream through in device
batches with zero host round-trips between stages, and with mesh_devices > 1
the frame axis shards over the chip mesh.

Enabled via config ``fused_inference = true`` (pipeline/task.py) or used
directly: `FusedScanRunner(...)(scan)` → (Detections, GlobalBoxes).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dlm.data.scan import Detections, Scan
from tpu3dlm.mapper.projection import GlobalBoxes
from tpu3dlm.models.beit import BeitClassifier, BeitConfig
from tpu3dlm.models.yolov10 import YOLOv10
from tpu3dlm.parallel.inference import full_scan_step_fn, sharded_full_scan_step
from tpu3dlm.parallel.mesh import make_mesh, pad_to_devices, replicate, shard_batch


class FusedScanRunner:
    def __init__(
        self,
        img_size: int = 640,
        conf_thresh: float = 0.25,
        max_det: int = 64,
        nc: int = 80,
        variant: str = "n",
        beit_config: BeitConfig | None = None,
        yolo_variables=None,
        beit_variables=None,
        mesh_devices: int = 1,
        rng_seed: int = 0,
        dtype=jnp.bfloat16,
    ):
        self.img_size = img_size
        self.conf_thresh = conf_thresh
        self.max_det = max_det
        self.logger = logging.getLogger(__name__)

        self.yolo = YOLOv10(nc=nc, variant=variant, dtype=dtype)
        self.beit = BeitClassifier(beit_config or BeitConfig(), dtype=dtype)
        if yolo_variables is None:
            yolo_variables = self.yolo.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, img_size, img_size, 3), jnp.float32),
            )
        if beit_variables is None:
            s = self.beit.cfg.image_size
            beit_variables = self.beit.init(
                jax.random.PRNGKey(rng_seed + 1), jnp.zeros((1, s, s, 3), jnp.float32)
            )
        from tpu3dlm.utils.jitcache import cached

        self.mesh = make_mesh(mesh_devices) if mesh_devices > 1 else None
        # pin weights to device(s) once — host (numpy) trees would re-upload
        # on every call (~11 MB/scan over a remote tunnel)
        if self.mesh is None:
            yolo_variables = jax.device_put(yolo_variables)
            beit_variables = jax.device_put(beit_variables)
        else:
            yolo_variables = replicate(yolo_variables, self.mesh)
            beit_variables = replicate(beit_variables, self.mesh)
        self.yolo_variables = yolo_variables
        self.beit_variables = beit_variables
        key = (
            "fused_step", nc, variant, self.beit.cfg, dtype,
            img_size, max_det, conf_thresh, mesh_devices,
        )
        if self.mesh is not None:
            self._step = cached(
                key,
                lambda: sharded_full_scan_step(
                    self.mesh, self.yolo, self.beit, img_size, max_det, conf_thresh
                ),
            )
        else:
            # params are call args → equivalently-configured runners share
            # one traced program (utils/jitcache.py)
            self._step = cached(
                key,
                lambda: jax.jit(
                    full_scan_step_fn(
                        self.yolo, self.beit, img_size, max_det, conf_thresh
                    )
                ),
            )

    def __call__(self, scan: Scan) -> tuple[Detections, GlobalBoxes]:
        if scan.letterbox is not None:
            lb = np.asarray(scan.letterbox, np.float32)  # (F, 3) s, px, py
            affine = np.stack([lb[:, 0], lb[:, 0], lb[:, 1], lb[:, 2]], axis=-1)
        else:
            from tpu3dlm.parallel.inference import square_box_affine

            affine = square_box_affine(scan.rgb_size, self.img_size)
        args = (
            jnp.asarray(scan.rgb),
            jnp.asarray(scan.depth),
            jnp.asarray(scan.intrinsics),
            jnp.asarray(scan.rgb_size),
            jnp.asarray(scan.poses),
            jnp.asarray(affine),
        )
        F = scan.num_frames
        if self.mesh is not None:
            args, _ = pad_to_devices(args, self.mesh)
            out = self._step(
                self.yolo_variables,  # replicated at construction
                self.beit_variables,
                *shard_batch(tuple(jnp.asarray(a) for a in args), self.mesh),
            )
        else:
            out = self._step(self.yolo_variables, self.beit_variables, *args)
        out = jax.tree.map(lambda a: np.asarray(a)[:F], out)

        det = Detections(
            boxes=out["boxes"].astype(np.float32),
            conf=out["conf"].astype(np.float32),
            label=out["label"].astype(np.int32),
            damage=np.where(out["mask"], out["damage"], -1).astype(np.int32),
            mask=out["mask"] & (out["conf"] >= self.conf_thresh),
        )
        gboxes = GlobalBoxes(
            corners=out["corners"],
            damage=det.damage,
            conf=det.conf,
            label=det.label,
            mask=det.mask,
        )
        return det, gboxes

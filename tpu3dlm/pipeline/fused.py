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


def _pad_scan_frames(scan: Scan) -> Scan:
    """Pad every frame-axis leaf to the next bucket with inert frames:
    zero RGB (no detection clears conf_thresh), zero depth, identity
    intrinsics/size/letterbox (avoids div-by-zero in the affine inverse),
    identity-quaternion poses (zero quats normalize to NaN)."""
    import dataclasses

    from tpu3dlm.utils.shapes import next_bucket, pad_axis0, pad_poses

    F = scan.num_frames
    # fine buckets (quarter-octave from 4): frames are the EXPENSIVE axis
    # here (full YOLO forward per frame + h2d of the RGB), so ≤25% padding
    # at ~4 compiles/octave is the right trade — unlike the cheap NMS /
    # projection programs where fewer compiles win
    Fb = next_bucket(F, min_bucket=4, quarter_from=4)
    if Fb == F:
        return scan
    poses = pad_poses(scan.poses, Fb)
    letterbox = scan.letterbox
    if letterbox is not None:
        letterbox = pad_axis0(letterbox, Fb)
        letterbox[F:, 0] = 1.0  # scale 0 would blow up the pixel-map inverse
    return dataclasses.replace(
        scan,
        rgb=pad_axis0(scan.rgb, Fb),
        depth=pad_axis0(scan.depth, Fb),
        intrinsics=pad_axis0(scan.intrinsics, Fb, fill=1),
        rgb_size=pad_axis0(scan.rgb_size, Fb, fill=1),
        poses=poses,
        letterbox=letterbox,
        timestamps=None if scan.timestamps is None
        else pad_axis0(scan.timestamps, Fb),
    )


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
        crop_budget: int = 128,
    ):
        self.img_size = img_size
        self.conf_thresh = conf_thresh
        self.max_det = max_det
        self.crop_budget = crop_budget
        self.logger = logging.getLogger(__name__)

        self.yolo = YOLOv10(nc=nc, variant=variant, dtype=dtype)
        beit_cfg = beit_config or BeitConfig()
        # mesh_devices > 1 no longer downgrades attn_impl: the sharded step
        # runs the BEiT classify under shard_map (parallel/inference.py), so
        # the fused Pallas attention kernel partitions over the mesh instead
        # of being replicated by GSPMD (VERDICT r2 item 2).
        self.beit = BeitClassifier(beit_cfg, dtype=dtype)
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
        # the sharded program closes over the Mesh — key on the concrete
        # device ids, not just the count, so a runner built after a backend
        # reinit (different devices, same count) gets a fresh program
        mesh_ids = (
            tuple(int(d.id) for d in self.mesh.devices.flat)
            if self.mesh is not None
            else ()
        )
        key = (
            "fused_step", nc, variant, self.beit.cfg, dtype,
            img_size, max_det, conf_thresh, mesh_devices, mesh_ids, crop_budget,
        )
        if self.mesh is not None:
            self._step = cached(
                key,
                lambda: sharded_full_scan_step(
                    self.mesh, self.yolo, self.beit, img_size, max_det,
                    conf_thresh, crop_budget,
                ),
            )
        else:
            # params are call args → equivalently-configured runners share
            # one traced program (utils/jitcache.py)
            self._step = cached(
                key,
                lambda: jax.jit(
                    full_scan_step_fn(
                        self.yolo, self.beit, img_size, max_det, conf_thresh,
                        crop_budget,
                    )
                ),
            )

    def _dispatch(self, scan: Scan):
        """Enqueue the fused step for one scan/chunk; returns DEVICE arrays
        immediately (JAX async dispatch) — no host sync."""
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
        if self.mesh is not None:
            args, _ = pad_to_devices(args, self.mesh)
            return self._step(
                self.yolo_variables,  # replicated at construction
                self.beit_variables,
                *shard_batch(tuple(jnp.asarray(a) for a in args), self.mesh),
            )
        return self._step(self.yolo_variables, self.beit_variables, *args)

    def _finalize(self, out, n_frames: int) -> tuple[Detections, GlobalBoxes]:
        """Device outputs → host Detections/GlobalBoxes, trimmed to the
        first ``n_frames`` real frames (drops device-mesh / chunk padding).
        This is the sync point — all leaves are copied device→host with
        one batched async round trip (utils/host.to_host: leaf-serial
        np.asarray pays ~90 ms tunnel latency PER leaf)."""
        from tpu3dlm.utils.host import to_host

        out = jax.tree.map(lambda a: a[:n_frames], to_host(out))
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

    def __call__(self, scan: Scan) -> tuple[Detections, GlobalBoxes]:
        # whole-scan mode pads the frame axis to a bucket (utils/shapes) so
        # captures of different lengths share one compiled step in a serving
        # process; zero frames are inert (no detection clears conf_thresh —
        # the same mechanism the streaming path's ragged-tail padding relies
        # on, tests/test_fused.py) and _finalize trims them. Streaming chunks
        # (run_stream) are already fixed-shape and skip this.
        return self._finalize(
            self._dispatch(_pad_scan_frames(scan)), scan.num_frames
        )

    def run_stream(
        self, chunks, max_inflight: int = 2
    ) -> tuple[Detections, GlobalBoxes]:
        """Run a stream of fixed-shape scan chunks (see
        ``data.dataset.iter_scan_chunks``) with host/device overlap.

        Double buffering falls out of JAX async dispatch: each chunk is
        enqueued without sync, so while the device runs chunk i the host
        generator decodes chunk i+1. At most ``max_inflight`` chunks are
        pending on the device (older results are drained to host first),
        so device + host memory stay bounded by O(chunk_frames ·
        max_inflight) regardless of capture length — the streaming
        equivalent of the reference's frame-at-a-time loop
        (src/mapper/pose_processor.py:93).

        ``chunks`` yields ``(Scan, valid)`` pairs. Returns the
        concatenated Detections/GlobalBoxes over all real frames.
        ``self.stream_peak_inflight`` records the high-water mark (used by
        the bounded-memory test).

        Crop-budget semantics: ``crop_budget`` applies PER CHUNK here (the
        whole-scan path selects the global top-k across all frames). The
        paths are bit-identical whenever the budget does not bind —
        ≤ crop_budget above-threshold detections per chunk, the normal
        operating point; a global budget would need every chunk's
        confidences before classifying anything, forfeiting the
        decode/compute overlap this mode exists for. When the budget binds,
        streaming classifies AT LEAST as many crops as whole-scan (k per
        chunk vs k per scan), erring toward more damage labels.
        """
        from collections import deque

        pending: deque = deque()
        dets: list[Detections] = []
        gbs: list[GlobalBoxes] = []
        self.stream_peak_inflight = 0

        def drain_one():
            out, valid = pending.popleft()
            det, gb = self._finalize(out, valid)
            dets.append(det)
            gbs.append(gb)

        for scan, valid in chunks:
            # drain BEFORE dispatching: appending first would hold
            # max_inflight+1 chunks of device buffers at once, breaking the
            # documented O(chunk_frames · max_inflight) bound users size
            # HBM against (dispatch is async, so draining the oldest chunk
            # first costs no overlap — the new chunk enqueues right after)
            while len(pending) >= max_inflight:
                drain_one()
            pending.append((self._dispatch(scan), valid))
            self.stream_peak_inflight = max(
                self.stream_peak_inflight, len(pending)
            )
        while pending:
            drain_one()

        if not dets:
            raise ValueError("run_stream: empty chunk stream")
        cat = lambda xs: np.concatenate(xs, axis=0)  # noqa: E731
        det = Detections(
            boxes=cat([d.boxes for d in dets]),
            conf=cat([d.conf for d in dets]),
            label=cat([d.label for d in dets]),
            damage=cat([d.damage for d in dets]),
            mask=cat([d.mask for d in dets]),
        )
        gb = GlobalBoxes(
            corners=cat([g.corners for g in gbs]),
            damage=det.damage,
            conf=det.conf,
            label=det.label,
            mask=det.mask,
        )
        return det, gb

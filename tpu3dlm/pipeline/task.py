"""Pipeline orchestrator: the reference's task_def.py as a TPU-native flow.

Parity targets (reference task_def.py):
* ``Pipeline(data_folder, cfg, cfg_goldstd, goldstd_var).run()`` (:28-86) —
  extract → detect (+damage classify) → pose → project → 3D NMS →
  checkpoint → optional map plot → maintenance comparison;
* pickle checkpoint of all intermediates keyed by data folder (:60-74) with
  the same record keys (predictions, global_bboxes_data, optimised_bboxes,
  pose_df) so every stage can resume standalone (SURVEY.md §5);
* ``load_gold_std`` / ``setup_pipeline`` (:200-215) and the gold-std vs
  maintenance mode switch (:234-249).

TPU-native differences: stages operate on the Scan/Detections pytrees and
run as jitted device programs; per-stage wall-clock is recorded (the
reference has no profiling — SURVEY.md §5) and reported as frames/sec.
"""

from __future__ import annotations

import logging
import os
import pickle
import time

import numpy as np

from tpu3dlm.alignment import Alignment, BBoxComparison
from tpu3dlm.data.dataset import load_scan
from tpu3dlm.data.poses import load_poses, poses_to_dataframe
from tpu3dlm.data.rtabmap_db import ImageExtractor
from tpu3dlm.data.scan import Detections, Scan
from tpu3dlm.mapper import project_detections, suppress_bboxes
from tpu3dlm.pipeline.classifier import DamageDetector
from tpu3dlm.pipeline.detector import ObjectDetector

def _cached_device_weights(key, builder, *args):
    """Converted, device-resident model weights shared across Pipeline
    instances (one utils/jitcache entry per (kind, path, mtime, model
    config) key, so an updated checkpoint file or different model shape
    misses). A two-scan run (gold standard + maintenance) uses the same
    checkpoints; without this every Pipeline re-read the msgpack, re-built
    the tree, and re-uploaded ~11 MB over the (remote) device link —
    ~1.5 s per scan of the measured e2e wall-clock. device_put pins the
    tree once; runners' own device_put of an already-committed array is a
    no-op."""
    import jax

    from tpu3dlm.utils.jitcache import cached

    return cached(("device_weights", key), lambda: jax.device_put(builder(*args)))


class Pipeline:
    def __init__(self, data_folder, cfg, cfg_goldstd=None, goldstd_var=None):
        self.cfg = cfg
        self.cfg_goldstd = cfg_goldstd
        self.data_folder = data_folder
        self.goldstd_var = goldstd_var
        self.data_to_save: dict = {}
        self.stage_times: dict[str, float] = {}

        logging.basicConfig(level=logging.INFO)
        self.logger = logging.getLogger(__name__)

    # -- stages -----------------------------------------------------------

    def _timed(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        self.stage_times[name] = time.perf_counter() - t0
        return out

    def run(self, resume: bool = False) -> dict:
        """Full pipeline; ``resume=True`` reuses detection results from the
        stage checkpoint when present (the reference's de-facto resume
        mechanism — every module __main__ restarts from the pickle,
        SURVEY.md §4/§5) so a crash after the expensive detect stage doesn't
        repeat it."""
        stream_n = getattr(self.cfg, "streaming_chunk", 0)
        use_stream = stream_n > 0 and getattr(self.cfg, "fused_inference", False)
        if stream_n > 0 and not use_stream:
            # the bounded-memory promise of streaming_chunk is void without
            # the fused path — silently materialising the whole capture is
            # exactly what the knob was set to prevent
            self.logger.warning(
                "streaming_chunk = %d ignored: streaming requires "
                "fused_inference = true — the full capture will be "
                "materialised in host memory", stream_n,
            )
        if use_stream:
            # streaming ingestion: never materialise the whole capture —
            # frames decode chunk-by-chunk inside the fused detect stage
            scan = self._timed("extract", self._extract_light)
        else:
            scan = self._timed("extract", self._extract_images)
        detections = None
        if resume and use_stream:
            # streaming keeps no frames in memory: resumed detections would
            # have to re-project through the placeholder scan (1×1 zero
            # depth/intrinsics) and silently produce garbage boxes —
            # re-running the streamed detect stage is cheap and correct
            self.logger.info(
                "resume ignored under streaming ingestion — re-running detect"
            )
            resume = False
        if resume and os.path.exists(self.cfg.pickle_path):
            try:
                with open(self.cfg.pickle_path, "rb") as f:
                    prior = pickle.load(f)
                if "predictions" in prior:
                    from tpu3dlm.data.scan import detections_from_frame_dict

                    detections = detections_from_frame_dict(
                        prior["predictions"], scan.num_frames
                    )
                    self.logger.info("Resumed detections from checkpoint.")
            except Exception as e:
                self.logger.warning("resume failed (%s); re-running detect", e)
        fused_gboxes = None
        if detections is None:
            if use_stream:
                detections, fused_gboxes = self._timed(
                    "detect", self._fused_streaming, stream_n
                )
            elif getattr(self.cfg, "fused_inference", False):
                detections, fused_gboxes = self._timed(
                    "detect", self._fused_inference, scan
                )
            else:
                detections = self._timed("detect", self._detect_signs, scan)
        global_bboxes, optimised, pose_df = self._timed(
            "map", self._map_detected_objects, scan, detections, fused_gboxes
        )

        self.data_to_save = {
            "predictions": detections.to_frame_dict(),
            "global_bboxes_data": global_bboxes.to_frame_dict(),
            "optimised_bboxes": optimised.to_frame_dict(),
            "pose_df": pose_df,
            "stage_times": dict(self.stage_times),
        }
        try:
            os.makedirs(os.path.dirname(self.cfg.pickle_path) or ".", exist_ok=True)
            # atomic write: a crash mid-dump must not leave a truncated
            # pickle at the real path (load_gold_std would see corrupt)
            tmp = self.cfg.pickle_path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump(self.data_to_save, f)
            os.replace(tmp, self.cfg.pickle_path)
            self.logger.info("Variables stored to pickle file.")
        except Exception as e:
            self.logger.info(f"Failed to write to file: {e}")

        if self.cfg.visualise:
            if use_stream:
                self.logger.warning(
                    "visualise skipped: streaming ingestion keeps no frames "
                    "in memory (set streaming_chunk = 0 to plot)"
                )
            else:
                self._timed(
                    "plot", self._plot_map, scan, global_bboxes, optimised, pose_df
                )

        if self.cfg_goldstd and self.goldstd_var:
            self._timed(
                "compare", self._goldstd_vs_maintenance, pose_df,
                self.data_to_save["optimised_bboxes"],
            )

        frames = scan.num_frames
        core = self.stage_times.get("detect", 0) + self.stage_times.get("map", 0)
        if core > 0:
            self.logger.info(
                "Throughput: %.2f frames/sec (detect+project, %d frames)",
                frames / core, frames,
            )
        return self.data_to_save

    def _extract_images(self) -> Scan:
        self.logger.info("Extracting frames...")
        if os.path.exists(self.cfg.db_path):
            extractor = ImageExtractor(
                self.cfg.db_path, self.cfg.depth_image_dir, self.cfg.image_dir
            )
            extractor.fetch_data()
            extractor.close()
        scan = load_scan(
            image_dir=self.cfg.image_dir,
            depth_image_dir=self.cfg.depth_image_dir,
            calibration_dir=self.cfg.calibration_dir,
            pose_path=self.cfg.pose_path,
            img_size=self.cfg.img_size,
            depth_width=self.cfg.depth_width,
            depth_height=self.cfg.depth_height,
            cache=getattr(self.cfg, "scan_cache", False),
            workers=getattr(self.cfg, "decode_workers", 0),
        )
        self.logger.info("Frames extracted.")
        return scan

    def _detect_signs(self, scan: Scan) -> Detections:
        self.logger.info("Detecting Signs...")
        import jax.numpy as jnp

        dtype = (
            jnp.bfloat16
            if getattr(self.cfg, "infer_dtype", "bf16") == "bf16"
            else jnp.float32
        )
        save_img = self.cfg.processing_path if getattr(self.cfg, "view_img", False) else None
        if save_img:
            os.makedirs(save_img, exist_ok=True)
        detector = ObjectDetector(
            conf_thresh=self.cfg.conf_thresh,
            iou_thresh=self.cfg.iou_thresh,
            img_size=self.cfg.img_size,
            batch_size=self.cfg.batch_size,
            max_det=getattr(self.cfg, "max_det", 64),
            nc=getattr(self.cfg, "num_classes", 80),
            variant=getattr(self.cfg, "yolo_variant", "n"),
            variables=self._load_yolo_weights(),
            save_img=save_img,
            dtype=dtype,
        )
        detections = detector(scan)

        labels = getattr(self.cfg, "damage_labels", "undamaged,damaged").split(",")
        classifier = DamageDetector(
            num_labels=len(labels),
            id2label={i: lab for i, lab in enumerate(labels)},
            config=self._beit_config(len(labels)),
            variables=self._load_beit_weights(len(labels)),
            dtype=dtype,
        )
        detections = classifier.classify_detections(scan, detections)
        self.logger.info("Inference Complete.")
        return detections

    def _extract_light(self) -> Scan:
        """Streaming-mode extract: db → files as usual, but only poses and
        frame count come into memory — rgb/depth stay on disk for
        `iter_scan_chunks` to decode chunk-by-chunk."""
        self.logger.info("Extracting frames (streaming mode)...")
        if os.path.exists(self.cfg.db_path):
            extractor = ImageExtractor(
                self.cfg.db_path, self.cfg.depth_image_dir, self.cfg.image_dir
            )
            extractor.fetch_data()
            extractor.close()
        from tpu3dlm.data.dataset import _pair_filenames, _pose_rows_for_pairs

        pairs = _pair_filenames(self.cfg.image_dir, self.cfg.depth_image_dir)
        ts, poses = load_poses(self.cfg.pose_path)
        pairs, pose_rows = _pose_rows_for_pairs(pairs, poses.shape[0])
        n = len(pairs)
        if n == 0:
            raise ValueError(
                f"no paired frames found in {self.cfg.image_dir} / "
                f"{self.cfg.depth_image_dir}"
            )
        self.logger.info("Frames indexed (%d, decode deferred).", n)
        # placeholder rgb/depth keep Scan's shape contract (num_frames is
        # depth.shape[0]) without holding frames
        return Scan(
            rgb=np.zeros((n, 1, 1, 3), np.uint8),
            depth=np.zeros((n, 1, 1), np.float32),
            intrinsics=np.zeros((n, 4), np.float32),
            rgb_size=np.ones((n, 2), np.float32),
            poses=poses[pose_rows],
            timestamps=ts[pose_rows],
        )

    def _fused_streaming(self, chunk_frames: int):
        """Chunked fused inference: bounded-memory ingestion of captures
        larger than host RAM/HBM (data/dataset.iter_scan_chunks +
        FusedScanRunner.run_stream)."""
        from tpu3dlm.data.dataset import iter_scan_chunks

        runner = self._make_fused_runner()
        chunks = iter_scan_chunks(
            image_dir=self.cfg.image_dir,
            depth_image_dir=self.cfg.depth_image_dir,
            calibration_dir=self.cfg.calibration_dir,
            pose_path=self.cfg.pose_path,
            chunk_frames=chunk_frames,
            img_size=self.cfg.img_size,
            depth_width=self.cfg.depth_width,
            depth_height=self.cfg.depth_height,
            cache=getattr(self.cfg, "scan_cache", False),
            workers=getattr(self.cfg, "decode_workers", 0),
        )
        return runner.run_stream(chunks)

    def _fused_inference(self, scan: Scan):
        """Single-jit detect+classify+project (pipeline/fused.py)."""
        return self._make_fused_runner()(scan)

    def _make_fused_runner(self):
        import jax.numpy as jnp

        from tpu3dlm.pipeline.fused import FusedScanRunner

        labels = getattr(self.cfg, "damage_labels", "undamaged,damaged").split(",")
        runner = FusedScanRunner(
            img_size=self.cfg.img_size,
            conf_thresh=self.cfg.conf_thresh,
            max_det=getattr(self.cfg, "max_det", 64),
            nc=getattr(self.cfg, "num_classes", 80),
            variant=getattr(self.cfg, "yolo_variant", "n"),
            beit_config=self._beit_config(len(labels)),
            yolo_variables=self._load_yolo_weights(),
            beit_variables=self._load_beit_weights(len(labels)),
            mesh_devices=getattr(self.cfg, "mesh_devices", 1),
            dtype=jnp.bfloat16
            if getattr(self.cfg, "infer_dtype", "bf16") == "bf16"
            else jnp.float32,
            crop_budget=getattr(self.cfg, "crop_budget", 128),
        )
        return runner

    def _map_detected_objects(self, scan: Scan, detections: Detections, fused_gboxes=None):
        self.logger.info("Extracting Pose Information...")
        # the Scan already carries the parsed poses/timestamps — re-reading
        # poses.txt here would add a second source of truth that could
        # diverge from scan.poses if the file changes mid-run
        pose_df = poses_to_dataframe(
            np.asarray(scan.timestamps), np.asarray(scan.poses)
        )
        self.logger.info("Pose Information Extracted.")

        self.logger.info("Processing Pose...")
        global_bboxes = (
            fused_gboxes if fused_gboxes is not None else project_detections(scan, detections)
        )
        self.logger.info("Pose Processed.")

        self.logger.info("Executing 3D NMS...")
        optimised = suppress_bboxes(
            global_bboxes,
            np.asarray(scan.poses),
            top_k=getattr(self.cfg, "nms_top_k", 1024),
        )
        self.logger.info("3D NMS Executed.")
        return global_bboxes, optimised, pose_df

    def _plot_map(self, scan, global_bboxes, optimised, pose_df):
        """3D map artifact: a real triangle-mesh PLY next to the cloud.

        ``mesh_source = cloud`` (default) surface-reconstructs cloud.ply
        (reference make_mesh semantics, mapping.py:86-97); ``tsdf`` fuses
        the scan's depth frames on device instead (mapper/meshing.py) —
        denoised free-space-carved geometry the reference cannot produce.
        """
        self.logger.info("Generating 3D Map...")
        out = os.path.join(os.path.dirname(self.cfg.ply_path) or ".", "map_mesh.ply")
        if getattr(self.cfg, "mesh_source", "cloud") == "tsdf":
            from tpu3dlm.data.ply import save_ply_mesh
            from tpu3dlm.mapper.meshing import mesh_scan

            verts, faces = mesh_scan(scan, voxel=getattr(self.cfg, "mesh_voxel", 0.04))
            save_ply_mesh(out, verts, faces)
            self.logger.info(
                "TSDF mesh: %d vertices / %d triangles → %s", len(verts), len(faces), out
            )
        else:
            from tpu3dlm.mapper.mapping import Mapping

            mapper = Mapping(
                global_bboxes_data=global_bboxes,
                optimised_bboxes=optimised,
                pose=pose_df,
                eps=self.cfg.eps,
                min_points=self.cfg.min_points,
                ply_filepath=self.cfg.ply_path,
                preprocess_point_cloud=self.cfg.preprocess_point_cloud,
                overlay_pose=self.cfg.overlay_pose,
            )
            mapper.make_mesh(
                output_path=out,
                voxel=getattr(self.cfg, "mesh_voxel", 0.04),
                mesher=getattr(self.cfg, "mesher", "density"),
            )
        self.logger.info("3D Map Generated.")

    def _goldstd_vs_maintenance(self, pose_df, optimised_bboxes):
        from tpu3dlm.data.ply import load_ply

        base_cloud = comp_cloud = None
        try:
            gold_ply = self.cfg_goldstd.ply_path
            if os.path.exists(gold_ply):
                base_cloud, _ = load_ply(gold_ply)
            if os.path.exists(self.cfg.ply_path):
                comp_cloud, _ = load_ply(self.cfg.ply_path)
        except Exception as e:
            self.logger.warning("cloud load failed (%s); aligning on poses+boxes", e)

        align = Alignment(
            base_pose_df=self.goldstd_var["pose_df"],
            comparison_pose_df=pose_df,
            base_bboxes=self.goldstd_var["optimised_bboxes"],
            comparison_bboxes=optimised_bboxes,
            visualise=self.cfg.alignment_vis,
            base_cloud=base_cloud,
            comparison_cloud=comp_cloud,
            max_points=getattr(self.cfg, "icp_max_points", 16384),
            icp_iterations=getattr(self.cfg, "icp_iterations", 30),
            mesh=self._alignment_mesh(),
            global_init=getattr(self.cfg, "icp_global_init", "auto"),
            ann=getattr(self.cfg, "icp_ann", "auto"),
            # cfg knob semantics: true (default) = auto — Pallas kernels
            # where the backend is TPU; false = force the XLA fallback
            # everywhere (escape hatch for Pallas/Mosaic issues)
            use_pallas=(None if getattr(self.cfg, "use_pallas", True) else False),
            # registration-confidence gate (RegistrationVerdict); floors
            # derived from the measured convergence envelope
            # (docs/ALIGNMENT_ENVELOPE.md)
            verdict_inlier_floor=getattr(self.cfg, "align_inlier_floor", 0.35),
            verdict_rmse_ceiling=getattr(self.cfg, "align_rmse_ceiling", 0.08),
        )
        aligned_bboxes, transformations, base_map, comp_map = align.compare(
            self.data_folder
        )
        self.data_to_save["transformations"] = transformations
        self.data_to_save["aligned_bboxes"] = aligned_bboxes
        verdict = align.last_verdict.to_dict() if align.last_verdict else None
        self.data_to_save["alignment_verdict"] = verdict

        labels = getattr(self.cfg, "damage_labels", "undamaged,damaged").split(",")
        compare = BBoxComparison(
            self.goldstd_var["optimised_bboxes"],
            aligned_bboxes,
            base_map,
            visualise=self.cfg.comparison_vis,
            csv_output_file=self.cfg.csv_output,
            id2damage={i: lab for i, lab in enumerate(labels)},
            # the fused compare program already solved this assignment
            # (alignment/align.py::Alignment.last_match) — zero extra
            # dispatches when the thresholds/record counts line up
            precomputed_match=align.last_match,
            # every CSV row carries the registration-confidence flag: a
            # MISSING row under a suspect alignment is not a finding
            alignment_verdict=verdict,
        )
        rows = compare.match_bboxes()
        self.data_to_save["comparison_rows"] = rows

        if self.cfg.alignment_vis:
            from tpu3dlm.alignment.visualise import VisualiseAlignment

            # the animation REPLAYS the recorded transforms, so it starts
            # from the raw (unaligned) comparison points — comp_map is
            # already aligned and would double-apply the chain
            vis = VisualiseAlignment(
                base_map,
                align.comparison_points,
                mesher=getattr(self.cfg, "mesher", "density"),
            )
            out = os.path.join(
                os.path.dirname(self.cfg.csv_output) or ".", "alignment_animation.mp4"
            )
            vis.create_video(transformations, out)

    def _alignment_mesh(self):
        """Query-sharded ICP mesh when cfg.mesh_devices > 1 (parallel/nn.py)."""
        n = getattr(self.cfg, "mesh_devices", 1)
        if n and n > 1:
            from tpu3dlm.parallel.mesh import make_mesh

            return make_mesh(n)
        return None

    # -- weights ----------------------------------------------------------

    def _beit_config(self, num_labels: int):
        """BeitConfig from the cfg's beit_* architecture knobs (BEiT-base
        defaults) so compact task-specific classifiers from
        pipeline/selftrain.py can run through the same pipeline."""
        from tpu3dlm.models.beit import BeitConfig

        base = BeitConfig()
        return BeitConfig(
            image_size=getattr(self.cfg, "beit_image_size", base.image_size),
            patch_size=getattr(self.cfg, "beit_patch_size", base.patch_size),
            hidden_size=getattr(self.cfg, "beit_hidden_size", base.hidden_size),
            num_layers=getattr(self.cfg, "beit_num_layers", base.num_layers),
            num_heads=getattr(self.cfg, "beit_num_heads", base.num_heads),
            intermediate_size=getattr(
                self.cfg, "beit_intermediate_size", base.intermediate_size
            ),
            num_labels=num_labels,
            # use_pallas = false opts the whole pipeline out of pallas
            # kernels (same knob the ICP NN kernel honors, task.py below);
            # "auto" keeps einsum on f32 / non-TPU paths regardless
            attn_impl=(
                "auto" if getattr(self.cfg, "use_pallas", True) else "einsum"
            ),
            # beit_quant = int8 reroutes every encoder Dense onto the MXU's
            # 2×-rate int8 path (ops/quant.py); checkpoints stay float on
            # disk and are quantized at load (_build_beit_weights)
            quant=getattr(self.cfg, "beit_quant", "none"),
        )

    def _load_yolo_weights(self):
        path = getattr(self.cfg, "yolo_weights", "") or ""
        if not path or not os.path.exists(path):
            return None

        key = (
            "yolo", os.path.abspath(path), os.path.getmtime(path),
            getattr(self.cfg, "num_classes", 80),
            getattr(self.cfg, "yolo_variant", "n"), self.cfg.img_size,
        )
        return _cached_device_weights(key, self._build_yolo_weights, path)

    def _build_yolo_weights(self, path):
        from tpu3dlm.models import weights as W

        if path.endswith(".msgpack"):  # framework-native checkpoint
            import jax.numpy as jnp

            from tpu3dlm.models.yolov10 import YOLOv10

            model = YOLOv10(
                nc=getattr(self.cfg, "num_classes", 80),
                variant=getattr(self.cfg, "yolo_variant", "n"),
            )
            template = W.init_template(
                model, jnp.zeros((1, self.cfg.img_size, self.cfg.img_size, 3), jnp.float32)
            )
            self.logger.info("Loading native YOLOv10 checkpoint %s", path)
            return W.load_flax_checkpoint(path, template)
        self.logger.info("Converting YOLOv10 torch checkpoint %s", path)
        return W.convert_yolov10_state_dict(W.load_torch_state_dict(path))

    def _load_beit_weights(self, num_labels: int):
        path = getattr(self.cfg, "beit_weights", "") or ""
        if not path or not os.path.exists(path):
            return None

        key = (
            "beit", os.path.abspath(path), os.path.getmtime(path),
            self._beit_config(num_labels),
        )
        return _cached_device_weights(
            key, self._build_beit_weights, path, num_labels
        )

    def _build_beit_weights(self, path, num_labels: int):
        import dataclasses

        from tpu3dlm.models import weights as W

        cfg = self._beit_config(num_labels)
        if path.endswith(".msgpack"):
            import jax.numpy as jnp

            from tpu3dlm.models.beit import BeitClassifier

            # checkpoints are stored float regardless of beit_quant — load
            # against a float template, quantize after
            model = BeitClassifier(dataclasses.replace(cfg, quant="none"))
            template = W.init_template(
                model, jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
            )
            self.logger.info("Loading native BEiT checkpoint %s", path)
            variables = W.load_flax_checkpoint(path, template)
        else:
            self.logger.info("Converting BEiT torch checkpoint %s", path)
            variables = W.convert_beit_state_dict(W.load_torch_state_dict(path))
        if cfg.quant == "int8":
            self.logger.info("Quantizing BEiT weights to int8 (beit_quant)")
            variables = W.quantize_beit_variables(variables)
        return variables


def load_gold_std(pickle_path: str):
    """Reference task_def.py:200-209 semantics: None on missing/corrupt."""
    try:
        with open(pickle_path, "rb") as f:
            return pickle.load(f)
    except FileNotFoundError:
        logging.error(f"The file {pickle_path} was not found.")
        return None
    except (pickle.UnpicklingError, EOFError, AttributeError) as e:
        # EOFError: truncated file; AttributeError: pickle references a
        # class that moved — both are "corrupt" per the documented contract
        logging.error(f"Failed to unpickle the file {pickle_path}: {e}")
        return None


def setup_pipeline(data_folder, cfg, cfg_goldstd=None, goldstd_var=None) -> Pipeline:
    pipeline = Pipeline(data_folder, cfg, cfg_goldstd, goldstd_var)
    pipeline.run()
    return pipeline

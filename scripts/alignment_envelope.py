"""Alignment convergence-envelope sweep (VERDICT r4 task 7).

Sweeps the registration problem over the four axes that decide whether a
capture lands in the ICP basin — initial rotation (0-180°), overlap
fraction, outlier rate, point noise — on synthetic wall+signs scenes with
a known ground-truth transform, and reports:

  * per-cell success rate (rotation error < 5° AND translation error
    < 0.1 m against the known T⁻¹), for global_init in
    {centroid, pca, auto} — this is where the `auto` gate constants
    (alignment/align.py: PCA only when res < 0.7 x centroid AND angle >
    30°) stop being magic numbers: the sweep shows where centroid alone
    stops converging and whether auto tracks the better choice;
  * verdict quality (RegistrationVerdict): of the cells that FAILED the
    ground-truth check, what fraction the confidence gate flagged
    (catch rate), and of the cells that PASSED, what fraction it
    wrongly flagged (false-alarm rate) — the serving quarantine
    (pipeline/watch.SUSPECT_SENTINEL) is only as good as these two
    numbers.

Writes docs/ALIGNMENT_ENVELOPE.json and prints the success table.
Runs fine on CPU (~2000-pt clouds); pass --quick for the reduced sweep
the slow-tier test pins.

Usage:
    PYTHONPATH=.:/root/.axon_site python scripts/alignment_envelope.py \
        [--quick] [--out docs/ALIGNMENT_ENVELOPE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_scene(rng: np.random.Generator, n_wall: int = 3000):
    """Wall + three sign blocks + an off-plane ledge (so the scene is not
    degenerate-planar), plus the sign box records for the anchor term."""
    wall = np.stack([
        rng.uniform(-2.0, 2.5, n_wall),
        rng.uniform(-1.25, 1.25, n_wall),
        np.full(n_wall, 3.0) + rng.normal(0, 0.002, n_wall),
    ], axis=1)
    cents = [(-0.4, -0.15, 2.8), (0.55, -0.25, 2.85), (1.45, 0.3, 2.8)]
    labels = [0, 1, 0]
    signs = []
    for c in cents:
        m = 400
        signs.append(np.stack([
            rng.uniform(c[0] - 0.2, c[0] + 0.2, m),
            rng.uniform(c[1] - 0.2, c[1] + 0.2, m),
            np.full(m, c[2]) + rng.normal(0, 0.002, m),
        ], axis=1))
    ledge = np.stack([
        rng.uniform(-2.0, 2.5, 600),
        np.full(600, -1.25) + rng.normal(0, 0.002, 600),
        rng.uniform(2.5, 3.0, 600),
    ], axis=1)
    cloud = np.concatenate([wall] + signs + [ledge]).astype(np.float32)

    boxes = {0: []}
    for c, lab in zip(cents, labels):
        c = np.asarray(c, np.float32)
        corners = [c + [-0.2, -0.2, 0], c + [-0.2, 0.2, 0],
                   c + [0.2, 0.2, 0], c + [0.2, -0.2, 0]]
        boxes[0].append([np.asarray(x, np.float32) for x in corners]
                        + [0, 0.9, lab])
    return cloud, boxes, cents, labels


def _rot_z(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def perturb(cloud, boxes, rng, rot_deg, overlap, outlier_rate, noise_m):
    """Build the comparison capture: crop to the overlap fraction (by x),
    add noise + uniform-box outliers, move world by T = rot_z + offset.
    Returns (comp_cloud, comp_boxes, T)."""
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = _rot_z(np.radians(rot_deg))
    T[:3, 3] = [0.5, -0.3, 0.15]

    x_lo = np.quantile(cloud[:, 0], 1.0 - overlap)
    keep = cloud[:, 0] >= x_lo
    comp = cloud[keep]
    if noise_m > 0:
        comp = comp + rng.normal(0, noise_m, comp.shape)
    if outlier_rate > 0:
        n_out = int(len(comp) * outlier_rate)
        lo, hi = comp.min(0) - 0.5, comp.max(0) + 0.5
        comp = np.concatenate([comp, rng.uniform(lo, hi, (n_out, 3))])
    comp = (comp @ T[:3, :3].T + T[:3, 3]).astype(np.float32)

    comp_boxes = {0: []}
    for row in boxes[0]:
        c = np.stack(row[:4]).mean(0)
        if c[0] < x_lo:  # sign left outside the captured region
            continue
        corners = [(np.asarray(x) @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
                   for x in row[:4]]
        comp_boxes[0].append(corners + row[4:])
    return comp, comp_boxes, T


def run_cell(cloud, boxes, rng, rot_deg, overlap, outlier_rate, noise_m,
             global_init):
    from tpu3dlm.alignment import Alignment

    comp, comp_boxes, T = perturb(
        cloud, boxes, rng, rot_deg, overlap, outlier_rate, noise_m
    )
    poses = np.zeros((2, 7), np.float32)
    poses[:, 6] = 1.0
    a = Alignment(
        poses, poses, boxes, comp_boxes,
        base_cloud=cloud, comparison_cloud=comp,
        max_points=2048, icp_iterations=25,
        max_correspondence_dist=(1.0, 0.25, 0.1),
        global_init=global_init,
    )
    a.compare("cell")
    got = a.final_transform
    want = np.linalg.inv(T)
    R_err = got[:3, :3] @ want[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    t_err = float(np.linalg.norm(got[:3, 3] - want[:3, 3]))
    success = bool(ang < 5.0 and t_err < 0.1)
    v = a.last_verdict
    return {
        "success": success,
        "rot_err_deg": round(float(ang), 2),
        "t_err_m": round(t_err, 3),
        "flagged": bool(v is not None and not v.ok),
        "reasons": list(v.reasons) if v is not None else [],
        "inlier": round(v.inlier_frac, 3) if v else None,
        "rmse": round(v.rmse, 4) if v else None,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true",
                    help="reduced sweep (the slow-tier test pins this)")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "ALIGNMENT_ENVELOPE.json"))
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    if args.quick:
        rotations = [0, 45, 90, 150]
        overlaps = [1.0, 0.5]
        outliers = [0.0, 0.2]
        noises = [0.0, 0.01]
        inits = ["centroid", "auto"]
        seeds = 1
    else:
        rotations = [0, 15, 30, 45, 60, 90, 120, 150, 180]
        overlaps = [1.0, 0.7, 0.5, 0.3]
        outliers = [0.0, 0.1, 0.3]
        noises = [0.0, 0.005, 0.02]
        inits = ["centroid", "pca", "auto"]
        seeds = args.seeds

    t0 = time.time()
    cells = []
    # axis sweeps vary ONE axis off the nominal point (full overlap, no
    # outliers, 5 mm noise) — a full cross product is 9*4*3*3*3 ICP solves
    # per init and adds nothing the marginals don't show
    nominal = dict(overlap=1.0, outlier_rate=0.0, noise_m=0.005)
    sweep = []
    for r in rotations:
        sweep.append(dict(nominal, rot_deg=r))
    for o in overlaps[1:]:
        sweep.append(dict(nominal, rot_deg=30, overlap=o))
    for u in outliers[1:]:
        sweep.append(dict(nominal, rot_deg=30, outlier_rate=u))
    for z in noises:
        if z != 0.005:
            sweep.append(dict(nominal, rot_deg=30, noise_m=z))

    for cfg in sweep:
        for init in inits:
            for s in range(seeds):
                rng = np.random.default_rng(
                    np.random.SeedSequence([s, int(cfg["rot_deg"] * 10),
                                            int(cfg["overlap"] * 100),
                                            int(cfg["outlier_rate"] * 100),
                                            int(cfg["noise_m"] * 1e4)])
                )
                cloud, boxes, _, _ = make_scene(rng)
                res = run_cell(cloud, boxes, rng, global_init=init, **cfg)
                cells.append({**cfg, "init": init, "seed": s, **res})
                print(f"rot={cfg['rot_deg']:>3} ov={cfg['overlap']:.1f} "
                      f"out={cfg['outlier_rate']:.1f} nz={cfg['noise_m']:.3f} "
                      f"{init:>8} s{s}: "
                      f"{'OK ' if res['success'] else 'FAIL'} "
                      f"rot_err={res['rot_err_deg']:>6} "
                      f"flagged={res['flagged']} {res['reasons']}",
                      file=sys.stderr)

    # gate quality: catch rate on failures, false-alarm rate on successes
    fails = [c for c in cells if not c["success"]]
    passes = [c for c in cells if c["success"]]
    caught = sum(1 for c in fails if c["flagged"])
    false_alarm = sum(1 for c in passes if c["flagged"])
    report = {
        "metric": "alignment_convergence_envelope",
        "date": time.strftime("%Y-%m-%d"),
        "wall_seconds": round(time.time() - t0, 1),
        "quick": args.quick,
        "seeds": seeds,
        "cells": cells,
        "gate_quality": {
            "n_fail": len(fails),
            "n_pass": len(passes),
            "catch_rate": round(caught / len(fails), 3) if fails else None,
            "false_alarm_rate": round(false_alarm / len(passes), 3)
            if passes else None,
        },
        "auto_init_gate": {
            "ratio": 0.7, "angle_deg": 30.0,
            "derivation": "see docs/ALIGNMENT_ENVELOPE.md",
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report["gate_quality"]))


if __name__ == "__main__":
    main()

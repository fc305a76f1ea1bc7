"""Re-produce the fixture-scale hard-eval in CI (VERDICT r4 weak #5).

The accuracy gates used to be self-referential static checks: they read a
committed JSON against thresholds recorded in the same JSON, so a silent
model/codec regression passed until a human re-ran scripts/hard_eval.py.
This slow-tier test RE-RUNS the measurement — the committed fixture
checkpoint through the committed corpus code — and diffs each axis
against the committed artifact within a tolerance derived from the
artifact's own across-seed spread. A code change that actually degrades
fixture-scale accuracy (detector, codec, corpus generator, postprocess)
fails here without anyone re-running the script.

Cost: eval-only (no training) — 7 axes x 5 seeds x 14 frames of 128-px
detection; minutes on the CI CPU.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "docs", "ACCURACY_HARD_EVAL.json")
FIXTURE = os.path.join(REPO, "tests", "fixtures", "yolo_synthetic.msgpack")


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture ckpt absent")
def test_fixture_scale_hard_eval_reproduces(tmp_path):
    with open(ARTIFACT) as f:
        committed = json.load(f)
    assert committed["checkpoint"] == os.path.basename(FIXTURE), (
        "the committed artifact must measure the committed fixture "
        "checkpoint, else this reproduction proves nothing"
    )

    from tpu3dlm.pipeline.hardeval import run_hard_eval

    rep = run_hard_eval(
        FIXTURE, str(tmp_path),
        img_size=committed["img_size"], nc=2,
        conf=committed["conf_thresh"],
        num_frames=committed["num_frames"],
        seeds=tuple(committed["seeds"]),
    )

    for axis, want in committed["axes"].items():
        got = rep["axes"][axis]
        # the corpus is bit-deterministic per seed; the residual delta is
        # backend numerics (CI CPU vs the TPU that wrote the artifact)
        # moving borderline detections. Tolerate the larger of 0.06 and
        # the axis's own recorded seed spread — a real regression (the
        # round-4 collapse measured 0.3-0.8 drops) blows far past this.
        tol = max(0.06, want.get("map50_spread", 0.0))
        assert abs(got["map50"] - want["map50"]) <= tol, (
            axis, got["map50"], want["map50"], tol
        )
        assert got["n_gt"] == want["n_gt"], (
            "corpus drift: the seeded generator no longer reproduces the "
            "artifact's ground-truth volume", axis,
        )

"""Convergence-envelope edges (scripts/alignment_envelope.py): pins the
measured boundaries the `auto` global-init gate and the registration
verdict thresholds were derived from (docs/ALIGNMENT_ENVELOPE.md) — if a
solver/init change moves an edge, these fail before the docs go stale.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from alignment_envelope import make_scene, run_cell  # noqa: E402


def _cell(rot_deg, overlap, init, seed=0, outlier_rate=0.0, noise_m=0.005):
    rng = np.random.default_rng(np.random.SeedSequence([seed, rot_deg]))
    cloud, boxes, _, _ = make_scene(rng)
    return run_cell(
        cloud, boxes, rng, rot_deg=rot_deg, overlap=overlap,
        outlier_rate=outlier_rate, noise_m=noise_m, global_init=init,
    )


class TestEnvelopeEdges:
    def test_centroid_converges_small_rotation(self):
        assert _cell(30, 1.0, "centroid")["success"]

    def test_centroid_fails_out_of_basin(self):
        """90° is past the centroid-only basin — this is WHY the auto init
        exists; a centroid solve that suddenly converges here means the
        scene generator broke, not that ICP got better."""
        res = _cell(90, 1.0, "centroid")
        assert not res["success"]
        assert res["flagged"], res  # ...and the verdict must catch it

    def test_auto_recovers_out_of_basin(self):
        for rot in (90, 150):
            res = _cell(rot, 1.0, "auto")
            assert res["success"], (rot, res)
            assert not res["flagged"], (rot, res)

    def test_auto_tolerates_outliers(self):
        res = _cell(30, 1.0, "auto", outlier_rate=0.2)
        assert res["success"], res

    def test_half_overlap_centroid_fails_flagged(self):
        """Cropping to 50% shifts the centroid by construction — the
        translation lands ~1 m off and the box anchors catch it."""
        res = _cell(30, 0.5, "centroid")
        assert not res["success"]
        assert res["flagged"], res

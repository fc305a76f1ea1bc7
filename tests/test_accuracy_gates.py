"""The committed-artifact accuracy gates in bench_e2e must (a) pass on
the committed artifacts and (b) actually FAIL when an artifact drifts out
of its band — a gate that cannot fail is the round-3 saturation bug in a
new coat."""

from __future__ import annotations

import json

import pytest

import bench_e2e


class TestHardEvalGate:
    def test_committed_artifact_passes(self):
        rep = bench_e2e.check_hard_eval_report()
        assert rep["ok"] is True
        # the whole point: the committed flagship number sits BELOW ceiling
        assert rep["combined_map50"] < rep["gate"]["combined_map50_max"]
        assert rep["combined_map50"] > rep["gate"]["combined_map50_min"]

    @pytest.fixture()
    def patched_report(self, tmp_path, monkeypatch):
        with open(bench_e2e.HARD_EVAL_REPORT) as f:
            rep = json.load(f)

        def write(mutate):
            mutate(rep)
            p = tmp_path / "hard.json"
            p.write_text(json.dumps(rep))
            monkeypatch.setattr(bench_e2e, "HARD_EVAL_REPORT", str(p))
            return bench_e2e.check_hard_eval_report()

        return write

    def test_regression_below_floor_fails(self, patched_report, capsys):
        out = patched_report(
            lambda r: r["axes"]["combined"].__setitem__("map50", 0.2)
        )
        assert out["ok"] is False
        assert "SANITY FAILURE" in capsys.readouterr().err

    def test_saturation_at_ceiling_fails(self, patched_report):
        out = patched_report(
            lambda r: r["axes"]["combined"].__setitem__("map50", 1.0)
        )
        assert out["ok"] is False

    def test_single_axis_collapse_fails(self, patched_report):
        out = patched_report(
            lambda r: r["axes"]["occlusion"].__setitem__("map50", 0.0)
        )
        assert out["ok"] is False

    def test_placement_blowout_fails(self, patched_report):
        out = patched_report(
            lambda r: r["axes"]["depth_noise"].__setitem__(
                "worst_placement_m", 0.5
            )
        )
        assert out["ok"] is False


class TestFullScaleGate:
    def test_committed_artifact_passes(self):
        assert bench_e2e.check_full_scale_report()["ok"] is True

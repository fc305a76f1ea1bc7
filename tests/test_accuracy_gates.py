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


class TestStatisticalPower:
    """Round-5 artifact properties (VERDICT r4 task 2): the committed
    hard-eval must carry real statistical power — pooled GT volume and
    floors with margin >= 3x the measured across-seed noise."""

    def _rep(self):
        with open(bench_e2e.HARD_EVAL_REPORT) as f:
            return json.load(f)

    def test_gt_volume(self):
        rep = self._rep()
        for axis, e in rep["axes"].items():
            assert e["n_gt"] >= rep["gate"]["min_n_gt_per_axis"], axis

    def test_seed_spread_recorded(self):
        rep = self._rep()
        assert len(rep["seeds"]) >= 5
        for axis, e in rep["axes"].items():
            assert "map50_spread" in e and "map50_per_seed" in e, axis
            assert len(e["map50_per_seed"]) == len(rep["seeds"])

    def test_floor_margin_at_least_three_sigma(self):
        """floor <= mean - 3*std for every gated axis (and the combined
        floor), so one noisy seed cannot flip the gate."""
        rep = self._rep()
        for axis, floor in rep["gate"]["axis_map50_min"].items():
            e = rep["axes"][axis]
            assert e["map50"] - floor >= 3 * e["map50_std"], (
                axis, e["map50"], floor, e["map50_std"]
            )
        comb = rep["axes"]["combined"]
        assert comb["map50"] - rep["gate"]["combined_map50_min"] >= (
            3 * comb["map50_std"]
        )


class TestDamageEvalGate:
    def test_committed_artifact_passes(self):
        rep = bench_e2e.check_damage_eval_report()
        assert rep["ok"] is True

    def test_axis_collapse_fails(self, tmp_path, monkeypatch):
        with open(bench_e2e.DAMAGE_EVAL_REPORT) as f:
            rep = json.load(f)
        rep["axes"]["exposure"]["accuracy"] = 0.1
        p = tmp_path / "dmg.json"
        p.write_text(json.dumps(rep))
        out = bench_e2e.check_damage_eval_report(str(p))
        assert out["ok"] is False

    def test_pair_power_fails(self, tmp_path):
        with open(bench_e2e.DAMAGE_EVAL_REPORT) as f:
            rep = json.load(f)
        rep["axes"]["clean"]["n_pairs"] = 5
        p = tmp_path / "dmg.json"
        p.write_text(json.dumps(rep))
        assert bench_e2e.check_damage_eval_report(str(p))["ok"] is False

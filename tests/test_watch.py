"""ScanWatcher service-mode tests: discovery, quiescence, sentinels,
gold-std bootstrapping, failure quarantine (pipeline stubbed — the real
pipeline is covered by test_pipeline_e2e)."""

import json
import os

import pytest

from tpu3dlm.pipeline.watch import (
    DONE_SENTINEL,
    FAILED_SENTINEL,
    ScanWatcher,
    _folder_fingerprint,
)


def _make_capture(data_root: str, name: str) -> str:
    path = os.path.join(data_root, name)
    os.makedirs(os.path.join(path, "rtabmap_extract", "data_rgb"), exist_ok=True)
    with open(os.path.join(path, "poses.txt"), "w") as f:
        f.write("1.0 0 0 0 0 0 0 1 1\n")
    return path


class _FakePipeline:
    stage_times = {"detect": 0.1}
    data_to_save = {"predictions": {0: []}}


def _plant_gold_pickle(watcher):
    """Pre-create the gold pickle so _ensure_gold is a no-op and a stubbed
    setup_pipeline failure is attributed to the CAPTURE, not the gold
    bootstrap (gold failures defer instead of quarantining)."""
    os.makedirs(os.path.dirname(watcher.cfg_goldstd.pickle_path), exist_ok=True)
    with open(watcher.cfg_goldstd.pickle_path, "wb") as f:
        f.write(b"x")


@pytest.fixture
def watcher(tmp_path, monkeypatch):
    import tpu3dlm.pipeline.task as task

    calls = []

    def fake_setup(folder, cfg, cfg_goldstd=None, goldstd_var=None):
        calls.append(folder)
        os.makedirs(os.path.dirname(cfg.pickle_path), exist_ok=True)
        with open(cfg.pickle_path, "wb") as f:
            f.write(b"x")
        return _FakePipeline()

    monkeypatch.setattr(task, "setup_pipeline", fake_setup)
    monkeypatch.setattr(task, "load_gold_std", lambda p: {"stub": True})
    w = ScanWatcher(str(tmp_path / "variables.cfg"), poll_interval=0.01)
    w._calls = calls
    return w


class TestScanWatcher:
    def test_quiescence_two_poll_claim(self, watcher):
        """A fresh capture must survive TWO polls unchanged before it is
        claimed (in-progress uploads keep changing the fingerprint)."""
        _make_capture(watcher.data_root, "scan_a")
        assert watcher.run_once() == []  # first sight: fingerprint recorded
        assert watcher.run_once() == ["scan_a"]  # stable → processed

    def test_modified_folder_not_claimed(self, watcher):
        path = _make_capture(watcher.data_root, "scan_b")
        watcher.run_once()
        with open(os.path.join(path, "rtabmap_extract", "late.png"), "w") as f:
            f.write("more bytes")  # upload still in progress
        assert watcher.run_once() == []
        assert watcher.run_once() == ["scan_b"]  # quiescent again

    def test_done_sentinel_skips_and_records(self, watcher):
        path = _make_capture(watcher.data_root, "scan_c")
        watcher.run_once()
        watcher.run_once()
        rec = json.load(open(os.path.join(path, DONE_SENTINEL)))
        assert rec["folder"] == "scan_c"
        assert "wall_clock_s" in rec and "stage_times" in rec
        assert watcher.run_once() == []  # processed scans never rerun

    def test_gold_std_bootstrapped_first(self, watcher):
        """Maintenance scan with no gold pickle must run gold_std first
        (CLI mode-logic parity, reference task_def.py:218-249)."""
        _make_capture(watcher.data_root, "maint")
        watcher.run_once()
        watcher.run_once()
        assert watcher._calls == ["gold_std", "maint"]

    def test_failure_quarantined(self, watcher, monkeypatch):
        import tpu3dlm.pipeline.task as task

        def boom(folder, cfg, cfg_goldstd=None, goldstd_var=None):
            raise RuntimeError("corrupt capture")

        _plant_gold_pickle(watcher)
        monkeypatch.setattr(task, "setup_pipeline", boom)
        watcher.max_attempts = 1  # quarantine on first failure
        path = _make_capture(watcher.data_root, "scan_bad")
        watcher.run_once()
        assert watcher.run_once() == ["scan_bad"]  # claimed, then failed
        assert os.path.exists(os.path.join(path, FAILED_SENTINEL))
        assert "corrupt capture" in open(os.path.join(path, FAILED_SENTINEL)).read()
        assert watcher.run_once() == []  # quarantined, not retried

    def test_transient_failure_retried_before_quarantine(
        self, watcher, monkeypatch
    ):
        """A failing capture is retried with backoff (max_attempts) before
        the FAILED sentinel is written — a transient outage must not
        permanently drop a healthy capture."""
        import time as _time

        import tpu3dlm.pipeline.task as task

        boom_calls = []

        def boom(folder, cfg, cfg_goldstd=None, goldstd_var=None):
            boom_calls.append(folder)
            raise RuntimeError("tunnel blip")

        _plant_gold_pickle(watcher)
        monkeypatch.setattr(task, "setup_pipeline", boom)
        watcher.max_attempts = 2
        path = _make_capture(watcher.data_root, "scan_flaky")
        watcher.run_once()  # first sighting
        assert watcher.run_once() == []  # attempt 1 fails → no sentinel yet
        assert not os.path.exists(os.path.join(path, FAILED_SENTINEL))
        assert watcher.run_once() == []  # inside backoff window → skipped
        assert boom_calls == ["scan_flaky"]
        _time.sleep(watcher.poll_interval * 4 + 0.05)  # past the backoff
        assert watcher.run_once() == ["scan_flaky"]  # attempt 2 → quarantine
        assert os.path.exists(os.path.join(path, FAILED_SENTINEL))
        assert boom_calls == ["scan_flaky", "scan_flaky"]

    def test_transient_failure_recovers(self, watcher, monkeypatch):
        """A capture whose first attempt fails but whose retry succeeds is
        processed normally, with the attempt counter cleared."""
        import time as _time

        import tpu3dlm.pipeline.task as task

        real_setup = task.setup_pipeline
        state = {"failed": False}

        def flaky(folder, cfg, cfg_goldstd=None, goldstd_var=None):
            if not state["failed"]:
                state["failed"] = True
                raise RuntimeError("one-off blip")
            return real_setup(folder, cfg, cfg_goldstd, goldstd_var=goldstd_var)

        _plant_gold_pickle(watcher)
        monkeypatch.setattr(task, "setup_pipeline", flaky)
        path = _make_capture(watcher.data_root, "scan_recover")
        watcher.run_once()
        assert watcher.run_once() == []  # attempt 1 fails, backoff set
        _time.sleep(watcher.poll_interval * 4 + 0.05)
        assert watcher.run_once() == ["scan_recover"]
        assert os.path.exists(os.path.join(path, DONE_SENTINEL))
        assert not os.path.exists(os.path.join(path, FAILED_SENTINEL))
        assert "scan_recover" not in watcher._attempts

    def test_gold_failure_defers_maintenance_not_quarantines(
        self, watcher, monkeypatch
    ):
        """A failure loading the SHARED gold baseline must defer the
        maintenance capture (retry next cycle), never quarantine it — the
        capture itself is healthy."""
        import tpu3dlm.pipeline.task as task

        # gold pickle exists, but loading it fails (e.g. truncated write)
        os.makedirs(
            os.path.dirname(watcher.cfg_goldstd.pickle_path), exist_ok=True
        )
        with open(watcher.cfg_goldstd.pickle_path, "wb") as f:
            f.write(b"x")

        def bad_load(p):
            raise RuntimeError("gold pickle unreadable")

        monkeypatch.setattr(task, "load_gold_std", bad_load)
        path = _make_capture(watcher.data_root, "maint_ok")
        watcher.run_once()
        assert watcher.run_once() == []  # deferred — NOT quarantined
        assert not os.path.exists(os.path.join(path, FAILED_SENTINEL))
        assert "maint_ok" not in watcher._attempts
        # gold heals → the capture processes on the next cycle, unpenalised
        monkeypatch.setattr(task, "load_gold_std", lambda p: {"stub": True})
        assert watcher.run_once() == ["maint_ok"]
        assert os.path.exists(os.path.join(path, DONE_SENTINEL))

    def test_corrupt_gold_pickle_defers_not_done(self, watcher, monkeypatch):
        """load_gold_std swallows corruption into None (reference
        task_def.py:200-209 semantics). The watcher must treat that None
        as a gold-baseline failure and DEFER — processing with it would
        silently skip the comparison stage and stamp the capture DONE
        without the run's core deliverable."""
        import tpu3dlm.pipeline.task as task

        _plant_gold_pickle(watcher)
        monkeypatch.setattr(task, "load_gold_std", lambda p: None)
        path = _make_capture(watcher.data_root, "maint_x")
        watcher.run_once()
        assert watcher.run_once() == []  # deferred
        assert not os.path.exists(os.path.join(path, DONE_SENTINEL))
        assert not os.path.exists(os.path.join(path, FAILED_SENTINEL))
        # baseline heals (operator restores the pickle) → processes cleanly
        monkeypatch.setattr(task, "load_gold_std", lambda p: {"stub": True})
        assert watcher.run_once() == ["maint_x"]
        assert os.path.exists(os.path.join(path, DONE_SENTINEL))

    def test_quarantined_gold_warns_once_and_defers(self, watcher, caplog):
        """When the watched gold_std capture itself is quarantined, the
        service must say so LOUDLY (not just 'not processed yet') and keep
        deferring maintenance scans without quarantining them."""
        import logging

        gold = _make_capture(watcher.data_root, "gold_std")
        with open(os.path.join(gold, FAILED_SENTINEL), "w") as f:
            f.write("boom")
        path = _make_capture(watcher.data_root, "maint_late")
        watcher.run_once()
        with caplog.at_level(logging.WARNING, logger="tpu3dlm.pipeline.watch"):
            assert watcher.run_once() == []  # deferred
            assert watcher.run_once() == []  # still deferred, no re-warn
        warnings = [
            r for r in caplog.records if "QUARANTINED" in r.getMessage()
        ]
        assert len(warnings) == 1
        assert not os.path.exists(os.path.join(path, FAILED_SENTINEL))

    def test_max_scans_bounds_run(self, watcher):
        _make_capture(watcher.data_root, "s1")
        _make_capture(watcher.data_root, "s2")
        watcher.max_scans = 1
        watcher.run_once()
        watcher.run()  # must return (not loop forever) after 1 scan
        assert len(watcher.processed) == 1

    def test_fingerprint_tracks_content(self, tmp_path):
        p = _make_capture(str(tmp_path), "x")
        f1 = _folder_fingerprint(p)
        with open(os.path.join(p, "poses.txt"), "a") as f:
            f.write("2.0 0 0 0 0 0 0 1 2\n")
        assert _folder_fingerprint(p) != f1


class TestCLIWatch:
    def test_cli_watch_flag_runs_service(self, tmp_path, monkeypatch):
        """`tpu3dlm.cli --watch --max-scans N` enters serving mode and
        returns once N captures are processed."""
        import tpu3dlm.pipeline.task as task
        from tpu3dlm import cli

        def fake_setup(folder, cfg, cfg_goldstd=None, goldstd_var=None):
            os.makedirs(os.path.dirname(cfg.pickle_path), exist_ok=True)
            with open(cfg.pickle_path, "wb") as f:
                f.write(b"x")
            return _FakePipeline()

        monkeypatch.setattr(task, "setup_pipeline", fake_setup)
        monkeypatch.setattr(task, "load_gold_std", lambda p: {"stub": True})
        monkeypatch.chdir(tmp_path)

        cfg_path = str(tmp_path / "configs" / "variables.cfg")
        # pre-create the watcher to learn the data root, then plant a capture
        w = ScanWatcher(cfg_path, poll_interval=0.01)
        _make_capture(w.data_root, "scan_cli")

        cli.main([
            "--config", cfg_path, "--watch",
            "--poll-interval", "0.01", "--max-scans", "1",
        ])
        assert os.path.exists(
            os.path.join(w.data_root, "scan_cli", DONE_SENTINEL)
        )


class TestConcurrentWatcher:
    """concurrency > 1: captures run in worker threads so one capture's
    host work overlaps another's device compute (pipeline/watch.py)."""

    def _watcher(self, tmp_path, monkeypatch, setup, concurrency=2):
        import tpu3dlm.pipeline.task as task

        monkeypatch.setattr(task, "setup_pipeline", setup)
        monkeypatch.setattr(task, "load_gold_std", lambda p: {"stub": True})
        return ScanWatcher(
            str(tmp_path / "variables.cfg"),
            poll_interval=0.01,
            concurrency=concurrency,
        )

    @staticmethod
    def _ok_setup(calls=None):
        def setup(folder, cfg, cfg_goldstd=None, goldstd_var=None):
            if calls is not None:
                calls.append(folder)
            os.makedirs(os.path.dirname(cfg.pickle_path), exist_ok=True)
            with open(cfg.pickle_path, "wb") as f:
                f.write(b"x")
            return _FakePipeline()

        return setup

    def test_two_captures_overlap_and_complete(self, tmp_path, monkeypatch):
        """Both captures must be inside setup_pipeline at the SAME time (a
        serial watcher would deadlock the barrier) and both finish with
        DONE sentinels."""
        import threading

        barrier = threading.Barrier(2, timeout=10)
        inner = self._ok_setup()

        def setup(folder, cfg, cfg_goldstd=None, goldstd_var=None):
            barrier.wait()
            return inner(folder, cfg, cfg_goldstd, goldstd_var)

        w = self._watcher(tmp_path, monkeypatch, setup)
        _plant_gold_pickle(w)
        a = _make_capture(w.data_root, "scan_a")
        b = _make_capture(w.data_root, "scan_b")
        assert w.run_once() == []  # first sighting: fingerprints recorded
        assert w.run_once() == []  # quiescent → both submitted to workers
        assert sorted(w.drain()) == ["scan_a", "scan_b"]
        for path in (a, b):
            assert os.path.exists(os.path.join(path, DONE_SENTINEL))
        assert w.run_once() == []  # nothing reprocessed

    def test_gold_runs_alone_before_maintenance(self, tmp_path, monkeypatch):
        """gold_std is processed synchronously BEFORE any maintenance
        capture is dispatched — workers load its pickle as the baseline."""
        calls = []
        w = self._watcher(tmp_path, monkeypatch, self._ok_setup(calls))
        _make_capture(w.data_root, "gold_std")
        _make_capture(w.data_root, "maint_a")
        _make_capture(w.data_root, "maint_b")
        assert w.run_once() == []  # fingerprints
        done = w.run_once()  # gold synchronous; maintenance submitted
        assert done == ["gold_std"] and calls[0] == "gold_std"
        w.drain()
        assert sorted(calls[1:]) == ["maint_a", "maint_b"]
        for f in ("gold_std", "maint_a", "maint_b"):
            assert os.path.exists(
                os.path.join(w.data_root, f, DONE_SENTINEL)
            )

    def test_worker_failure_quarantined(self, tmp_path, monkeypatch):
        """A capture failing inside a worker thread still converges to the
        FAILED sentinel with the traceback."""

        def boom(folder, cfg, cfg_goldstd=None, goldstd_var=None):
            raise RuntimeError("bad capture")

        w = self._watcher(tmp_path, monkeypatch, boom)
        w.max_attempts = 1
        _plant_gold_pickle(w)
        path = _make_capture(w.data_root, "scan_bad")
        w.run_once()
        w.run_once()
        assert w.drain() == ["scan_bad"]  # claimed, then quarantined
        assert os.path.exists(os.path.join(path, FAILED_SENTINEL))
        assert "bad capture" in open(os.path.join(path, FAILED_SENTINEL)).read()
        assert w.run_once() == []  # quarantined, never resubmitted

    def test_stress_many_captures_mixed_outcomes(self, tmp_path, monkeypatch):
        """4 workers × 12 captures with interleaved failures: every capture
        converges to exactly one sentinel (DONE or FAILED), none is lost,
        none is processed twice."""
        import threading

        counts: dict[str, int] = {}
        lock = threading.Lock()

        def setup(folder, cfg, cfg_goldstd=None, goldstd_var=None):
            with lock:
                counts[folder] = counts.get(folder, 0) + 1
            if folder.endswith(("3", "7")):
                raise RuntimeError(f"{folder} corrupt")
            os.makedirs(os.path.dirname(cfg.pickle_path), exist_ok=True)
            with open(cfg.pickle_path, "wb") as f:
                f.write(b"x")
            return _FakePipeline()

        w = self._watcher(tmp_path, monkeypatch, setup, concurrency=4)
        w.max_attempts = 1  # quarantine on first failure
        names = [f"scan_{i:02d}" for i in range(12)]
        _plant_gold_pickle(w)
        for n in names:
            _make_capture(w.data_root, n)
        w.run_once()  # fingerprints
        for _ in range(20):
            w.run_once()
            w.drain()
            have = [
                n for n in names
                if os.path.exists(os.path.join(w.data_root, n, DONE_SENTINEL))
                or os.path.exists(os.path.join(w.data_root, n, FAILED_SENTINEL))
            ]
            if len(have) == len(names):
                break
        for n in names:
            done = os.path.exists(os.path.join(w.data_root, n, DONE_SENTINEL))
            failed = os.path.exists(
                os.path.join(w.data_root, n, FAILED_SENTINEL)
            )
            want_fail = n.endswith(("3", "7"))
            assert done != failed, n  # exactly one outcome
            assert failed == want_fail, n
            assert counts[n] == 1, n  # never processed twice
        assert sorted(w.processed) == [
            n for n in names if not n.endswith(("3", "7"))
        ]

    def test_concurrency_respects_max_scans(self, tmp_path, monkeypatch):
        """max_scans bounds submissions too: with 3 ready captures and
        max_scans=2, only 2 are ever dispatched; run() drains and exits."""
        calls = []
        w = self._watcher(tmp_path, monkeypatch, self._ok_setup(calls))
        w.max_scans = 2
        _plant_gold_pickle(w)
        for name in ("s1", "s2", "s3"):
            _make_capture(w.data_root, name)
        w.run()
        assert len(w.processed) == 2 and len(calls) == 2
        sentinels = [
            f for f in ("s1", "s2", "s3")
            if os.path.exists(os.path.join(w.data_root, f, DONE_SENTINEL))
        ]
        assert len(sentinels) == 2


class TestGoldBootstrapSafety:
    def test_maintenance_deferred_until_watched_gold_processed(self, watcher):
        """When the gold baseline must come from a WATCHED gold_std folder
        that isn't processed yet, maintenance captures defer (no sentinel,
        retried) instead of bootstrapping from a possibly half-uploaded
        gold folder; gold runs first once quiescent."""
        _make_capture(watcher.data_root, "maint")
        assert watcher.run_once() == []  # maint: first sighting
        _make_capture(watcher.data_root, "gold_std")  # gold lands later
        # maint is quiescent now, but gold (just seen) blocks it
        assert watcher.run_once() == []
        assert not os.path.exists(
            os.path.join(watcher.data_root, "maint", DONE_SENTINEL)
        )
        # next cycle: gold quiescent → gold first, then maint, same cycle
        assert watcher.run_once() == ["gold_std", "maint"]
        assert watcher._calls == ["gold_std", "maint"]
        for f in ("gold_std", "maint"):
            assert os.path.exists(
                os.path.join(watcher.data_root, f, DONE_SENTINEL)
            )


@pytest.mark.slow  # real pipeline (gold bootstrap + failing maintenance)
def test_corrupt_capture_quarantined_by_real_pipeline(tmp_path):
    """Integration of the adversarial-ingestion contract with serving: a
    capture whose calibration YAML is malformed raises the loud
    ValueError inside the REAL pipeline (the extract stage regenerates
    depth PNGs from the db, so calibration is the export defect that
    reaches load_scan), and the watcher quarantines that capture
    (sentinel carries the error) while the healthy gold capture
    completes — the service keeps running past a bad export."""
    import numpy as np  # noqa: F401 — make_project pulls synthetic deps

    from tpu3dlm.pipeline.evaluate import make_project
    from tpu3dlm.pipeline.watch import ScanWatcher

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    cfg_path, data_root, _, _ = make_project(
        str(tmp_path),
        os.path.join(fixtures, "yolo_synthetic.msgpack"),
        os.path.join(fixtures, "beit_synthetic.msgpack"),
        num_frames=4,
        cloud_points_per_m2=500,
    )
    calib = os.path.join(
        data_root, "maintenance", "rtabmap_extract", "calibration", "2.yaml"
    )
    with open(calib, "w") as f:
        f.write("image_width: 640\n# camera_matrix lost in export\n")

    w = ScanWatcher(cfg_path, poll_interval=0.01)
    w.max_attempts = 1  # quarantine on first failure
    failed = os.path.join(data_root, "maintenance", FAILED_SENTINEL)
    for _ in range(8):
        w.run_once()
        if os.path.exists(failed):
            break
    assert os.path.exists(
        os.path.join(data_root, "gold_std", DONE_SENTINEL)
    ), "healthy gold capture must complete"
    assert os.path.exists(failed), "corrupt capture must be quarantined"
    msg = open(failed).read()
    assert "camera_matrix" in msg and "2.yaml" in msg

"""Shortened serving soak (scripts/bench_serving.py --soak, VERDICT r4
task 8): the CI-scale version of the 300-capture endurance run — enough
captures to cross every cache's warm boundary several times, asserting
the same invariants (all healthy captures done, corrupt ones quarantined,
zero stage retraces after warmup, bounded RSS growth, no thread leak)."""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_short_soak(monkeypatch):
    import bench_serving

    monkeypatch.setattr(bench_serving, "LIGHT", True)
    out = bench_serving.soak_run(
        n_captures=24, concurrency=2, corrupt_every=8, unique=4,
        # per-100-captures slope amplifies one-off allocations ~8x at this
        # scale; the strict 40 MB bound belongs to the 300-capture run
        rss_slope_max=250.0,
    )
    assert out["sanity_ok"], out
    assert out["done"] == 21
    assert out["failed_quarantined"] == 3
    assert out["stage_retraces_after_warm"] == 0
    assert out["thread_delta"] == 0, out
    # fd_delta tolerance: the jax runtime may lazily open a couple of
    # device/event fds on first concurrent use; a LEAK would scale with
    # captures (24 here) and blow straight past this
    assert abs(out["fd_delta"]) <= 4, out

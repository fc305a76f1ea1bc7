"""Backend availability probe for benches and long-running entrypoints.

The remote TPU backend (axon tunnel) can go UNAVAILABLE for a while — init
hangs ~4 minutes and then errors (observed 2026-08-17), and a transient
outage can span several such cycles (round 2's driver bench hit one and
recorded a null artifact while the chip was healthy 40 minutes later).
These helpers therefore probe a tiny device op in a RETRY LOOP under a
generous total budget, and when the backend never comes back they emit a
JSON diagnostic that still carries the last committed good measurement
(``last_good``) so a null round is never evidence-free.

The probe runs in a daemon thread because a dispatch stuck inside the
runtime's C code cannot be cancelled from Python — on timeout the caller
must ``os._exit`` (the interpreter would otherwise wait on the thread).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time


def _tiny_op() -> None:
    """One device dispatch + host readback on the default backend."""
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros((4,)) + 1.0)


def probe_backend(deadline_s: float) -> float | None:
    """Dispatch a tiny op + host readback under ``deadline_s`` seconds.

    Returns the probe's wall-clock seconds on success, None on timeout
    (backend unavailable or pathologically slow). A healthy remote-TPU
    first dispatch takes up to ~2 min; pass a deadline with margin.
    """
    ok = threading.Event()

    def _probe():
        _tiny_op()
        ok.set()

    t0 = time.perf_counter()
    threading.Thread(target=_probe, daemon=True).start()
    if not ok.wait(deadline_s):
        return None
    return time.perf_counter() - t0


def probe_backend_retrying(
    budget_s: float, retry_wait_s: float = 30.0, _op=None
) -> tuple[float | None, int, str | None]:
    """Probe the backend repeatedly until success or ``budget_s`` expires.

    A single probe thread loops: dispatch the tiny op; on an ERROR (the
    observed outage mode — init hangs ~4 min, then raises) sleep
    ``retry_wait_s`` and try again. The main thread waits on the success
    event for the whole budget, which also covers the worst mode where a
    dispatch wedges inside C forever (no retry can help there; only the
    budget bounds it).

    Returns ``(seconds_to_success | None, attempts_started, last_error)``.
    ``_op`` is injectable for tests (default: real tiny-op readback).
    """
    op = _op or _tiny_op
    ok = threading.Event()
    state = {"attempts": 0, "last_error": None}
    stop = time.monotonic() + budget_s

    def _loop():
        while not ok.is_set() and time.monotonic() < stop:
            state["attempts"] += 1
            try:
                op()
                ok.set()
                return
            except Exception as e:  # noqa: BLE001 — any backend error retries
                state["last_error"] = f"{type(e).__name__}: {e}"
                time.sleep(min(retry_wait_s, max(0.0, stop - time.monotonic())))

    t0 = time.perf_counter()
    threading.Thread(target=_loop, daemon=True).start()
    if not ok.wait(budget_s):
        return None, state["attempts"], state["last_error"]
    return time.perf_counter() - t0, state["attempts"], state["last_error"]


def _last_good_path() -> str:
    """docs/last_good.json next to the repo checkout, overridable with
    ``TPU3DLM_LAST_GOOD_PATH`` (for pip-installed deployments, where the
    default would resolve into site-packages — see record_last_good's
    checkout guard)."""
    env = os.environ.get("TPU3DLM_LAST_GOOD_PATH")
    if env:
        return env
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "docs",
        "last_good.json",
    )


def load_last_good(metric: str) -> dict | None:
    """Committed last-known-good measurement for ``metric`` (or None)."""
    try:
        with open(_last_good_path()) as f:
            rec = json.load(f).get(metric)
        return rec if isinstance(rec, dict) else None
    except Exception:
        return None


def record_last_good(metric: str, value: float, unit: str) -> None:
    """Best-effort update of docs/last_good.json after a live accelerator
    measurement, so a later outage round still reports evidence. Only
    meaningful for non-CPU backends — callers gate on that."""
    path = _last_good_path()
    # Auto-write ONLY inside a repo checkout (or at an explicit override):
    # for a pip-installed package the default path resolves to a stray
    # site-packages/../docs/last_good.json, and a bench run must not mutate
    # the install tree as a side effect.
    if "TPU3DLM_LAST_GOOD_PATH" not in os.environ:
        root = os.path.dirname(os.path.dirname(path))
        if not (
            os.path.exists(os.path.join(root, "pyproject.toml"))
            or os.path.exists(os.path.join(root, ".git"))
        ):
            print(
                f"record_last_good: {path} is not inside a repo checkout; "
                "set TPU3DLM_LAST_GOOD_PATH to persist bench evidence",
                file=sys.stderr,
            )
            return
    try:
        stored = {}
        try:
            with open(path) as f:
                stored = json.load(f)
        except Exception:
            pass
        stored[metric] = {
            "value": round(float(value), 3),
            "unit": unit,
            "date": time.strftime("%Y-%m-%d"),
            "source": "bench run (docs/last_good.json auto-update)",
        }
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(stored, f, indent=1, sort_keys=True)
    except OSError:
        pass


def unavailable_record(
    metric: str,
    unit: str,
    budget_s: float,
    attempts: int,
    last_error: str | None,
) -> dict:
    """The bench-shaped JSON record for an exhausted probe budget: value
    null + diagnostic + the committed ``last_good`` measurement (if any)."""
    rec = {
        "metric": metric,
        "value": None,
        "unit": unit,
        "vs_baseline": None,
        "error": (
            f"backend unavailable: tiny-op probe failed for {budget_s:.0f}s "
            f"({attempts} attempt(s); last error: {last_error or 'probe hung'})"
        ),
    }
    lg = load_last_good(metric)
    if lg is not None:
        rec["last_good"] = lg
    return rec


def require_backend(
    metric: str, unit: str = "frames/s", _probe=None
) -> dict | None:
    """Bench guard: probe the backend with retries and hard-exit with a
    one-line JSON diagnostic (value null, ``error`` + ``last_good`` set)
    when it never comes back.

    Budget comes from ``BENCH_BACKEND_BUDGET`` (total seconds across all
    retries, default 1500 ≈ 25 min — sized so a transient outage like round
    2's does not null the round's artifact); ``BENCH_BACKEND_TIMEOUT=0``
    (the old single-probe knob) still skips the probe entirely.

    Returns None on success. ``_probe`` is injectable for tests — the
    normal path never returns on failure (``os._exit(2)``, because a probe
    thread stuck in C cannot be joined).
    """
    if float(os.environ.get("BENCH_BACKEND_TIMEOUT", "360")) <= 0:
        return None
    budget = float(os.environ.get("BENCH_BACKEND_BUDGET", "1500"))
    retry_wait = float(os.environ.get("BENCH_BACKEND_RETRY_WAIT", "30"))
    probe = _probe or probe_backend_retrying
    took, attempts, last_error = probe(budget, retry_wait)
    if took is None:
        rec = unavailable_record(metric, unit, budget, attempts, last_error)
        print(json.dumps(rec))
        sys.stdout.flush()
        if _probe is not None:
            return rec  # test path: report instead of killing the runner
        os._exit(2)  # the probe thread is stuck in C code — hard exit
    print(
        f"backend probe ok in {took:.1f}s ({attempts} attempt(s))",
        file=sys.stderr,
    )
    return None


def host_fingerprint() -> str:
    """Short hash of the host ISA surface (machine arch + CPU feature
    flags). XLA:CPU AOT blobs encode CPU features of the COMPILING machine
    and reload blindly — a persistent cache shared across heterogeneous
    hosts can serve a blob whose ISA the current CPU lacks (SIGILL risk;
    observed as `cpu_aot_loader` "+prefer-no-gather not supported" errors
    in MULTICHIP_r02). Keying the cache dir by this fingerprint makes each
    host population its own cache."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256(f"{platform.machine()}|{feats}".encode()).hexdigest()[:10]
    return f"{platform.machine()}-{h}"


def ephemeral_compile_cache(prefix: str = "tpu3dlm_ephemeral_cache_") -> None:
    """Point the compile cache at a FRESH per-run directory, so no AOT
    blob is ever *loaded*. XLA:CPU AOT blobs record CPU-tuning flags as
    required target features and log `cpu_aot_loader` "machine mismatch …
    SIGILL" walls even on a same-host reload (see host_fingerprint) — the
    dryrun's CPU phase uses this policy (__graft_entry__), and bench.py
    applies it around its forced-CPU baseline leg so the driver artifact's
    tail stays the result line. Pair with ``enable_compile_cache()`` to
    restore the persistent cache afterwards."""
    import tempfile

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", tempfile.mkdtemp(prefix=prefix)
        )
    except Exception:
        pass


def enable_compile_cache(default_dir: str = "/tmp/tpu3dlm_jax_cache") -> None:
    """Point JAX's persistent compilation cache at ``JAX_CACHE_DIR`` (or
    the default), suffixed with a host fingerprint subdirectory. One home
    for the policy every bench/entrypoint shares — remote-TPU compiles
    cost minutes, so all of them opt in; the fingerprint keeps XLA:CPU AOT
    blobs from crossing between machines with different ISA features (see
    ``host_fingerprint``). Safe to call any time before the first compile;
    swallows config errors (older jax or already-frozen config) exactly
    like the inline blocks it replaces.
    """
    import jax

    cache_dir = os.path.join(
        os.environ.get("JAX_CACHE_DIR", default_dir), host_fingerprint()
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

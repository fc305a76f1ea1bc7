"""Continuous serving mode: watch a data root, process scans as they land.

The reference is strictly one-shot (`run.sh` → task_def.py → exit,
README.md "Run the pipeline"); a deployed maintenance system receives
captures continuously. `ScanWatcher` turns the same pipeline into a
long-running service:

- polls the data root for scan folders (a folder is a capture when it
  contains ``poses.txt`` + an ``rtabmap_extract`` tree);
- waits for QUIESCENCE before touching a folder — an upload in progress
  keeps changing mtimes/file counts, so a capture is only claimed after
  its fingerprint is stable across two polls (no half-ingested scans);
- runs ``gold_std`` first if its pickle is missing (same mode logic as
  the CLI, cli.py / reference task_def.py:218-249), then each new folder
  as a maintenance check against it;
- marks completion with a ``.tpu3dlm_done`` sentinel (JSON: wall-clock,
  per-stage times, missing count) so restarts skip processed scans and
  operators get a per-scan record;
- failures RETRY with exponential backoff (``max_attempts``, default 3)
  before being quarantined with ``.tpu3dlm_failed`` + the traceback
  (reference-parity loud-ingest semantics, tests/test_failure_handling)
  instead of wedging the service loop — so a transient outage (device
  tunnel blip, NFS hiccup) doesn't permanently drop a healthy capture,
  while a genuinely corrupt one converges to quarantine;
- failures of the SHARED gold baseline (bootstrap error, gold pickle
  unreadable) are never blamed on the maintenance capture being
  processed: the capture is deferred and retried next cycle, unpenalised;
- captures whose registration flunks the confidence gate
  (alignment/align.RegistrationVerdict: low overlap, out-of-basin/flipped
  transform, degenerate geometry) are quarantined with
  ``.tpu3dlm_alignment_suspect`` + the verdict JSON — their comparison
  CSV exists but is flagged, so a bad registration can never silently
  publish false MISSING rows.

TPU-native payoff: every scan reuses the SAME compiled stage programs and
device-resident weights (utils/jitcache + task._cached_device_weights) —
including captures of DIFFERENT sizes: every per-capture axis (frame
count, box count, cloud size) is bucket-padded (utils/shapes,
ops/icp.pad_target_bucket), so steady-state per-scan cost is data +
compute only and the service pays tracing/compile/upload once per bucket
(measured: two-scan e2e 0.616 s warm vs ~2 min cold incl. compile;
zero-retrace pinned in tests/test_serving_shapes.py; PERF.md "Serving
shape stability").
"""

from __future__ import annotations

import json
import logging
import os
import time
import traceback

DONE_SENTINEL = ".tpu3dlm_done"
FAILED_SENTINEL = ".tpu3dlm_failed"
# registration-confidence quarantine (RegistrationVerdict, VERDICT r4 weak
# #4): the capture PROCESSED — but its alignment failed the confidence
# gate, so the comparison CSV's missing/damage rows are not trustworthy.
# Distinct from FAILED because retrying won't help (the verdict is
# deterministic for the capture) and an operator should review the capture
# (partial scan? wrong room? featureless geometry?) rather than the
# pipeline.
SUSPECT_SENTINEL = ".tpu3dlm_alignment_suspect"


def _folder_fingerprint(path: str) -> tuple:
    """(file count, total bytes, max mtime) over the capture tree — cheap
    stability probe for detecting in-progress uploads."""
    count, total, mtime = 0, 0, 0.0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                st = os.stat(os.path.join(root, f))
            except OSError:
                continue
            count += 1
            total += st.st_size
            mtime = max(mtime, st.st_mtime)
    return count, total, mtime


def _is_capture(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "poses.txt")) and os.path.isdir(
        os.path.join(path, "rtabmap_extract")
    )


class ScanWatcher:
    """Poll ``data_root`` and run the maintenance pipeline on new captures.

    Parameters
    ----------
    config_path: variables.cfg path (written with defaults if absent).
    poll_interval: seconds between directory scans.
    max_scans: stop after this many processed scans (None = run forever);
        the test harness and batch backfills use a bound.
    """

    def __init__(
        self,
        config_path: str,
        poll_interval: float = 5.0,
        max_scans: int | None = None,
        max_attempts: int = 3,
        concurrency: int = 1,
    ):
        from tpu3dlm.utils.config import ConfigLoader, write_default_config

        if not os.path.exists(config_path):
            write_default_config(config_path)
        self.config_path = config_path
        self.poll_interval = poll_interval
        self.max_scans = max_scans
        self.max_attempts = max(1, max_attempts)
        # concurrency > 1: process up to N captures in worker threads. One
        # capture's host work (PNG decode, matching, CSV/pickle writes)
        # overlaps another's device compute — the jax runtime serialises
        # device programs itself, stage programs and device weights are
        # shared through the locked utils/jitcache, and the gold-side
        # alignment caches are lock-guarded (alignment/align._CACHE_LOCK).
        self.concurrency = max(1, int(concurrency))
        self._pool = None
        self._inflight: dict = {}  # folder → Future
        self._loader = ConfigLoader
        self.cfg_goldstd = ConfigLoader(config_path, "gold_std")
        self.data_root = os.path.dirname(
            os.path.dirname(self.cfg_goldstd.pose_path)
        )
        self.logger = logging.getLogger(__name__)
        self._pending_fp: dict[str, tuple] = {}
        self._attempts: dict[str, int] = {}
        self._retry_after: dict[str, float] = {}
        self._warned_gold_failed = False
        self.processed: list[str] = []
        self.suspect: list[str] = []  # alignment-suspect quarantined

    # -- discovery ---------------------------------------------------------

    def _ready_folders(self) -> list[str]:
        """Capture folders that are complete, unprocessed, and quiescent."""
        ready = []
        if not os.path.isdir(self.data_root):
            return ready
        for name in sorted(os.listdir(self.data_root)):
            path = os.path.join(self.data_root, name)
            if not os.path.isdir(path) or not _is_capture(path):
                continue
            if (
                os.path.exists(os.path.join(path, DONE_SENTINEL))
                or os.path.exists(os.path.join(path, FAILED_SENTINEL))
                or os.path.exists(os.path.join(path, SUSPECT_SENTINEL))
            ):
                continue
            if name in self._inflight:
                continue  # already being processed by a worker
            if time.monotonic() < self._retry_after.get(name, 0.0):
                continue  # failed recently — backing off before the retry
            fp = _folder_fingerprint(path)
            if self._pending_fp.get(name) == fp:
                ready.append(name)
            self._pending_fp[name] = fp
        return ready

    # -- processing --------------------------------------------------------

    def _gold_pending(self) -> bool:
        """True when the gold baseline must come from a WATCHED gold_std
        capture folder that hasn't finished processing yet. Bootstrapping
        from a half-uploaded gold folder would bake a partial capture into
        the permanent baseline (the quiescence fingerprint protects
        discovered folders — this extends the same protection to the
        bootstrap path), so maintenance scans are deferred until the gold
        folder is claimed through normal quiescent discovery."""
        if os.path.exists(self.cfg_goldstd.pickle_path):
            return False
        gold_path = os.path.join(self.data_root, "gold_std")
        pending = os.path.isdir(gold_path) and _is_capture(gold_path) and not (
            os.path.exists(os.path.join(gold_path, DONE_SENTINEL))
        )
        if pending and os.path.exists(os.path.join(gold_path, FAILED_SENTINEL)):
            # gold itself is quarantined: nothing can proceed until an
            # operator fixes the capture and clears the sentinel. Without
            # this warning the service would defer every maintenance scan
            # forever with only a misleading "not processed yet" message.
            if not self._warned_gold_failed:
                self.logger.warning(
                    "gold_std capture is QUARANTINED (%s) — every "
                    "maintenance scan is deferred until the sentinel is "
                    "cleared and gold_std reprocesses",
                    os.path.join(gold_path, FAILED_SENTINEL),
                )
                self._warned_gold_failed = True
        else:
            self._warned_gold_failed = False
        return pending

    def _ensure_gold(self):
        """Bootstrap the gold baseline from the CONFIGURED gold data folder
        (CLI mode-logic parity, reference task_def.py:218-249) — only
        reached when gold data is external, i.e. not a watched capture
        folder (_gold_pending defers those until discovery claims them)."""
        from tpu3dlm.pipeline.task import setup_pipeline

        if not os.path.exists(self.cfg_goldstd.pickle_path):
            self.logger.info("gold_std pickle absent — running setup pipeline")
            setup_pipeline("gold_std", self.cfg_goldstd, None)

    def _process(self, folder: str) -> bool:
        """Run one capture; returns True when processed (sentinel written),
        False when deferred to a later cycle."""
        from tpu3dlm.pipeline.task import load_gold_std, setup_pipeline

        path = os.path.join(self.data_root, folder)
        t0 = time.perf_counter()
        goldstd_var = None
        if folder != "gold_std":
            if self._gold_pending():
                self.logger.info(
                    "scan %s deferred: gold_std capture not processed yet",
                    folder,
                )
                return False
            try:
                self._ensure_gold()
                goldstd_var = load_gold_std(self.cfg_goldstd.pickle_path)
                if goldstd_var is None:
                    # load_gold_std swallows corruption into None (reference
                    # task_def.py:200-209 semantics); running the capture
                    # anyway would SKIP the comparison stage and stamp it
                    # DONE without the pipeline's core deliverable
                    raise RuntimeError(
                        f"gold pickle {self.cfg_goldstd.pickle_path} exists "
                        "but is unreadable"
                    )
            except Exception:
                # the SHARED baseline failed, not this capture — deferring
                # (retry next cycle) instead of quarantining keeps a gold
                # bootstrap error or unreadable pickle from permanently
                # dropping every healthy maintenance scan
                self.logger.exception(
                    "gold baseline unavailable — scan %s deferred", folder
                )
                return False
        try:
            if folder == "gold_std":
                pipeline = setup_pipeline("gold_std", self.cfg_goldstd, None)
            else:
                cfg = self._loader(self.config_path, folder)
                pipeline = setup_pipeline(
                    folder, cfg, self.cfg_goldstd, goldstd_var=goldstd_var
                )
        except Exception:
            return self._record_failure(folder, path)
        self._attempts.pop(folder, None)
        self._retry_after.pop(folder, None)
        record = {
            "folder": folder,
            "wall_clock_s": round(time.perf_counter() - t0, 3),
            "stage_times": {
                k: round(v, 4) for k, v in pipeline.stage_times.items()
            },
            "frames": len(pipeline.data_to_save.get("predictions", {})),
        }
        rows = pipeline.data_to_save.get("comparison_rows")
        if rows is not None:  # maintenance runs carry the missing count
            record["missing"] = sum(
                1 for r in rows if r.get("status") == "missing"
            )
        verdict = pipeline.data_to_save.get("alignment_verdict")
        if verdict is not None and not verdict.get("ok", True):
            # registration-confidence quarantine: the pipeline ran, but the
            # alignment flunked the gate — its missing/damage report must
            # not be consumed as a finding. Sentinel carries the verdict so
            # an operator sees WHY (low overlap? flipped basin? degenerate
            # geometry?) without re-running anything.
            record["alignment_verdict"] = verdict
            try:
                with open(os.path.join(path, SUSPECT_SENTINEL), "w") as f:
                    json.dump(record, f, indent=1)
            except OSError:
                self.logger.exception(
                    "scan %s alignment-suspect but sentinel write failed",
                    folder,
                )
            self.suspect.append(folder)
            # counts as handled for max_scans bookkeeping (a sentinel was
            # written; the folder will never be rediscovered) — it is the
            # REPORT that is untrusted, not the service loop
            self.processed.append(folder)
            self.logger.warning(
                "scan %s QUARANTINED: alignment suspect (%s)",
                folder, ",".join(verdict.get("reasons", ())),
            )
            return True
        try:
            with open(os.path.join(path, DONE_SENTINEL), "w") as f:
                json.dump(record, f, indent=1)
        except OSError:
            # a failed sentinel write must not wedge the service loop; the
            # scan will reprocess after restart, which is safe (idempotent)
            self.logger.exception(
                "scan %s processed but DONE sentinel write failed", folder
            )
        self.processed.append(folder)
        self.logger.info(
            "scan %s done in %.2f s", folder, record["wall_clock_s"]
        )
        return True

    def _record_failure(self, folder: str, path: str) -> bool:
        """Handle a processing failure (called from an except block).

        Retries with exponential backoff up to ``max_attempts`` so a
        transient environment failure (device tunnel blip, NFS hiccup)
        doesn't permanently drop a healthy capture; only a capture that
        keeps failing is quarantined with the FAILED sentinel."""
        n = self._attempts.get(folder, 0) + 1
        self._attempts[folder] = n
        if n < self.max_attempts:
            delay = self.poll_interval * (2 ** n)
            self._retry_after[folder] = time.monotonic() + delay
            self.logger.exception(
                "scan %s failed (attempt %d/%d) — retrying in %.0f s",
                folder, n, self.max_attempts, delay,
            )
            return False
        try:
            with open(os.path.join(path, FAILED_SENTINEL), "w") as f:
                f.write(traceback.format_exc())
        except OSError:
            # the quarantine write itself failing (folder retracted by the
            # uploader, disk full) must not take down the service loop; the
            # in-memory backoff entry below still stops a hot retry spin
            self._retry_after[folder] = time.monotonic() + self.poll_interval * (
                2 ** n
            )
            self.logger.exception(
                "scan %s failed AND its FAILED sentinel could not be "
                "written — will re-attempt after backoff", folder,
            )
            return False
        self.logger.exception(
            "scan %s failed %d times — quarantined", folder, n
        )
        return True

    # -- loop --------------------------------------------------------------

    def _ensure_pool(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                self.concurrency, thread_name_prefix="tpu3dlm-scan"
            )

    def _harvest(self) -> list[str]:
        """Collect finished in-flight captures; returns the successful ones."""
        done = []
        for folder, fut in list(self._inflight.items()):
            if fut.done():
                del self._inflight[folder]
                if fut.result():
                    done.append(folder)
        return done

    def drain(self) -> list[str]:
        """Block until every in-flight capture finishes; returns the ones
        that completed successfully during the wait."""
        if self._inflight:
            from concurrent.futures import wait as _wait

            _wait(list(self._inflight.values()))
        return self._harvest()

    def run_once(self) -> list[str]:
        """One poll cycle; returns the folders that FINISHED this cycle.
        gold_std runs first when present — maintenance scans need its
        baseline. With ``concurrency > 1`` maintenance captures are
        dispatched to worker threads and may finish in a LATER cycle (the
        harvest at the top of each cycle reports them then)."""
        done = self._harvest() if self._inflight else []
        ready = sorted(self._ready_folders(), key=lambda f: f != "gold_std")
        if self.concurrency == 1:
            for folder in ready:
                if self._process(folder):
                    done.append(folder)
                if (
                    self.max_scans is not None
                    and len(self.processed) >= self.max_scans
                ):
                    break
            return done
        if ready and ready[0] == "gold_std":
            # gold runs ALONE and synchronously: its pickle must be complete
            # before any worker loads it as the comparison baseline, and
            # maintenance work already in flight (holding the previous
            # baseline) must finish first
            if self._inflight:
                return done
            if self._process("gold_std"):
                done.append("gold_std")
            ready = ready[1:]
        for folder in ready:
            if self.max_scans is not None and (
                len(self.processed) + len(self._inflight) >= self.max_scans
            ):
                break
            self._ensure_pool()
            self._inflight[folder] = self._pool.submit(self._process, folder)
        return done

    def run(self) -> None:
        self.logger.info(
            "watching %s every %.1f s (concurrency %d)",
            self.data_root, self.poll_interval, self.concurrency,
        )
        try:
            while True:
                self.run_once()
                if self.max_scans is not None:
                    if (
                        len(self.processed) + len(self._inflight)
                        >= self.max_scans
                    ):
                        self.drain()
                    if len(self.processed) >= self.max_scans:
                        return
                time.sleep(self.poll_interval)
        finally:
            self.close()

    def close(self) -> None:
        """Drain in-flight captures and release the worker pool — a
        bounded run must not leak its threads into the host process (the
        soak bench asserts thread_delta == 0 across a 300-capture run)."""
        self.drain()
        if self._pool is not None:
            self._pool.shutdown(wait=True)
            self._pool = None


def main(argv=None):
    import argparse

    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(
        description="Continuous maintenance service: process scans as they arrive."
    )
    ap.add_argument(
        "--config", type=str, default=os.path.join("configs", "variables.cfg")
    )
    ap.add_argument("--poll", type=float, default=5.0)
    ap.add_argument(
        "--max-scans", type=int, default=None,
        help="Exit after N scans (default: run forever).",
    )
    ap.add_argument(
        "--max-attempts", type=int, default=3,
        help="Failures tolerated per capture (with backoff) before quarantine.",
    )
    ap.add_argument(
        "--concurrency", type=int, default=1,
        help="Captures processed at once: one capture's host work overlaps "
        "another's device compute (gold_std always runs alone).",
    )
    args = ap.parse_args(argv)
    ScanWatcher(
        args.config, args.poll, args.max_scans, args.max_attempts,
        concurrency=args.concurrency,
    ).run()


if __name__ == "__main__":
    main()

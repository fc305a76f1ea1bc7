"""CLI entry — the reference's ``python3 task_def.py --data <folder>``.

Mode logic mirrors task_def.py:218-249: ``--data gold_std`` runs the setup
pipeline alone; any other folder first ensures the gold-standard pickle
exists (running its pipeline if not), loads it, then runs the maintenance
pipeline with alignment + comparison. ``--setup`` generates a synthetic scan
into the data folder (standing in for the snapshot-missing
src/common/data/setup.py, run.sh:16-18). ``--watch`` switches to the
continuous serving mode (pipeline/watch.ScanWatcher) the reference's
one-shot entry has no analogue for.
"""

from __future__ import annotations

import argparse
import logging
import os


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description="Processing Configuration")
    parser.add_argument("--data", type=str, default="gold_std", help="Data Folder Name.")
    parser.add_argument(
        "--config", type=str, default=None,
        help="Path to variables.cfg (default: <cwd>/configs/variables.cfg, "
        "auto-created if absent).",
    )
    parser.add_argument(
        "--setup", action="store_true",
        help="Generate a synthetic scan into the data folder before running.",
    )
    parser.add_argument(
        "--watch", action="store_true",
        help="Continuous serving mode: poll the data root and process new "
        "capture folders as they land (pipeline/watch.ScanWatcher).",
    )
    parser.add_argument(
        "--poll-interval", type=float, default=5.0,
        help="--watch: seconds between directory polls.",
    )
    parser.add_argument(
        "--max-scans", type=int, default=None,
        help="--watch: stop after N processed scans (default: run forever).",
    )
    parser.add_argument(
        "--watch-concurrency", type=int, default=1,
        help="--watch: captures processed at once (one capture's host work "
        "overlaps another's device compute; gold_std always runs alone).",
    )
    args = parser.parse_args(argv)

    from tpu3dlm.utils.config import ConfigLoader, write_default_config

    config_path = args.config or os.path.join("configs", "variables.cfg")
    if not os.path.exists(config_path):
        logging.info("No config at %s — writing defaults.", config_path)
        write_default_config(config_path)

    cfg = ConfigLoader(config_path, args.data)
    cfg_goldstd = ConfigLoader(config_path, "gold_std")

    if args.setup:
        from tpu3dlm.data.synthetic import generate_scan

        data_root = os.path.dirname(os.path.dirname(cfg.pose_path))
        logging.info("Generating synthetic scan under %s/%s", data_root, args.data)
        generate_scan(data_root, args.data)

    if args.watch:
        from tpu3dlm.pipeline.watch import ScanWatcher

        ScanWatcher(
            config_path,
            poll_interval=args.poll_interval,
            max_scans=args.max_scans,
            concurrency=args.watch_concurrency,
        ).run()
        return

    from tpu3dlm.pipeline.task import load_gold_std, setup_pipeline

    if args.data == "gold_std":
        setup_pipeline(args.data, cfg_goldstd, None)
    else:
        if not os.path.exists(cfg_goldstd.pickle_path):
            logging.info("Performing setup before maintenance check.")
            setup_pipeline("gold_std", cfg_goldstd, None)
        goldstd_var = load_gold_std(cfg_goldstd.pickle_path)
        if goldstd_var is None:
            # corrupt ≈ missing: a None baseline would silently skip the
            # comparison stage (the run's core deliverable) — rebuild the
            # gold pipeline from its data, exactly as the missing-pickle
            # path does, and fail loudly if it still cannot be read
            logging.error(
                "Gold-standard pickle %s is unreadable — rebuilding the "
                "gold baseline.", cfg_goldstd.pickle_path,
            )
            setup_pipeline("gold_std", cfg_goldstd, None)
            goldstd_var = load_gold_std(cfg_goldstd.pickle_path)
            if goldstd_var is None:
                raise RuntimeError(
                    f"gold pickle {cfg_goldstd.pickle_path} is unreadable even "
                    "after rebuilding the gold baseline"
                )
        logging.info("Fetched Gold-Std. Data.")
        logging.info("Executing maintenance check.")
        setup_pipeline(args.data, cfg, cfg_goldstd, goldstd_var=goldstd_var)


if __name__ == "__main__":
    main()

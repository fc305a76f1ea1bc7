#!/usr/bin/env bash
# Entry wrapper — parity with the reference run.sh (--data folder, --setup).
set -e

DATA="gold_std"
SETUP=""

while [[ $# -gt 0 ]]; do
    case "$1" in
        --data)  DATA="$2"; shift 2 ;;
        --setup) SETUP="--setup"; shift ;;
        *) echo "unknown arg: $1"; exit 1 ;;
    esac
done

python3 -m tpu3dlm.cli --data "$DATA" $SETUP

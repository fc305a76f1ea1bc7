#!/bin/bash
# Pending TPU work queue — run the moment the chip returns after an outage.
#
# Sequential (only ONE process may hold the TPU), generous timeouts (fresh
# bucket shapes recompile over the remote tunnel: minutes per program,
# persistent cache at /tmp/tpu3dlm_jax_cache), logs under /tmp/tpu_queue/.
# Waits for a running pytest (pid file) to finish first — CPU-heavy jobs
# skew TPU bench numbers on this 1-core host.
#
# Usage:  nohup bash scripts/tpu_pending.sh > /tmp/tpu_queue/driver.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR=/tmp/tpu3dlm_jax_cache
mkdir -p /tmp/tpu_queue

# let any running test suite finish (pid file written by the dev loop)
for _ in $(seq 1 240); do
  if [ -f /tmp/pytest.pid ] && kill -0 "$(cat /tmp/pytest.pid)" 2>/dev/null; then
    sleep 30
  else
    break
  fi
done

run() {
  local name="$1"; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout "$@" > "/tmp/tpu_queue/$name.log" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S) ==="
}

run bench_align   1800 python bench_align.py
run bench_e2e     1800 python bench_e2e.py
run bench_serving 1800 python scripts/bench_serving.py
run bench         1200 python bench.py
BENCH_VARIANT=s run bench_s 1800 python bench.py
BENCH_VARIANT=m run bench_m 1800 python bench.py
run probe_chanpad 1800 python scripts/probe_channel_pad.py
run nn_variants   1800 python scripts/bench_nn_variants.py

echo "=== queue done $(date +%H:%M:%S) ==="
for f in /tmp/tpu_queue/*.log; do
  echo "--- $f:"
  grep -E '^\{|probe ok|SANITY|warning' "$f" | tail -3
done

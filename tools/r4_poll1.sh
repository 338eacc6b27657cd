#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run the round-4 sweep.
# Designed to run as a detached background task. Logs to /tmp/r4_poll.log.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_poll.log
echo "poller start $(date)" >> "$LOG"
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1; then
    echo "tunnel UP $(date)" >> "$LOG"
    bash tools/r4_sweep1.sh >> "$LOG" 2>&1
    echo "sweep finished $(date)" >> "$LOG"
    exit 0
  fi
  echo "tunnel down $(date)" >> "$LOG"
  sleep 150
done

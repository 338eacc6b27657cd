#!/bin/bash
# Round-3 second sweep: the stages that crashed in sweep 1 (now fixed)
# plus the verlet step-gap probe. Appends to /tmp/r3_sweep2.log.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_sweep2.log
run() {
  echo "=== $* — $(date)" | tee -a "$LOG"
  timeout "$1" "${@:2}" 2>&1 | grep -v "WARNING:.*axon" | tee -a "$LOG"
}
run 900 python -u tools/r3_bf16.py golden
run 600 python -u tools/r3_gab.py
run 900 python -u tools/r3_vprobe.py
run 900 python -u tools/r3_eamc.py
run 1800 python -u tools/r3_domain.py
echo "=== sweep2 done $(date)" | tee -a "$LOG"

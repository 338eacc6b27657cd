#!/bin/bash
# Round-3 measurement sweep — run when the axon tunnel is back.
# Appends everything to /tmp/r3_sweep.log; each stage has its own
# timeout so one hang doesn't eat the session.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r3_sweep.log
run() {
  echo "=== $* — $(date)" | tee -a "$LOG"
  timeout "$1" "${@:2}" 2>&1 | grep -v "WARNING:.*axon" | tee -a "$LOG"
}
# value-ordered: if the tunnel dies mid-sweep, the headline snapshot
# and the biggest adoption decisions land first
run 600 python -u bench.py
run 900 python -u tools/r3_bf16.py golden
run 600 python -u tools/r3_gab.py
run 900 python -u tools/r3_derive16.py
run 900 python -u tools/r3_verlet.py rowlist
run 900 python -u tools/r3_eamc.py
run 900 python -u tools/r3_verlet.py eam eam_poly
run 1200 python -u tools/r3_domain.py
run 900 python -u tools/r3_scale.py
echo "=== sweep done $(date)" | tee -a "$LOG"

#!/bin/bash
# Round-4 batch 2: bucketed verlet step decomposition + domain engines
# after the lean-carry/thermo-gating fix.
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

for job in \
  "python tools/r4_vstep.py" \
  "python tools/r4_domain.py cluster" \
  "python tools/r4_domain.py verlet" \
; do
  echo "=== $job $(date) ==="
  timeout 1500 $job 2>&1 | grep -v "xla_bridge:905"
  echo "=== exit $? ==="
done

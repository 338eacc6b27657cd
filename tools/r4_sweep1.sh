#!/bin/bash
# Round-4 measurement batch: verlet reneighbor/rowbuild/step probes,
# domain mesh(1)@131k, headline variance. Run when the tunnel is up
# (tools/r4_poll1.sh polls and fires this). Logs go to the caller.
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

for job in \
  "python tools/r3_vreneigh.py" \
  "python tools/r3_vrows.py" \
  "python tools/r3_vprobe.py" \
  "python tools/r4_domain.py cluster" \
  "python tools/r4_domain.py verlet" \
  "python bench.py" \
; do
  echo "=== $job $(date) ==="
  timeout 1500 $job 2>&1 | grep -v "xla_bridge:905"
  echo "=== exit $? ==="
done

"""Dump the cluster-scheme nji (exact per-i-unit list length)
distribution at t=0 and after a heated run at the 131k benchmark
workload, then score bucket-planner variants offline.

    python tools/r3_nji.py [steps]

Writes /tmp/nji_cold.npy and /tmp/nji_hot.npy for offline planner
sweeps (tools/r3_bucketplan.py).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import ClusterSimulation

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    p = Params(precision="sp", ntimes=steps, dense_thermo=False)
    sim = ClusterSimulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st)
    if sim._calibrate_list_cap(st):
        st = sim.initial_state()
        jax.block_until_ready(st)
    cold = np.asarray(st.pairs.nji)
    print("caps: list_cap=%d icap=%d buckets=%s"
          % (sim.list_cap, sim.icap, sim.buckets))
    out = sim.run()
    hot = np.asarray(out.state.pairs.nji)
    np.save("/tmp/nji_cold.npy", cold)
    np.save("/tmp/nji_hot.npy", hot)
    for name, nji in (("cold", cold), ("hot", hot)):
        q = np.percentile(nji, [0, 30, 55, 75, 90, 98.5, 100])
        print("%s: n=%d sum=%d mean=%.1f q[0/30/55/75/90/98.5/100]=%s"
              % (name, nji.size, int(nji.sum()), nji.mean(),
                 np.round(q, 1).tolist()))
    # current planner's padded-slot total on each distribution
    from mdbench_tpu.ops.cluster import plan_capacity_buckets
    for name, nji in (("cold", cold), ("hot", hot)):
        plan = plan_capacity_buckets(nji, sim.icap, sim.ishare)
        if plan is None:
            print("%s: planner returned None" % name)
            continue
        sizes, caps = plan
        tot = sum(n * c for n, c in zip(sizes, caps))
        print("%s plan: sizes=%s caps=%s padded=%d (exact=%d, x%.2f)"
              % (name, sizes, caps, tot, int(nji.sum()),
                 tot / max(1, nji.sum())))


if __name__ == "__main__":
    main()

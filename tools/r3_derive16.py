"""Round-3 bf16-derive A/B on the real chip: time derive_ilists at the
131k workload in f32 vs bf16 (rigorous-superset inflated cutoff), and
report the list-inflation cost (extra nji -> extra padded force pairs).

    python tools/r3_derive16.py

Adopt derive_bf16=True in bench.py only if
  (saved derive ms) / reneigh_every > (extra padded pairs) * kernel ms/pair.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import timeit  # noqa: E402


def main():
    import jax
    import numpy as np

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import GROUP, ClusterSimulation
    from mdbench_tpu.ops.cluster import derive_ilists

    p = Params(precision="sp", dense_thermo=False)
    sim = ClusterSimulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st)
    if sim._calibrate_list_cap(st):
        st = sim.initial_state()
        jax.block_until_ready(st)

    nji = {}
    for bf16 in (False, True):
        def f(xc, _bf16=bf16):
            cl = st.clusters._replace(xc=xc)
            pr = derive_ilists(
                cl, st.pairs, sim.n_clusters_pad, GROUP,
                p.cutneigh, sim.icap, share=sim.ishare, bf16=_bf16,
            )
            return pr.nji
        ms = timeit(f, st.clusters.xc) * 1e3
        pr = derive_ilists(
            st.clusters, st.pairs, sim.n_clusters_pad, GROUP,
            p.cutneigh, sim.icap, share=sim.ishare, bf16=bf16,
        )
        nji[bf16] = np.asarray(pr.nji)
        print("derive %-5s: %.3f ms  nji sum=%d max=%d"
              % ("bf16" if bf16 else "f32", ms,
                 nji[bf16].sum(), nji[bf16].max()))
    extra = int(nji[True].sum() - nji[False].sum())
    print("bf16 keeps %+d list entries (%+.2f%%)"
          % (extra, 100.0 * extra / max(nji[False].sum(), 1)))

    # end-to-end check: full benchmark run with derive_bf16
    p2 = Params(precision="sp", dense_thermo=False, derive_bf16=True)
    sim2 = ClusterSimulation(p2)
    out = sim2.run()
    mups = 1e-6 * sim2.natoms * p2.ntimes / out.total_time
    print("bench w/ derive_bf16: %.1f M updates/s (temp[20]=%.6e)"
          % (mups, float(out.temps[p2.reneigh_every - 1])))


if __name__ == "__main__":
    main()

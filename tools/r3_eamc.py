"""Round-3 cluster-scheme EAM measurement on the real chip: the
two-pass polynomial Pallas path vs its fused-XLA twin at the 131k
default EAM workload (Cu_u3, cutoff 4.95, 60 steps).

    python tools/r3_eamc.py [variant ...]

Variants: pallas xla (default: both). Prints headline M updates/s and
the force/reneighbor phase split (chained in-dispatch, tunnel-safe).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import timeit  # noqa: E402

# DP golden temperature trace for THIS workload, from running the
# compiled C reference (oracle, no code copied):
#   cd /tmp/mdb && echo "nstat 10" > nstat10.conf
#   ./MDBench-VL-GCC-X86-DP -p nstat10.conf -f eam -e data/Cu_u3.eam -n 60
# (C reference wall time: 12.86 s = 0.61 M updates/s on the host CPU)
GOLDEN_EAM_131K = {20: 5.008906e02, 40: 2.747772e02, 60: 1.330268e02}
GOLDEN_TOL = {20: 2e-3, 40: 1e-2, 60: 3e-2}  # SP + poly-fit drift


def check_golden(name, temps):
    ok = True
    for step, t_gold in GOLDEN_EAM_131K.items():
        rel = abs(float(temps[step - 1]) - t_gold) / t_gold
        if rel > GOLDEN_TOL[step]:
            print("%-10s GOLDEN FAIL step %d: %.6e vs %.6e (rel %.2e)"
                  % (name, step, float(temps[step - 1]), t_gold, rel))
            ok = False
    print("%-10s golden gate: %s" % (name, "PASS" if ok else "FAIL"))


def run_variant(name, kernel, ishare=0):
    import jax

    from mdbench_tpu.config import FF_EAM, Params
    from mdbench_tpu.engine_cluster import ClusterSimulation

    p = Params(
        precision="sp", scheme="cluster", dense_thermo=False,
        force_field=FF_EAM, eam_file="/root/reference/data/Cu_u3.eam",
        ntimes=60, kernel=kernel, ishare=ishare,
    )
    sim = ClusterSimulation(p)
    out = sim.run()
    mups = 1e-6 * sim.natoms * p.ntimes / out.total_time
    print(
        "%-10s natoms=%d ntimes=%d total=%.3f s  -> %.1f M updates/s"
        % (name, sim.natoms, p.ntimes, out.total_time, mups)
    )
    re = p.reneigh_every
    print(
        "%-10s temp[re-bound]=%.6e icap=%d list_cap=%d share=%d"
        % (name, float(out.temps[re - 1]), sim.icap, sim.list_cap,
           sim.ishare)
    )
    check_golden(name, out.temps)

    st = sim.initial_state()
    jax.block_until_ready(st)

    def f_force(xc):
        cl = st.clusters._replace(xc=xc)
        fx, fy, fz = sim._force_from(cl, st.pairs, st.halo)
        return fx + fy + fz

    print("%-10s force      : %.3f ms"
          % (name, timeit(f_force, st.clusters.xc) * 1e3))

    def f_reneigh(x_flat):
        _cl, _v, _h, pairs, _o = sim._reneighbor_from_flat(
            x_flat, sim.v_flat0
        )
        return x_flat[:8, 0] + pairs.nji[:8].astype(x_flat.dtype)

    print("%-10s reneighbor : %.3f ms"
          % (name, timeit(f_reneigh, sim.x_flat0) * 1e3))


def main():
    # share4: EAM pays the issue-bound row gather TWICE per step (48-wide
    # coords + 64-wide [x|y|z|fp]), so wider list sharing (quarter the
    # gather rows for ~+40% padded pairs) may win here even though
    # share=2 won for LJ.
    which = sys.argv[1:] or ["pallas", "xla", "share4"]
    for name in which:
        if name == "share4":
            run_variant("share4", "ilist_pl", ishare=4)
        else:
            run_variant(name, {"pallas": "ilist_pl", "xla": "ilist"}[name])


if __name__ == "__main__":
    main()

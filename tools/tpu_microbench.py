"""One-shot TPU measurement session for the round-2 perf decisions
(PERF.md measurement queue). Run on the real chip:

    python tools/tpu_microbench.py [--quick]

Prints a labelled line per measurement. Every timed region ends with a
scalar host fetch (tunnel-safe fence) and is measured on the SECOND
call (first call pays server-side warm-up).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_RTT = None


def fence(a):
    import jax.numpy as jnp

    return float(jnp.ravel(a)[0])


def tunnel_rtt():
    """Measured cost of one null dispatch + scalar fetch (the axon tunnel
    adds ~25-30 ms per dispatch; every chained measurement subtracts it)."""
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def nf(a):
            return a + 1.0

        a = jnp.zeros((8, 128), jnp.float32)
        fence(nf(a))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            fence(nf(a))
            best = min(best, time.perf_counter() - t0)
        _RTT = best
        print("TUNNEL rtt   : %.3f ms" % (_RTT * 1e3))
    return _RTT


def timeit(fn, *args, reps=24, outer=3):
    """Per-call seconds of fn(*args), with `reps` calls CHAINED inside one
    jit dispatch (data dependence via a 1e-30 result feedback into the
    first argument) — single-dispatch timing through the tunnel measures
    only the ~30 ms round trip. The measured null RTT is subtracted."""
    import jax

    @jax.jit
    def chained(x0, *rest):
        def body(x, _):
            r = fn(x, *rest)
            r0 = r[0] if isinstance(r, (tuple, list)) else r
            return x + 1e-30 * r0.ravel()[0].astype(x.dtype), ()

        x, _ = jax.lax.scan(body, x0, None, length=reps)
        return x

    r = chained(*args)
    jax.block_until_ready(r)
    fence(r)
    rtt = tunnel_rtt()
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        fence(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 0.0) / reps


def gather_rates():
    """XLA row-gather rate vs row count and width — decides group-shared
    vs per-i-cluster dense lists (PERF.md queue item c)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    for nrows_src, n_idx, width in [
        (13000, 131_072, 48),
        (13000, 262_144, 48),
        (13000, 131_072, 64),
        (26000, 131_072, 16),
        (13000, 524_288, 48),
    ]:
        src = jnp.asarray(np.random.rand(nrows_src, width), jnp.float32)
        idx = jnp.asarray(
            np.random.randint(0, nrows_src, n_idx, dtype=np.int32)
        )

        @jax.jit
        def g(src, idx):
            return src[idx]

        t = timeit(g, src, idx)
        print(
            "GATHER rows=%d width=%d: %.3f ms = %.0f M rows/s, %.1f GB/s"
            % (n_idx, width, t * 1e3, n_idx / t / 1e6,
               n_idx * width * 4 / t / 1e9)
        )


def kernel_ab(quick=False):
    """Force-kernel A/B at the 131k benchmark workload. All coordinate
    planes ride through timeit as jit ARGUMENTS (closing over them lets
    XLA constant-fold two of the three plane gathers and part of the
    distance math — the round-1 standalone numbers did exactly that)."""
    import jax
    import jax.numpy as jnp

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import GROUP, ClusterSimulation
    from mdbench_tpu.ops.pallas.lj_cluster import (
        lj_cluster_force_pallas_stream,
        lj_cluster_force_xla,
        lj_cluster_force_xla_ilist,
        repack_jtiles,
    )

    p = Params(precision="sp", kernel="ilist", dense_thermo=False)
    sim = ClusterSimulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st)
    if sim._calibrate_list_cap(st):  # measure at benchmark capacities
        st = sim.initial_state()
        jax.block_until_ready(st)
    cl, pairs = st.clusters, st.pairs
    cutsq = p.cutforce**2
    npad = sim.n_clusters_pad
    print("CAPS list_cap=%d icap=%d npad=%d"
          % (sim.list_cap, sim.icap, npad))

    def f_ilist(xc, yc, zc):
        return lj_cluster_force_xla_ilist(
            xc, yc, zc, pairs.ijlist, npad, cutsq, p.sigma6, p.epsilon,
            share=sim.ishare)

    def f_ilist_pl(xc, yc, zc):
        from mdbench_tpu.ops.pallas.lj_cluster import (
            lj_cluster_force_ilist_pallas,
        )
        return lj_cluster_force_ilist_pallas(
            xc, yc, zc, pairs.ijlist, npad, cutsq, p.sigma6, p.epsilon,
            share=sim.ishare)

    # the windowed-kernel twins need real tile ranges, which the ilist
    # engine no longer builds (need_ranges=False) — use an xla-kernel
    # sim's pairs for them
    p2 = Params(precision="sp", kernel="xla", dense_thermo=False)
    sim2 = ClusterSimulation(p2)
    st2 = sim2.initial_state()
    jax.block_until_ready(st2)
    pairs2 = st2.pairs

    def f_xla(xc, yc, zc):
        return lj_cluster_force_xla(
            xc, yc, zc, pairs2.jlist, npad, GROUP, cutsq, p.sigma6,
            p.epsilon)

    def f_stream(xc, yc, zc):
        return lj_cluster_force_pallas_stream(
            xc, yc, zc, pairs2.jlist, pairs2.ranges, npad, GROUP, cutsq,
            p.sigma6, p.epsilon)

    def f_repack(xc, yc, zc):
        return repack_jtiles(xc, yc, zc, pairs2.jlist)

    def f_half(xc, yc, zc):
        from mdbench_tpu.ops.pallas.lj_cluster import (
            lj_cluster_force_xla_half,
        )
        # half-list semantics just gate pairs; timing the full list
        # through the half kernel measures the same op mix the engine
        # runs with half_neigh=1 (list contents don't change op counts)
        return lj_cluster_force_xla_half(
            xc, yc, zc, pairs2.jlist, npad, GROUP, cutsq, p.sigma6,
            p.epsilon)

    args = (cl.xc, cl.yc, cl.zc)
    print("FORCE ilist  : %.3f ms (%.0fM padded pairs)"
          % (timeit(f_ilist, *args) * 1e3, npad * 8 * sim.icap * 16 / 1e6))
    print("FORCE ilistpl: %.3f ms" % (timeit(f_ilist_pl, *args) * 1e3))
    if not quick:
        print("FORCE xla    : %.3f ms (%.0fM padded pairs)"
              % (timeit(f_xla, *args) * 1e3,
                 npad * 8 * sim.list_cap * 16 / 1e6))
        print("FORCE stream : %.3f ms" % (timeit(f_stream, *args) * 1e3))
        print("REPACK gather: %.3f ms" % (timeit(f_repack, *args) * 1e3))
        for name, fn in (("xla_half", f_half),):
            try:
                t = timeit(fn, *args)
                print("FORCE %-8s: %.3f ms" % (name, t * 1e3))
            except Exception as e:
                print("FORCE %-8s: FAILED (%s)"
                      % (name, str(e).splitlines()[0][:100]))

    # reneighbor decomposition: time each device phase standalone
    from mdbench_tpu.ops.cluster import (
        bin_clusters, build_cluster_pairs, build_clusters, derive_ilists,
        make_j16_bboxes, setup_cluster_pbc, update_cluster_pbc,
    )

    def ph_build(x_flat):
        c, _ = build_clusters(sim.grid, x_flat, sim.nlocal,
                              sim.n_clusters_pad, sim.ghost_cap, GROUP)
        return c.xc

    def ph_pbc(x_flat):
        c, _ = build_clusters(sim.grid, x_flat, sim.nlocal,
                              sim.n_clusters_pad, sim.ghost_cap, GROUP)
        h = setup_cluster_pbc(c, npad, npad, sim.ghost_cap, sim.prd,
                              (1, 1, 1), p.cutneigh)
        c = update_cluster_pbc(c, h, npad, True)
        return c.xc

    cl_full = cl  # post-reneighbor clusters (ghosts valid)

    def ph_bin(xc, yc, zc):
        c = cl_full._replace(xc=xc, yc=yc, zc=zc)
        bb16 = make_j16_bboxes(c.bbox)
        cells, bbc, _ = bin_clusters(sim.grid, bb16)
        return cells

    def ph_pairs(xc, yc, zc):
        c = cl_full._replace(xc=xc, yc=yc, zc=zc)
        pr = build_cluster_pairs(sim.grid,
                                 *_bin(sim, c), c.bbox, npad, GROUP,
                                 sim.list_cap)
        return pr.jlist

    def _bin(sim, c):
        bb16 = make_j16_bboxes(c.bbox)
        cells, bbc, _ = bin_clusters(sim.grid, bb16)
        return cells, bbc

    def ph_derive(xc, yc, zc):
        c = cl_full._replace(xc=xc, yc=yc, zc=zc)
        pr = derive_ilists(c, pairs, npad, GROUP, p.cutneigh, sim.icap,
                           share=sim.ishare)
        return pr.ijlist

    print("NEIGH build_clusters : %.3f ms" % (timeit(ph_build, sim.x_flat0) * 1e3))
    print("NEIGH +pbc setup     : %.3f ms" % (timeit(ph_pbc, sim.x_flat0) * 1e3))
    print("NEIGH bin_clusters   : %.3f ms" % (timeit(ph_bin, *args) * 1e3))
    print("NEIGH +build_pairs   : %.3f ms" % (timeit(ph_pairs, *args) * 1e3))
    print("NEIGH derive_ilists  : %.3f ms" % (timeit(ph_derive, *args) * 1e3))

    # plain-step total (integrate + ghost refresh + force + integrate)
    @jax.jit
    def plain_reps(st0):
        def body(stx, _):
            stx, tp = sim._plain_step(stx, None)
            return stx, ()
        stx, _ = jax.lax.scan(body, st0, None, length=24)
        return stx.vxc

    r = plain_reps(st)
    jax.block_until_ready(r)
    fence(r)
    import time as _t
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        fence(plain_reps(st))
        best = min(best, _t.perf_counter() - t0)
    print("STEP plain (fused)   : %.3f ms" % ((best - tunnel_rtt()) / 24 * 1e3))

    t_force, t_neigh = sim.measure_phases(st)
    print("PHASES force=%.3f ms reneigh=%.3f ms (measure_phases)"
          % (t_force * 1e3, t_neigh * 1e3))
    return sim


def headline():
    import json
    import subprocess

    r = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=1200,
    )
    print("BENCH stdout:", r.stdout.strip().splitlines()[-1] if r.stdout else "")
    if r.returncode != 0:
        print("BENCH FAILED rc=%d: %s" % (r.returncode, r.stderr[-500:]))


def main():
    quick = "--quick" in sys.argv
    import jax

    print("devices:", jax.devices())
    t0 = time.time()
    gather_rates()
    print("[%.0fs]" % (time.time() - t0))
    kernel_ab(quick)
    print("[%.0fs]" % (time.time() - t0))
    if not quick:
        headline()
    print("DONE [%.0fs]" % (time.time() - t0))


if __name__ == "__main__":
    main()

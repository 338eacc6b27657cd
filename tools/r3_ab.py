"""Round-3 force-path A/B on the real chip: bucket planning, ishare,
approx reciprocal.

    python tools/r3_ab.py [variant ...]

Variants: base rcp share4 share4rcp (default: all). Prints per-variant
plain-step and cheap-rebuild times plus a force-vs-oracle max error.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import fence, tunnel_rtt  # noqa: E402

VARIANTS = {
    "base": {"approx_rcp": False},
    "rcp": {"approx_rcp": True},
    "share1": {"ishare": 1},
    "share4": {"ishare": 4},
}


def run_variant(name, overrides):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import ClusterSimulation
    from mdbench_tpu.ops.pallas.lj_cluster import lj_cluster_force_xla_ilist

    p = Params(precision="sp", dense_thermo=False, **overrides)
    sim = ClusterSimulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st)
    if sim._calibrate_list_cap(st):
        st = sim.initial_state()
        jax.block_until_ready(st)
    print(
        "%-10s list_cap=%d icap=%d share=%d buckets=%s"
        % (name, sim.list_cap, sim.icap, sim.ishare, sim.buckets)
    )
    if sim.buckets:
        sz, cp = sim.buckets
        tot = sum(n * c for n, c in zip(sz, cp))
        print(
            "%-10s sum(n_k*c_k)=%dk rows  sum(nji)=%dk"
            % (name, tot // 1000, int(np.asarray(st.pairs.nji).sum()) // 1000)
        )

    # force error vs the XLA exact-list oracle
    fx, fy, fz = jax.jit(
        lambda c, pr: sim._force_from(c, pr, st.halo)
    )(st.clusters, st.pairs)
    ox, oy, oz = jax.jit(
        lambda c, pr: lj_cluster_force_xla_ilist(
            c.xc, c.yc, c.zc, pr.ijlist, sim.n_clusters_pad,
            p.cutforce**2, p.sigma6, p.epsilon, share=sim.ishare,
        )
    )(st.clusters, st.pairs)
    valid = (np.asarray(st.clusters.atom_id) >= 0).astype(np.float32)
    err = max(
        float(jnp.max(jnp.abs(fx - ox) * valid)),
        float(jnp.max(jnp.abs(fy - oy) * valid)),
        float(jnp.max(jnp.abs(fz - oz) * valid)),
    )
    scale = float(jnp.max(jnp.abs(ox * valid)))
    print("%-10s force max abs err = %.3e (scale %.3e)" % (name, err, scale))

    @jax.jit
    def plain_reps(st0):
        def body(stx, _):
            stx, _tp = sim._plain_step(stx, None)
            return stx, ()
        stx, _ = jax.lax.scan(body, st0, None, length=24)
        return stx.vxc

    fence(plain_reps(st))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fence(plain_reps(st))
        best = min(best, time.perf_counter() - t0)
    t_plain = (best - tunnel_rtt()) / 24 * 1e3

    @jax.jit
    def cheap_reps(st0):
        def body(stx, _):
            stx, _tp = sim._reneigh_step_cheap(stx)
            return stx._replace(overflow=st0.overflow), ()
        stx, _ = jax.lax.scan(body, st0, None, length=8)
        return stx.vxc

    fence(cheap_reps(st))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fence(cheap_reps(st))
        best = min(best, time.perf_counter() - t0)
    t_cheap = (best - tunnel_rtt()) / 8 * 1e3

    eff = t_plain + (t_cheap - t_plain) / 20.0
    print(
        "%-10s plain %.3f ms  cheap %.3f ms  eff %.3f ms  -> %.1f M/s"
        % (name, t_plain, t_cheap, eff, 131072 / eff / 1e3)
    )
    return t_plain, t_cheap


def main():
    which = sys.argv[1:] or list(VARIANTS)
    for name in which:
        run_variant(name, VARIANTS[name])
        print()


if __name__ == "__main__":
    main()

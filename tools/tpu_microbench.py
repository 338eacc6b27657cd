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
    """Force-kernel A/B at the 131k benchmark workload: streaming vs
    dynamic-slice vs XLA oracle, plus repack-gather-only cost."""
    import jax
    import jax.numpy as jnp

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import GROUP, ClusterSimulation
    from mdbench_tpu.ops.pallas.lj_cluster import (
        lj_cluster_force_pallas,
        lj_cluster_force_pallas_stream,
        lj_cluster_force_xla,
        repack_jtiles,
    )

    p = Params(precision="sp", kernel="xla", dense_thermo=False)
    sim = ClusterSimulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st)
    cl, pairs = st.clusters, st.pairs
    cutsq = p.cutforce**2
    npad = sim.n_clusters_pad

    def mk(fn, **kw):
        @jax.jit
        def f(xc):
            return fn(xc, cl.yc, cl.zc, pairs.jlist, **kw)

        return f

    from mdbench_tpu.ops.pallas.lj_cluster import (
        lj_cluster_force_pallas_mxu,
    )

    stream = mk(
        lj_cluster_force_pallas_stream, ranges=pairs.ranges,
        n_clusters_pad=npad, group=GROUP, cutforcesq=cutsq,
        sigma6=p.sigma6, epsilon=p.epsilon,
    )
    mxu = mk(
        lj_cluster_force_pallas_mxu, ranges=pairs.ranges,
        n_clusters_pad=npad, group=GROUP, cutforcesq=cutsq,
        sigma6=p.sigma6, epsilon=p.epsilon,
    )
    ds = mk(
        lj_cluster_force_pallas, ranges=pairs.ranges,
        n_clusters_pad=npad, group=GROUP, cutforcesq=cutsq,
        sigma6=p.sigma6, epsilon=p.epsilon,
    )
    xla = mk(
        lj_cluster_force_xla, n_clusters_pad=npad, group=GROUP,
        cutforcesq=cutsq, sigma6=p.sigma6, epsilon=p.epsilon,
    )

    @jax.jit
    def repack_only(xc):
        return repack_jtiles(xc, cl.yc, cl.zc, pairs.jlist)

    print("FORCE stream : %.3f ms" % (timeit(stream, cl.xc) * 1e3))
    try:
        print("FORCE mxu    : %.3f ms" % (timeit(mxu, cl.xc) * 1e3))
    except Exception as e:  # Mosaic may reject a layout; report, go on
        print("FORCE mxu    : FAILED %s: %s" % (type(e).__name__,
                                                str(e)[:300]))
    print("FORCE ds(r1) : %.3f ms" % (timeit(ds, cl.xc) * 1e3))
    print("REPACK gather: %.3f ms" % (timeit(repack_only, cl.xc) * 1e3))
    if not quick:
        print("FORCE xla    : %.3f ms" % (timeit(xla, cl.xc) * 1e3))

    # list/tile accounting for context
    import numpy as np

    rg = np.asarray(pairs.ranges)[:, 0, :]
    tiles = int(np.maximum(rg[:, GROUP:2 * GROUP] - rg[:, :GROUP], 0).sum())
    print("TILES active=%d padded_pairs=%d" % (tiles, tiles * 1024))

    # reneighbor + full-step costs
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

"""Cheap-rebuild (fixed cluster membership) vs full-resort cadence
(engine_cluster._reneigh_step_cheap / resort_every). The cluster golden
test exercises the cheap path against the C reference (resort_every=400
means every rebuild in a 100-step run is cheap); these tests pin the
cheap/full equivalence directly."""

import numpy as np

from mdbench_tpu.config import Params
from mdbench_tpu.engine_cluster import ClusterSimulation
import pytest

pytestmark = pytest.mark.slow  # trajectory/engine tier: run with the full suite


def test_cheap_rebuild_force_parity_with_full():
    """Applying a cheap vs a full rebuild to the IDENTICAL pre-rebuild
    state must give identical per-atom forces (summation-order noise
    only): the two paths build the same exact lists, just grouped
    differently."""
    import jax

    p = Params(precision="dp", nx=5, ny=5, nz=5, ntimes=19,
               reneigh_every=100)
    sim = ClusterSimulation(p)
    st = sim.run().state

    def atom_forces(s):
        aid = np.asarray(s.clusters.atom_id)
        f = np.stack([np.asarray(s.fxc), np.asarray(s.fyc),
                      np.asarray(s.fzc)], axis=2)
        out = np.zeros((sim.nlocal, 3))
        m = aid >= 0
        out[aid[m]] = f[m]
        return out

    s_full, _ = jax.jit(sim._reneigh_step)(st)
    s_cheap, _ = jax.jit(sim._reneigh_step_cheap)(st)
    assert not np.asarray(s_cheap.overflow).any()
    d = np.abs(atom_forces(s_full) - atom_forces(s_cheap))
    assert d.max() < 1e-10


def test_cheap_rebuild_matches_full_resort_short_horizon():
    kw = dict(precision="dp", nx=5, ny=5, nz=5, ntimes=45,
              reneigh_every=20)
    r_full = ClusterSimulation(
        Params(resort_every=20, **kw)  # every rebuild is a full resort
    ).run()
    r_cheap = ClusterSimulation(
        Params(resort_every=1000, **kw)  # every rebuild is cheap
    ).run()
    # Same scheme semantics; trajectories may differ by (a) pair
    # summation order and (b) cluster-granular skin-tail pairs — a pair
    # outside cutneigh at rebuild time that crosses cutforce before the
    # next rebuild is caught only if a groupmate was closer, which
    # depends on membership. The reference's fixed every-20 cadence has
    # the same exposure (its cluster lists are granular the same way),
    # so only an aggregate tolerance is meaningful here; exact parity
    # is asserted by test_cheap_rebuild_force_parity_with_full.
    assert np.abs(
        np.asarray(r_full.temps) - np.asarray(r_cheap.temps)
    ).max() < 2e-5


def test_mixed_cadence_runs_and_conserves_atoms():
    p = Params(precision="dp", nx=4, ny=4, nz=4, ntimes=120,
               reneigh_every=20, resort_every=40)
    sim = ClusterSimulation(p)
    out = sim.run()
    t = np.asarray(out.temps)
    assert t.shape == (120,)
    assert np.isfinite(t).all()
    # every local atom still present exactly once after mixed rebuilds
    aid = np.asarray(out.state.clusters.atom_id)
    real = aid[aid >= 0]
    assert real.size == sim.nlocal
    assert np.unique(real).size == sim.nlocal


def test_cluster_wrap_keeps_clusters_whole():
    """After a cheap rebuild wraps a cluster across the boundary, all 8
    atoms carry the same shift: cluster extents stay small."""
    p = Params(precision="dp", nx=4, ny=4, nz=4, ntimes=60,
               reneigh_every=10, resort_every=1000)
    sim = ClusterSimulation(p)
    out = sim.run()
    cl = out.state.clusters
    npad = sim.n_clusters_pad
    xc = np.asarray(cl.xc[:npad])
    valid = np.abs(xc) < 1e29
    ext = np.where(valid, xc, np.nan)
    span = np.nanmax(ext, axis=1) - np.nanmin(ext, axis=1)
    assert np.nanmax(span) < sim.prd[0] / 2

"""Cluster-pair scheme vs the dense oracle (CPU, XLA kernel path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdbench_tpu.config import Params
from mdbench_tpu.engine_cluster import ClusterSimulation
from mdbench_tpu.models.lattice import create_fcc_lattice
from mdbench_tpu.ops.dense import lj_force_dense


def test_cluster_first_force_matches_dense():
    p = Params(nx=4, ny=4, nz=4, kernel="xla")
    sim = ClusterSimulation(p)
    f = sim.first_force_atoms()
    f_ref, _, _ = lj_force_dense(
        jnp.asarray(sim._x0), sim.prd, p.cutforce, p.sigma6, p.epsilon
    )
    np.testing.assert_allclose(f, np.asarray(f_ref), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("kern", ["pallas", "pallas_ds"])
def test_cluster_pallas_interpret_matches_xla(kern):
    """Pallas kernels in interpreter mode == XLA oracle (small box).
    'pallas' is the streaming kernel; 'pallas_ds' the dynamic-slice
    round-1 twin."""
    p = Params(nx=3, ny=3, nz=3, kernel=kern)
    sim = ClusterSimulation(p)
    f_pallas = sim.first_force_atoms()
    p2 = Params(nx=3, ny=3, nz=3, kernel="xla")
    sim2 = ClusterSimulation(p2)
    f_xla = sim2.first_force_atoms()
    np.testing.assert_allclose(f_pallas, f_xla, rtol=1e-6, atol=1e-7)


def test_cluster_short_run_matches_verlet_engine():
    """20 steps of the cluster engine == 20 steps of the verlet engine."""
    from mdbench_tpu.engine import Simulation

    pv = Params(nx=4, ny=4, nz=4, ntimes=20, reneigh_every=5)
    pc = Params(nx=4, ny=4, nz=4, ntimes=20, reneigh_every=5, kernel="xla")
    # disable the verlet engine's setup sort so both start identically
    out_v = Simulation(pv).run()
    out_c = ClusterSimulation(pc).run()
    np.testing.assert_allclose(out_c.temps, out_v.temps, rtol=1e-8)
    np.testing.assert_allclose(out_c.press, out_v.press, rtol=1e-8)
    assert not np.asarray(out_c.state.overflow).any()


def test_cluster_prune_pass_preserves_trajectory():
    """pruneNeighbor analogue: the in-interval range refresh must not
    change physics (it may only drop pairs beyond cutneigh). Uses the
    pallas kernel because only it consumes the tile windows."""
    base = dict(nx=3, ny=3, nz=3, ntimes=8, reneigh_every=8,
                kernel="pallas")
    out_noprune = ClusterSimulation(Params(**base, prune_every=0)).run()
    out_prune = ClusterSimulation(Params(**base, prune_every=3)).run()
    np.testing.assert_allclose(
        out_prune.temps, out_noprune.temps, rtol=1e-12, atol=0
    )
    # and the pruned run stays correct vs the verlet engine
    from mdbench_tpu.engine import Simulation

    out_v = Simulation(Params(nx=3, ny=3, nz=3, ntimes=8,
                              reneigh_every=8)).run()
    np.testing.assert_allclose(out_prune.temps, out_v.temps, rtol=1e-8)


def test_cluster_capacity_overflow_recovers():
    """Force a tiny list capacity; engine must grow and still be right."""
    p = Params(nx=3, ny=3, nz=3, ntimes=5, reneigh_every=5, kernel="xla")
    sim = ClusterSimulation(p)
    sim.list_cap = 16  # far too small on purpose
    out = sim.run(max_retries=8)
    assert not np.asarray(out.state.overflow).any()
    assert np.isfinite(out.temps).all()

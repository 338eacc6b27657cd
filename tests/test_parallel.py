"""Multi-chip domain decomposition: sharded vs single-device parity on
the 8-device virtual CPU mesh (SURVEY §4: 'multi-node without a real
cluster')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdbench_tpu.config import Params
from mdbench_tpu.models.lattice import create_fcc_lattice
from mdbench_tpu.ops.dense import lj_force_dense
from mdbench_tpu.parallel.domain import (
    decompose_slabs,
    make_mesh,
    make_sharded_step,
)


@pytest.mark.parametrize("ndev", [1, 2, 4, 8])
def test_sharded_step_matches_dense(ndev):
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    p = Params(nx=6, ny=6, nz=6)  # box 10.1 sigma; slab width 1.26 @ ndev=8
    if p.xprd / ndev < p.cutforce:
        pytest.skip("slab narrower than cutoff: v0 decomposition invalid")
    x, v, _ = create_fcc_lattice(p)
    _run_parity(p, x, v, ndev)


@pytest.mark.parametrize("ndev", [4, 8])
def test_sharded_step_matches_dense_large_box(ndev):
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    p = Params(nx=16, ny=4, nz=4)  # long box: slab width 3.36 >= cutoff @ 8
    x, v, _ = create_fcc_lattice(p)
    _run_parity(p, x, v, ndev)


def _run_parity(p, x, v, ndev):
    state = decompose_slabs(x, v, ndev, p.xprd)
    mesh = make_mesh(ndev)
    step = make_sharded_step(mesh, p)
    out = step(state)

    # single-device oracle: one dense velocity-Verlet step
    prd = np.array([p.xprd, p.yprd, p.zprd])
    f0 = np.zeros_like(x)
    v1 = v + p.dtforce * f0
    x1 = x + p.dt * v1
    x1 = np.where(x1 < 0, x1 + prd, x1)
    x1 = np.where(x1 >= prd, x1 - prd, x1)
    f1, _, _ = lj_force_dense(jnp.asarray(x1), prd, p.cutforce, p.sigma6, p.epsilon)
    v2 = v1 + p.dtforce * np.asarray(f1)

    # gather sharded results back, match atoms by position
    xs = np.asarray(out.x).reshape(-1, 3)
    vs = np.asarray(out.v).reshape(-1, 3)
    valid = np.abs(xs[:, 0]) < 1e29
    xs, vs = xs[valid], vs[valid]
    assert xs.shape[0] == x.shape[0]

    # sort both by position for comparison
    def key(a):
        return np.lexsort((a[:, 2], a[:, 1], a[:, 0]))

    np.testing.assert_allclose(
        xs[key(xs)], np.asarray(x1)[key(np.asarray(x1))], atol=1e-10
    )
    np.testing.assert_allclose(
        vs[key(xs)], v2[key(np.asarray(x1))], atol=1e-9
    )


def test_domain_engine_matches_single_device():
    """Production slab engine (migration + ICI halo exchange + per-device
    verlet lists) vs the single-chip engine: full trajectory parity over
    multiple reneighbor intervals on the 8-device CPU mesh."""
    from mdbench_tpu.engine import Simulation
    from mdbench_tpu.parallel.verlet_domain import DomainSimulation

    ndev = 4
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    p1 = Params(nx=16, ny=4, nz=4, ntimes=30, reneigh_every=10)
    p2 = Params(nx=16, ny=4, nz=4, ntimes=30, reneigh_every=10)
    out_single = Simulation(p1).run()
    dom = DomainSimulation(p2, ndev=ndev)
    out_dom = dom.run()
    np.testing.assert_allclose(
        out_dom.temps, out_single.temps, rtol=1e-8, atol=1e-12
    )


def test_domain_engine_8dev():
    from mdbench_tpu.parallel.verlet_domain import DomainSimulation

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    p = Params(nx=32, ny=3, nz=3, ntimes=20, reneigh_every=10)
    dom = DomainSimulation(p, ndev=8)
    out = dom.run()
    assert np.isfinite(out.temps).all()
    # atom conservation across migration
    assert int(np.asarray(out.state.nlocal).sum()) == dom.natoms

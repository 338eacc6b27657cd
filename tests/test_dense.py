"""Dense O(N^2) oracle vs scalar transcription, and physics invariants."""

import jax.numpy as jnp
import numpy as np

from mdbench_tpu.config import Params
from mdbench_tpu.models.lattice import create_fcc_lattice
from mdbench_tpu.ops.dense import lj_force_dense
from mdbench_tpu.thermo import adjust_thermo, compute_thermo, setup_thermo
from tests.reference_impls import lj_force_reference


def small_system(nx=2, ny=2, nz=2):
    p = Params(nx=nx, ny=ny, nz=nz)
    x, v, _ = create_fcc_lattice(p)
    return p, x, v


def test_dense_force_matches_scalar():
    p, x, _ = small_system()
    f, _, _ = lj_force_dense(
        jnp.asarray(x), np.array([p.xprd, p.yprd, p.zprd]), p.cutforce,
        p.sigma6, p.epsilon,
    )
    f_ref = lj_force_reference(x, p.xprd, p.yprd, p.zprd, p.cutforce,
                               p.sigma6, p.epsilon)
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-12, atol=1e-10)


def test_dense_force_newton_third_law():
    p, x, _ = small_system(3, 3, 3)
    f, _, _ = lj_force_dense(
        jnp.asarray(x), np.array([p.xprd, p.yprd, p.zprd]), p.cutforce,
        p.sigma6, p.epsilon,
    )
    # total force must vanish
    np.testing.assert_allclose(np.asarray(f).sum(axis=0), 0.0, atol=1e-9)


def test_thermo_adjust_hits_target_temperature():
    p, x, v = small_system()
    scales = setup_thermo(p, x.shape[0])
    v2 = adjust_thermo(p, scales, v, x.shape[0])
    t, _ = compute_thermo(jnp.asarray(v2), x.shape[0], p.mass, scales)
    assert abs(float(t) - p.temp) < 1e-10
    # COM momentum ~ 0
    np.testing.assert_allclose(v2.sum(axis=0), 0.0, atol=1e-9)

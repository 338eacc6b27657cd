"""Lattice generator + RNG parity against literal reference transcription."""

import numpy as np
import pytest

from mdbench_tpu.config import Params
from mdbench_tpu.models.lattice import create_fcc_lattice
from mdbench_tpu.utils.prng import park_miller_nth, park_miller_step
from tests.reference_impls import create_atom_reference, myrandom


def test_park_miller_matches_scalar():
    seeds = np.array([1, 2, 12345, 2147483646, 7])
    s_vec = seeds.copy()
    for step in range(20):
        s_vec, u_vec = park_miller_step(s_vec)
        for idx, s0 in enumerate(seeds):
            s = int(s0)
            for _ in range(step + 1):
                s, u = myrandom(s)
            assert s == s_vec[idx]
            assert u == pytest.approx(u_vec[idx], abs=0)


def test_park_miller_nth():
    u = park_miller_nth(np.array([42]), 6)
    s, _ = 42, None
    for _ in range(6):
        s, last = myrandom(s)
    assert u[0] == last


@pytest.mark.parametrize("dims", [(2, 2, 2), (3, 4, 5), (8, 8, 8), (9, 3, 7)])
def test_fcc_lattice_matches_reference(dims):
    nx, ny, nz = dims
    p = Params(nx=nx, ny=ny, nz=nz)
    x, v, types = create_fcc_lattice(p)
    x_ref, v_ref = create_atom_reference(nx, ny, nz, p.rho)
    assert x.shape == x_ref.shape
    # 4 atoms per unit cell
    assert x.shape[0] == 4 * nx * ny * nz
    np.testing.assert_array_equal(x, x_ref)
    np.testing.assert_array_equal(v, v_ref)
    assert (types == 0).all()


def test_lattice_inside_box():
    p = Params(nx=4, ny=4, nz=4)
    x, _, _ = create_fcc_lattice(p)
    assert (x >= 0).all()
    assert (x[:, 0] < p.xprd).all()
    assert (x[:, 1] < p.yprd).all()
    assert (x[:, 2] < p.zprd).all()

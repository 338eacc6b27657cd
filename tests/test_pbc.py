"""setup_pbc: the two-stage subset compaction vs the flat-26 oracle.

The fast path enumerates <=7 shift-subset patterns per boundary atom
(reference pbc.c:90-227 appends the same <=7 images); the flat form
tests all 26 canonical shifts for every atom. Both must produce the
SAME halo — same ghost order (atom-major canonical without sort_grid,
cell-id-major with), same shifts, same nghost/overflow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdbench_tpu.ops.cells import make_cell_grid
from mdbench_tpu.ops.pbc import _setup_pbc_flat26, setup_pbc


def _rand_state(n, prd, seed, pad=8):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, np.array(prd), size=(n, 3)).astype(np.float32)
    xp = np.full((n + pad, 3), 1e30, np.float32)
    xp[:n] = x
    return jnp.asarray(xp)


@pytest.mark.parametrize("pbc", [(1, 1, 1), (0, 1, 1), (0, 0, 1)])
@pytest.mark.parametrize("sort", [False, True])
def test_subset_halo_matches_flat26(pbc, sort):
    prd = (12.0, 11.0, 13.0)
    cut = 2.8
    n, gcap = 600, 4096
    x = _rand_state(n, prd, seed=3)
    grid = make_cell_grid(prd, cut, rho=0.4) if sort else None
    fast = jax.jit(
        lambda x: setup_pbc(x, n, n + 4, gcap, prd, pbc, cut, sort_grid=grid)
    )(x)
    ref = jax.jit(
        lambda x: _setup_pbc_flat26(x, n, gcap, prd, pbc, cut, sort_grid=grid)
    )(x)
    np.testing.assert_array_equal(
        np.asarray(fast.border_map), np.asarray(ref.border_map)
    )
    np.testing.assert_array_equal(np.asarray(fast.shift), np.asarray(ref.shift))
    assert int(fast.nghost) == int(ref.nghost)
    assert bool(fast.overflow) == bool(ref.overflow) == False  # noqa: E712


def test_subset_halo_overflow_flags():
    prd = (12.0, 11.0, 13.0)
    n = 600
    x = _rand_state(n, prd, seed=5)
    h = jax.jit(
        lambda x: setup_pbc(x, n, n + 4, 8, prd, (1, 1, 1), 2.8)
    )(x)
    assert bool(h.overflow)
    ref = jax.jit(
        lambda x: _setup_pbc_flat26(x, n, 8, prd, (1, 1, 1), 2.8)
    )(x)
    assert int(h.nghost) == int(ref.nghost) > 8


def test_small_box_falls_back_to_flat26():
    # 2*cutneigh >= prd: both images of a dimension can be valid; the
    # subset form must route to the flat-26 fallback and stay correct.
    prd = (5.0, 5.0, 5.0)
    n, gcap = 100, 4096
    x = _rand_state(n, prd, seed=9)
    fast = jax.jit(
        lambda x: setup_pbc(x, n, n + 4, gcap, prd, (1, 1, 1), 2.8)
    )(x)
    ref = jax.jit(
        lambda x: _setup_pbc_flat26(x, n, gcap, prd, (1, 1, 1), 2.8)
    )(x)
    np.testing.assert_array_equal(
        np.asarray(fast.border_map), np.asarray(ref.border_map)
    )
    np.testing.assert_array_equal(np.asarray(fast.shift), np.asarray(ref.shift))


def test_no_pbc_means_no_ghosts():
    prd = (12.0, 11.0, 13.0)
    n = 600
    x = _rand_state(n, prd, seed=11)
    h = jax.jit(
        lambda x: setup_pbc(x, n, n + 4, 512, prd, (0, 0, 0), 2.8)
    )(x)
    assert int(h.nghost) == 0
    assert not bool(h.overflow)
    assert np.all(np.asarray(h.border_map) == x.shape[0] - 1)

"""Multi-chip spatial domain decomposition over a jax.sharding.Mesh.

The reference is strictly single-node (SURVEY §2.5: no MPI/NCCL anywhere);
its ghost-atom PBC machinery (border_map + shift vectors, pbc.c) is the
pattern that generalizes: each chip owns a spatial slab of the box, and
the halo exchange that the serial code does against its own periodic
images becomes a `lax.ppermute` pull from neighbor chips over ICI.

v0 (this file): 1-D slab decomposition along x, whole-slab halo exchange
with both neighbors, dense in-range force among (local + left + right)
slabs. Correct whenever slab width >= cutoff. The production path swaps
the dense local force for the per-device Verlet machinery and trims the
exchange to boundary atoms only — the SPMD structure stays identical.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mdbench_tpu.config import Params
from mdbench_tpu.state import SENTINEL_COORD


class SlabState(NamedTuple):
    x: jnp.ndarray  # (ndev, cap, 3), sharded over axis 0
    v: jnp.ndarray
    f: jnp.ndarray
    n_owned: jnp.ndarray  # (ndev,) int32 — valid rows per slab


def make_mesh(n_devices: int, axis: str = "x") -> Mesh:
    devs = jax.devices()[:n_devices]
    return Mesh(np.array(devs), (axis,))


def decompose_slabs(x: np.ndarray, v: np.ndarray, ndev: int, xprd: float,
                    capacity: int = 0) -> SlabState:
    """Host-side: assign atoms to x-slabs, pad each slab to capacity with
    sentinel coordinates."""
    slab_of = np.minimum((x[:, 0] / (xprd / ndev)).astype(np.int64), ndev - 1)
    counts = np.bincount(slab_of, minlength=ndev)
    if capacity <= 0:
        capacity = int(((counts.max() * 1.3 + 7) // 8) * 8 + 8)
    xs = np.full((ndev, capacity, 3), SENTINEL_COORD, x.dtype)
    vs = np.zeros((ndev, capacity, 3), v.dtype)
    for d in range(ndev):
        idx = np.nonzero(slab_of == d)[0]
        xs[d, : len(idx)] = x[idx]
        vs[d, : len(idx)] = v[idx]
    return SlabState(
        x=jnp.asarray(xs),
        v=jnp.asarray(vs),
        f=jnp.zeros_like(jnp.asarray(vs)),
        n_owned=jnp.asarray(counts.astype(np.int32)),
    )


def _dense_force_against(xi, xj, prd, cutsq, sigma6, epsilon, exclude_self):
    """Forces on xi from all in-range xj (min-image). Sentinel (padding)
    rows must be masked explicitly: the min-image subtraction can cancel
    two huge sentinels to a fake zero distance."""
    xj_valid = jnp.abs(xj[:, 0]) < SENTINEL_COORD * 0.5
    xi_valid = jnp.abs(xi[:, 0]) < SENTINEL_COORD * 0.5
    delta = xi[:, None, :] - xj[None, :, :]
    delta = delta - prd * jnp.round(delta / prd)
    rsq = jnp.sum(delta * delta, axis=-1)
    mask = (rsq < cutsq) & xi_valid[:, None] & xj_valid[None, :]
    if exclude_self:
        n = xi.shape[0]
        mask &= ~jnp.eye(n, dtype=bool)
    rsq_safe = jnp.where(mask, rsq, 1.0)
    sr2 = 1.0 / rsq_safe
    sr6 = sr2 * sr2 * sr2 * sigma6
    force = jnp.where(mask, 48.0 * sr6 * (sr6 - 0.5) * sr2 * epsilon, 0.0)
    return jnp.sum(delta * force[..., None], axis=1)


def make_sharded_step(mesh: Mesh, params: Params, axis: str = "x"):
    """Build the jitted SPMD MD step: halo exchange via ppermute over ICI,
    local force, velocity-Verlet update. Shardings: state arrays
    partitioned over the mesh axis (spatial DP over domains)."""
    prd = jnp.array([params.xprd, params.yprd, params.zprd], params.dtype)
    cutsq = params.cutforce**2
    ndev = mesh.devices.size

    def step_local(x, v, f, n_owned):
        # shard_map body: each block is (1, cap, 3) -> squeeze to (cap, 3)
        x, v, f = x[0], v[0], f[0]
        dt, dtforce = params.dt, params.dtforce

        v = v + dtforce * f
        xl = x + dt * v
        # keep sentinel rows inert
        valid = jnp.abs(x[:, 0]) < SENTINEL_COORD * 0.5
        x = jnp.where(valid[:, None], xl, x)
        # wrap (reference updateAtomsPbc semantics)
        x = jnp.where(valid[:, None] & (x < 0), x + prd, x)
        x = jnp.where(valid[:, None] & (x >= prd), x - prd, x)

        # Halo exchange over ICI: pull both neighbors' slabs.
        right = jax.lax.ppermute(
            x, axis, [(i, (i + 1) % ndev) for i in range(ndev)]
        )
        left = jax.lax.ppermute(
            x, axis, [(i, (i - 1) % ndev) for i in range(ndev)]
        )

        f = _dense_force_against(x, x, prd, cutsq, params.sigma6,
                                 params.epsilon, exclude_self=True)
        if ndev > 1:
            f = f + _dense_force_against(x, left, prd, cutsq, params.sigma6,
                                         params.epsilon, exclude_self=False)
        if ndev > 2:
            f = f + _dense_force_against(x, right, prd, cutsq, params.sigma6,
                                         params.epsilon, exclude_self=False)
        f = jnp.where(valid[:, None], f, 0.0)
        v = v + dtforce * f
        return x[None], v[None], f[None], n_owned

    spec = P(axis)
    step = jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
        check_vma=False,
    )

    @jax.jit
    def run_step(state: SlabState) -> SlabState:
        x, v, f, n = step(state.x, state.v, state.f, state.n_owned)
        return SlabState(x=x, v=v, f=f, n_owned=n)

    return run_step


def dryrun(n_devices: int, nx: int = 4) -> SlabState:
    """One sharded MD step on tiny shapes — validates that the multi-chip
    program compiles and executes on an n-device mesh."""
    from mdbench_tpu.models.lattice import create_fcc_lattice

    params = Params(nx=nx, ny=nx, nz=nx, precision="sp")
    x, v, _ = create_fcc_lattice(params)
    mesh = make_mesh(n_devices)
    state = decompose_slabs(
        x.astype(np.float32), v.astype(np.float32), n_devices, params.xprd
    )
    step = make_sharded_step(mesh, params)
    out = step(state)
    jax.block_until_ready(out)
    return out

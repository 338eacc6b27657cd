"""Lennard-Jones force kernels over Verlet neighbor lists (XLA path).

Pair math matches the reference exactly (src/verletlist/force_lj.c:69-75):
  sr2 = 1/rsq; sr6 = sr2^3 * sigma6; F = 48*eps*sr6*(sr6-0.5)*sr2.

Full-neighbor (force_lj.c:14-105): gather j positions by neighbor row,
mask lanes beyond numneigh and outside the force cutoff, reduce over the
lane axis — a pure gather->compute->reduce XLA program that the TPU
executes without any scatter.

Half-neighbor (force_lj.c:107-198): adds the Newton third-law update
f[j] -= f_pair for local j (ghost j skipped, force_lj.c:176). The
reference's benign OpenMP race becomes a deterministic scatter-add here
(SURVEY §5.2). On TPU the scatter makes half lists usually slower than
full lists — both are kept, as in the reference (param.half_neigh).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _pair_force(rsq, mask, sigma6, epsilon):
    rsq_safe = jnp.where(mask, rsq, 1.0)
    sr2 = 1.0 / rsq_safe
    sr6 = sr2 * sr2 * sr2 * sigma6
    force = 48.0 * sr6 * (sr6 - 0.5) * sr2 * epsilon
    return jnp.where(mask, force, 0.0)


def _gather_pair_tables(tables, types, i_idx, neigh):
    ti = types[i_idx][:, None]
    tj = types[neigh]
    return (
        tables.cutforcesq[ti, tj],
        tables.sigma6[ti, tj],
        tables.epsilon[ti, tj],
    )


def compute_force_lj_full(
    x: jnp.ndarray,
    neighbors: jnp.ndarray,
    numneigh: jnp.ndarray,
    nlocal_pad: int,
    cutforcesq,
    sigma6,
    epsilon,
    types: Optional[jnp.ndarray] = None,
    tables=None,
) -> jnp.ndarray:
    """Full-neighbor LJ forces. Returns (nlocal_pad, 3)."""
    k = neighbors.shape[1]
    lane = jnp.arange(k, dtype=jnp.int32)[None, :]
    valid = lane < numneigh[:, None]

    xi = x[:nlocal_pad][:, None, :]
    xj = x[neighbors]
    delta = xi - xj
    rsq = jnp.sum(delta * delta, axis=-1)

    if tables is not None:
        i_idx = jnp.arange(nlocal_pad, dtype=jnp.int32)
        cutforcesq, sigma6, epsilon = _gather_pair_tables(
            tables, types, i_idx, neighbors
        )
    mask = valid & (rsq < cutforcesq)
    force = _pair_force(rsq, mask, sigma6, epsilon)
    return jnp.sum(delta * force[..., None], axis=1)


def compute_force_lj_half(
    x: jnp.ndarray,
    neighbors: jnp.ndarray,
    numneigh: jnp.ndarray,
    nlocal: int,
    nlocal_pad: int,
    cutforcesq,
    sigma6,
    epsilon,
    types: Optional[jnp.ndarray] = None,
    tables=None,
) -> jnp.ndarray:
    """Half-neighbor LJ with deterministic Newton scatter-add."""
    k = neighbors.shape[1]
    lane = jnp.arange(k, dtype=jnp.int32)[None, :]
    valid = lane < numneigh[:, None]

    xi = x[:nlocal_pad][:, None, :]
    xj = x[neighbors]
    delta = xi - xj
    rsq = jnp.sum(delta * delta, axis=-1)

    if tables is not None:
        i_idx = jnp.arange(nlocal_pad, dtype=jnp.int32)
        cutforcesq, sigma6, epsilon = _gather_pair_tables(
            tables, types, i_idx, neighbors
        )
    mask = valid & (rsq < cutforcesq)
    force = _pair_force(rsq, mask, sigma6, epsilon)
    contrib = delta * force[..., None]  # (nlocal_pad, k, 3)

    f = jnp.sum(contrib, axis=1)
    # Newton: f[j] -= contrib, local j only (reference force_lj.c:176-180)
    jj = jnp.where(mask & (neighbors < nlocal), neighbors, nlocal_pad)
    f = jnp.concatenate([f, jnp.zeros((1, 3), f.dtype)], axis=0)
    f = f.at[jj.reshape(-1)].add(-contrib.reshape(-1, 3), mode="drop")
    return f[:nlocal_pad]


def lj_energy_virial(
    x, neighbors, numneigh, nlocal_pad, cutforcesq, sigma6, epsilon
):
    """Potential energy and virial from a full list (for observability;
    the reference prints only T/P but stats need pair counts)."""
    k = neighbors.shape[1]
    lane = jnp.arange(k, dtype=jnp.int32)[None, :]
    valid = lane < numneigh[:, None]
    xi = x[:nlocal_pad][:, None, :]
    xj = x[neighbors]
    delta = xi - xj
    rsq = jnp.sum(delta * delta, axis=-1)
    mask = valid & (rsq < cutforcesq)
    rsq_safe = jnp.where(mask, rsq, 1.0)
    sr2 = 1.0 / rsq_safe
    sr6 = sr2 * sr2 * sr2 * sigma6
    epair = jnp.where(mask, 4.0 * epsilon * sr6 * (sr6 - 1.0), 0.0)
    force = jnp.where(mask, 48.0 * epsilon * sr6 * (sr6 - 0.5) * sr2, 0.0)
    return 0.5 * jnp.sum(epair), 0.5 * jnp.sum(rsq * force)

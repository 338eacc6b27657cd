"""EAM force over Verlet neighbor lists — two passes with a ghost-fp
exchange between them (reference: src/verletlist/force_eam.c:20-231).

Pass 1: per-atom embedding density rho_i from the rhor spline, then
fp_i = dF/drho from the frho spline. Ghost fp values are copied through
border_map (the dependency that forces two passes, force_eam.c:117-120).
Pass 2: pair forces from rhor' / z2r splines:
  phi = z2/r; psip = fp_i*rhoip + fp_j*rhoip + phip; F = -psip/r.

TPU shape: spline lookups are row gathers of (n+1, 7) tables by the
(N, K) grid index; all arithmetic is planar (N, K). The clusterpair
reference never finished EAM (force_eam.c is stubbed out, SURVEY §2.3);
here EAM runs on the verlet path, matching that reality.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class EamDevice(NamedTuple):
    """Device-resident spline tables."""

    rhor: jnp.ndarray  # (nr+1, 7)
    frho: jnp.ndarray  # (nrho+1, 7)
    z2r: jnp.ndarray  # (nr+1, 7)
    rdr: float
    rdrho: float
    nr: int
    nrho: int


def _grid_index(r_or_rho, rd, n):
    """p = x*rd + 1; m = clamp(floor(p)); fractional remainder
    (reference: force_eam.c:74-79, 100-105)."""
    p = r_or_rho * rd + 1.0
    m = jnp.floor(p).astype(jnp.int32)
    m = jnp.clip(m, 1, n - 1)
    frac = jnp.minimum(p - m, 1.0)
    return m, frac


def compute_force_eam(
    x: jnp.ndarray,
    neighbors: jnp.ndarray,
    numneigh: jnp.ndarray,
    border_map: jnp.ndarray,
    nlocal: int,
    nlocal_pad: int,
    cutforcesq: float,
    eam: EamDevice,
    fp_exchange=None,
):
    """Returns (forces (nlocal_pad, 3), fp (nrows,)).

    fp_exchange(fp) -> fp: fills GHOST rows of the embedding-derivative
    array between the two passes. Default = the single-chip border_map
    gather (force_eam.c:117-120); the multi-chip domain engine passes a
    closure that additionally ppermutes boundary fp values over the
    device mesh (the cross-chip analogue of the same copy)."""
    k = neighbors.shape[1]
    lane = jnp.arange(k, dtype=jnp.int32)[None, :]
    valid = lane < numneigh[:, None]

    xj = x[neighbors]
    xi = x[:nlocal_pad]
    dx = xi[:, 0, None] - xj[:, :, 0]
    dy = xi[:, 1, None] - xj[:, :, 1]
    dz = xi[:, 2, None] - xj[:, :, 2]
    rsq = dx * dx + dy * dy + dz * dz
    mask = valid & (rsq < cutforcesq)
    r = jnp.sqrt(jnp.where(mask, rsq, 1.0))

    m, p = _grid_index(r, eam.rdr, eam.nr)

    # pass 1: embedding density (force_eam.c:60-90)
    rs = eam.rhor[m]  # (N, K, 7)
    dens = ((rs[..., 3] * p + rs[..., 4]) * p + rs[..., 5]) * p + rs[..., 6]
    rhoi = jnp.sum(jnp.where(mask, dens, 0.0), axis=1)  # (nlocal_pad,)

    mf, pf = _grid_index(rhoi, eam.rdrho, eam.nrho)
    fs = eam.frho[mf]  # (nlocal_pad, 7)
    fp_local = (fs[:, 0] * pf + fs[:, 1]) * pf + fs[:, 2]

    # ghost fp through border_map (force_eam.c:117-120)
    nrows = x.shape[0]
    fp = jnp.zeros((nrows,), x.dtype)
    fp = fp.at[:nlocal_pad].set(fp_local)
    if fp_exchange is None:
        gcap = border_map.shape[0]
        fp = fp.at[nlocal_pad : nlocal_pad + gcap].set(fp[border_map])
    else:
        fp = fp_exchange(fp)

    # pass 2: pair forces (force_eam.c:122-227)
    rsp = eam.rhor[m]
    rhoip = (rsp[..., 0] * p + rsp[..., 1]) * p + rsp[..., 2]
    zs = eam.z2r[m]
    z2p = (zs[..., 0] * p + zs[..., 1]) * p + zs[..., 2]
    z2 = ((zs[..., 3] * p + zs[..., 4]) * p + zs[..., 5]) * p + zs[..., 6]

    recip = 1.0 / r
    phi = z2 * recip
    phip = z2p * recip - phi * recip
    fpj = fp[neighbors]
    psip = fp_local[:, None] * rhoip + fpj * rhoip + phip
    fpair = jnp.where(mask, -psip * recip, 0.0)

    fx = jnp.sum(dx * fpair, axis=1)
    fy = jnp.sum(dy * fpair, axis=1)
    fz = jnp.sum(dz * fpair, axis=1)
    return jnp.stack([fx, fy, fz], axis=1), fp

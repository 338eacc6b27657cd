"""Shared helpers for the domain-decomposition engines (1-D slabs,
2-D pencils, 3-D bricks): the per-device traced-nloc spatial resort
and the rowlist row-layout alignment rules. One definition so the
growth factors and alignment constants cannot drift between engines."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resort_by_cell(grid, x, v, nloc, acap):
    """Traced-nloc spatial resort of a device's locals by cell id
    (sortAtom per device): migration appends arrivals at the END of
    the local region, so without a resort the rowlist units decay into
    spatially arbitrary 16-atom groups and their candidate sets blow
    up. One packed-key sort; padding sorts last."""
    xl = x[:acap]
    bs, dims = grid.binsize, grid.dims
    bx = jnp.clip((xl[:, 0] / bs[0]).astype(jnp.int32) + 1, 0, dims[0] - 1)
    by = jnp.clip((xl[:, 1] / bs[1]).astype(jnp.int32) + 1, 0, dims[1] - 1)
    bz = jnp.clip((xl[:, 2] / bs[2]).astype(jnp.int32) + 1, 0, dims[2] - 1)
    flat = (bx * dims[1] + by) * dims[2] + bz
    live = jnp.arange(acap, dtype=jnp.int32) < nloc
    key = jnp.where(live, flat, jnp.int32(2**31 - 1))
    rid = jnp.arange(acap, dtype=jnp.int32)
    _k, perm = jax.lax.sort((key, rid), num_keys=1, is_stable=False)
    return x.at[:acap].set(xl[perm]), v[perm]


def align_acap(rowlist: bool, backend: str, acap: int) -> int:
    """Rowlist local-region alignment: the Pallas kernel's revolving
    output blocks need acap % 1024 == 0; the fused-XLA twin only needs
    whole 16-atom rows."""
    if not rowlist:
        return acap
    align = 1024 if backend == "pallas" else 16
    return (acap + align - 1) // align * align


def round16(cap: int) -> int:
    """Ghost blocks round up to whole 16-atom rows on the rowlist path
    so block boundaries never split a row."""
    return (cap + 15) // 16 * 16

"""Ghost-atom (PBC halo) machinery, fully on device.

The reference walks local atoms appending up to 7 periodic images each
(faces/edges/corners) into border_map + PBC shift arrays
(reference: src/verletlist/pbc.c:90-227 setupPbc), then refreshes ghost
coordinates every step (pbc.c:42-55 updatePbc). TPU version: the 26
candidate shifts are tested for all atoms at once; valid (atom, shift)
pairs are compacted by a cumsum + scatter into fixed-capacity halo
arrays. The per-step refresh is a single gather + add that fuses into
the step scan.

This same border_map/shift structure generalizes to the multi-chip halo
exchange (parallel/), where the gather crosses chip boundaries via
collectives instead of staying local.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mdbench_tpu.state import Halo

# All 26 nonzero shift combinations, canonical order.
_SHIFTS = np.array(
    [
        (sx, sy, sz)
        for sx in (-1, 0, 1)
        for sy in (-1, 0, 1)
        for sz in (-1, 0, 1)
        if (sx, sy, sz) != (0, 0, 0)
    ],
    dtype=np.int32,
)


def setup_pbc(
    x: jnp.ndarray,
    nlocal: int,
    nlocal_pad: int,
    ghost_capacity: int,
    prd,
    pbc,
    cutneigh: float,
    sort_grid=None,
) -> Halo:
    """Build the halo map (reference setupPbc semantics, pbc.c:90-227).

    A shift s is valid for atom i iff per dimension d:
      s_d = +1 -> x_d <  cutneigh          (image appears at x + prd)
      s_d = -1 -> x_d >= prd_d - cutneigh  (image appears at x - prd)
      s_d =  0 -> always
    and every dimension with s_d != 0 has PBC enabled. Ghost order is
    (atom-major, canonical shift order) — a different enumeration order
    than the reference, which only permutes ghost indices.

    sort_grid (a CellGrid, optional): additionally order ghosts by
    their cell id. Physics-neutral (any ghost order is valid), but it
    makes ghost 16-atom rows spatially compact, which the rowlist
    force path's per-unit row unions depend on — unsorted ghosts give
    each boundary unit one list entry PER ghost neighbor instead of
    per 16 (measured: rcap 168 vs ~half with sorted ghosts at 131k).
    """
    dtype = x.dtype
    xl = x[:nlocal]
    prd_v = jnp.asarray(prd, dtype)
    pbc_v = np.asarray(pbc, np.int32)

    lo = xl < cutneigh  # (nlocal, 3)
    hi = xl >= (prd_v - cutneigh)

    shifts = jnp.asarray(_SHIFTS)  # (26, 3)
    pbc_ok = np.all((np.abs(_SHIFTS) == 0) | (pbc_v[None, :] != 0), axis=1)
    pbc_ok = jnp.asarray(pbc_ok)  # (26,)

    pos_ok = jnp.where(shifts[None, :, :] == 1, lo[:, None, :], True)
    neg_ok = jnp.where(shifts[None, :, :] == -1, hi[:, None, :], True)
    valid = jnp.all(pos_ok & neg_ok, axis=2) & pbc_ok[None, :]  # (nlocal, 26)

    flat_valid = valid.reshape(-1)  # (nlocal*26,)
    nghost = jnp.sum(flat_valid).astype(jnp.int32)
    overflow = nghost > ghost_capacity

    # Packed-key sort compaction (NOT cumsum + scatter: dynamic-index
    # scatters run at ~0.14 G elts/s on TPU — the two scatters here
    # measured 56 ms at 131k, the sort form ~2 ms; same lesson as the
    # cluster halo, PERF.md round 2 lesson 2). Key ranks valid
    # candidates first — by ghost cell id when sort_grid is given
    # (spatially compact ghost rows for the rowlist force path), else
    # by flat candidate index (exactly the old atom-major order).
    # Ties resolve by the index SECOND KEY, so the sort is deterministic.
    n26 = nlocal * 26
    idx = jnp.arange(n26, dtype=jnp.int32)
    if sort_grid is not None:
        from mdbench_tpu.ops.cells import coord_to_bin

        gx = (
            xl[:, None, :] + (shifts.astype(dtype) * prd_v)[None, :, :]
        ).reshape(-1, 3)
        rank = coord_to_bin(sort_grid, gx)
    else:
        rank = idx
    big = jnp.int32(2**31 - 1)
    key = jnp.where(flat_valid, rank, big)
    # two sort keys (rank, idx): equal-rank candidates order by index,
    # which MAKES the claimed determinism true — num_keys=1 with an
    # unstable sort leaves tie order unspecified across XLA versions
    _skey, sidx = jax.lax.sort((key, idx), num_keys=2, is_stable=False)
    slot_key = _skey[:ghost_capacity]
    slot_idx = sidx[:ghost_capacity]
    live = slot_key < big
    sentinel_row = x.shape[0] - 1
    border_map = jnp.where(live, slot_idx // 26, sentinel_row)
    shift_tab = shifts.astype(dtype) * prd_v  # (26, 3)
    shift = jnp.where(
        live[:, None], shift_tab[slot_idx % 26], jnp.zeros((), dtype)
    )

    return Halo(border_map=border_map, shift=shift, nghost=nghost, overflow=overflow)


def update_pbc(x: jnp.ndarray, halo: Halo, nlocal_pad: int) -> jnp.ndarray:
    """Refresh ghost coordinates from their owners
    (reference updatePbc, pbc.c:42-55): one gather + add.
    Padded halo slots point at the sentinel row (shift 0) and stay inert.
    """
    ghost_x = x[halo.border_map] + halo.shift
    gcap = halo.border_map.shape[0]
    return x.at[nlocal_pad : nlocal_pad + gcap].set(ghost_x)


def ghost_types(types: jnp.ndarray, halo: Halo, nlocal_pad: int) -> jnp.ndarray:
    """Propagate atom types to ghost slots (reference ADDGHOST
    type copy, pbc.c:90-97)."""
    gcap = halo.border_map.shape[0]
    return types.at[nlocal_pad : nlocal_pad + gcap].set(types[halo.border_map])

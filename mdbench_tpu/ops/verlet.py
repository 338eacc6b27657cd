"""Verlet neighbor-list construction on device.

The reference scans, per local atom, the 3-D bin stencil and appends
in-range atom ids to a fixed-width row, with a grow-and-retry loop on
overflow (reference: src/verletlist/neighbor.c:186-264). TPU version:
the stencil gather is batched over chunks of atoms (lax.map keeps the
peak intermediate at chunk x stencil x capacity), candidates are
masked by cutneigh / self / half-list rules, and each row is compacted
by a cumsum + ranked scatter into the padded (nlocal_pad, maxneighs)
list. Overflow raises a flag; the host grows maxneighs and retraces
(the reference's RESIZE loop, neighbor.c:247-262).

Half-list rule (reference: neighbor.c:223-225): skip j < i. Ghost rows
sit above nlocal_pad so they are always retained, matching the
reference where ghosts live above Nlocal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mdbench_tpu.ops.cells import CellGrid, CellList
from mdbench_tpu.state import NeighborList


def build_neighbors(
    grid: CellGrid,
    cl: CellList,
    x: jnp.ndarray,
    types: jnp.ndarray,
    cutneighsq,  # scalar (ntypes==1) or (ntypes, ntypes) table
    nlocal: int,
    nlocal_pad: int,
    maxneighs: int,
    half: bool,
    chunk: int = 2048,
) -> NeighborList:
    nrows = x.shape[0]
    sentinel_row = nrows - 1
    while nlocal_pad % chunk != 0:
        chunk //= 2
    assert chunk >= 1
    stencil = jnp.asarray(grid.stencil)  # (27,)
    # A safe interior bin for padded rows (its results are masked out).
    d = grid.dims
    safe_bin = (1 * d[1] + 1) * d[2] + 1
    typed = cutneighsq.ndim == 2 if hasattr(cutneighsq, "ndim") else False

    def chunk_fn(start):
        i_idx = start + jnp.arange(chunk, dtype=jnp.int32)
        is_real = i_idx < nlocal
        i_safe = jnp.where(is_real, i_idx, 0)
        ib = jnp.where(is_real, cl.bin_of[i_safe], safe_bin)
        cand_bins = ib[:, None] + stencil[None, :]  # (chunk, 27)
        cand = cl.cells[cand_bins].reshape(chunk, -1)  # (chunk, C)
        xi = x[i_safe]
        xj = x[cand]  # (chunk, C, 3) — split to planes immediately (TPU
        # pads a materialized minor dim 3 to 128 lanes; planar stays dense)
        dxp = xi[:, 0, None] - xj[:, :, 0]
        dyp = xi[:, 1, None] - xj[:, :, 1]
        dzp = xi[:, 2, None] - xj[:, :, 2]
        rsq = dxp * dxp + dyp * dyp + dzp * dzp
        if typed:
            cut = cutneighsq[types[i_safe][:, None], types[cand]]
        else:
            cut = cutneighsq
        mask = (rsq <= cut) & (cand != i_idx[:, None]) & is_real[:, None]
        mask &= cand != sentinel_row
        if half:
            mask &= cand > i_idx[:, None]

        nn = jnp.sum(mask, axis=1).astype(jnp.int32)
        # Compact by sorting (j if valid else sentinel) ascending: valid
        # entries land in the first nn columns, sorted by j — row order
        # differs from the reference's bin-scan order (physics is order-
        # independent) and the ascending-j rows improve gather locality.
        # A row sort beats a (chunk x C) scatter by a wide margin on TPU.
        packed = jnp.where(mask, cand, sentinel_row)
        packed = jnp.sort(packed, axis=1)
        neigh = packed[:, :maxneighs]
        return neigh, nn

    starts = jnp.arange(0, nlocal_pad, chunk, dtype=jnp.int32)
    neighs, nns = jax.lax.map(chunk_fn, starts)
    neighbors = neighs.reshape(nlocal_pad, maxneighs)
    numneigh = nns.reshape(nlocal_pad)
    overflow = jnp.any(numneigh > maxneighs) | cl.overflow
    return NeighborList(neighbors=neighbors, numneigh=numneigh, overflow=overflow)


def derive_rowlists(
    nlist: NeighborList,
    nlocal_pad: int,
    nrows: int,  # coordinate row count (multiple of 16; last 16 rows
    # are pure sentinel so the padded row-id has no real atoms)
    rcap: int,  # packed-row list capacity (multiple of 8)
    chunk: int = 512,
):
    """Packed 16-atom-row lists per unit of 16 consecutive atoms,
    derived from the per-atom Verlet lists: unit u's list = the unique
    values of {j // 16} over its atoms' neighbor rows (plus u itself —
    intra-unit pairs). This is the TPU-fast verlet force layout
    (reference analogue: the gather-based SIMD kernel
    src/verletlist/force_lj-x86.c:21-112 — the x86 answer to per-atom
    lists is 8-wide gathers; the TPU answer is 16-atom packed-row
    gathers, because row gathers are ISSUE-bound at ~400M rows/s and
    per-atom 3-wide gathers cost 13M row issues at 131k = ~33 ms).

    The row lists are a SUPERSET of the per-atom lists at row
    granularity, so the force kernel's rsq < cutforce^2 mask computes
    exactly the same pair set as the planar per-atom path. Padding
    entries hold the sentinel row id (nrows/16 - 1, all-sentinel
    coordinates). Returns (rows (nu, rcap) int32, numrows (nu,),
    overflow)."""
    import numpy as _np

    neighbors, numneigh = nlist.neighbors, nlist.numneigh
    K = neighbors.shape[1]
    assert nrows % 16 == 0 and nlocal_pad % 16 == 0 and rcap % 8 == 0
    nu = nlocal_pad // 16
    sent16 = nrows // 16 - 1
    W = 16 * (K + 1)
    lane = jnp.arange(K, dtype=jnp.int32)[None, :]
    own = (jnp.arange(nlocal_pad, dtype=jnp.int32) // 16)[:, None]
    while nu % chunk != 0 and chunk > 1:
        chunk //= 2

    rows_all = jnp.where(
        lane < numneigh[:, None], neighbors // 16, sent16
    )
    rows_all = jnp.concatenate([rows_all, own], axis=1).reshape(nu, W)
    wpos = jnp.arange(W, dtype=jnp.int32)

    def chunk_fn(u0):
        us = u0 + jnp.arange(chunk, dtype=jnp.int32)
        r = rows_all[us]  # (chunk, W)
        s = jnp.sort(r, axis=1)
        # first occurrence of each distinct non-sentinel value
        first = jnp.concatenate(
            [jnp.ones((chunk, 1), bool), s[:, 1:] != s[:, :-1]], axis=1
        ) & (s != sent16)
        cnt = jnp.sum(first, axis=1).astype(jnp.int32)
        # compact uniques to the front (packed-key sort, same scheme as
        # derive_ilists: cumsum+scatter is ~4x slower on TPU)
        key = jnp.where(first, wpos, W + wpos)
        sk, sv = jax.lax.sort((key, s), num_keys=1, dimension=1,
                              is_stable=False)
        out = jnp.where(sk[:, :rcap] < W, sv[:, :rcap], sent16)
        return out, cnt

    starts = jnp.arange(0, nu, chunk, dtype=jnp.int32)
    outs, cnts = jax.lax.map(chunk_fn, starts)
    rows = outs.reshape(nu, rcap)
    numrows = cnts.reshape(nu)
    return rows, numrows, jnp.any(numrows > rcap)

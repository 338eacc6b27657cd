"""2-D multi-chip spatial domain decomposition (verlet scheme).

Extends parallel/verlet_domain.py's 1-D slabs to PENCILS over a 2-D
`jax.sharding.Mesh` (axes "dx", "dy"): each device owns
[0, wx) x [0, wy) x full z in a pencil-local frame. This is the
decomposition the 10M+-atom BASELINE configuration wants on pods where
one slab per chip would fall under the cutoff width.

All cross-chip traffic is `lax.ppermute` over the two mesh axes, and
every phase uses the STAGED-axis trick so diagonal neighbors never need
a dedicated exchange (reference's ghost machinery handles 6 faces / 12
edges / 8 corners explicitly, pbc.c:90-227; staging covers edges and
corners with two axis hops):

  migration:  x-hop, then y-hop (an atom that crossed a corner reaches
              the diagonal device in two hops; drift must stay under one
              pencil per rebuild, flagged)
  halo build: local z-ghosts (setup_pbc with pbc=(0,0,1)) ->
              x-face export (locals + z-ghosts) -> ppermute dx ->
              y-face export (locals + z-ghosts + the just-received
              x-ghosts) -> ppermute dy — the y export carrying x-ghosts
              is what covers the corner regions.
  each step:  re-gather both exports and re-permute (the reference's
              updatePbc with gathers crossing chips).

Per-device row layout:
  [0, acap)          locals (sentinel padded)
  [acap, +gcap)      local z-ghosts
  [+bxcap) [+bxcap)  x-ghosts from left / right neighbor
  [+bycap) [+bycap)  y-ghosts from down / up neighbor
  [last]             sentinel row
"""

from __future__ import annotations

import math
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mdbench_tpu.config import Params
from mdbench_tpu.models.lattice import create_fcc_lattice
from mdbench_tpu.ops.cells import build_cells, make_cell_grid
from mdbench_tpu.ops.lj import compute_force_lj_full
from mdbench_tpu.ops.pbc import setup_pbc, update_pbc
from mdbench_tpu.ops.verlet import (
    build_neighbors,
    compute_force_lj_rowlist,
    derive_rowlists_from_cells,
)
from mdbench_tpu.state import SENTINEL_COORD
from mdbench_tpu.thermo import adjust_thermo, adjusted_dtforce, setup_thermo

AX, AY = "dx", "dy"


class Domain2DResult(NamedTuple):
    temps: np.ndarray
    nlocal: np.ndarray
    overflow: np.ndarray
    total_time: float


class Domain2DSimulation:
    """LJ MD over a (px, py) pencil mesh with staged halo exchange."""

    def __init__(self, params: Params, px: int, py: int,
                 x: Optional[np.ndarray] = None,
                 v: Optional[np.ndarray] = None):
        self.params = params
        # EAM over the pencil mesh: planar two-pass force with the fp
        # ghost refresh staged exactly like the coordinate refresh
        # (local z, then x ppermute, then y ppermute carrying x-ghost
        # corners) — the 2-D analogue of force_eam.c:117-120.
        self.eam_dev = None
        self.eam_poly = None
        if params.force_field != 0:  # FF_EAM
            from mdbench_tpu.models.eam_tables import (
                apply_eam_overrides,
                fit_eam_poly,
                load_eam,
            )
            from mdbench_tpu.ops.eam import EamDevice, use_poly_eval

            if not params.eam_file:
                raise ValueError("force_field=eam requires eam_file")
            t = load_eam(params.eam_file)
            apply_eam_overrides(params, t)
            self.eam_dev = EamDevice.from_tables(t, params.dtype)
            if use_poly_eval(params):
                self.eam_poly = fit_eam_poly(t)
        self.px, self.py = px, py
        self.wx = params.xprd / px
        self.wy = params.yprd / py
        c = params.cutneigh
        assert self.wx >= c and self.wy >= c, (
            f"pencil {self.wx:.2f}x{self.wy:.2f} under cutneigh {c}"
        )
        if x is None:
            x, v, _ = create_fcc_lattice(params)
        self.natoms = x.shape[0]
        self.scales = setup_thermo(params, self.natoms)
        self.dtforce = adjusted_dtforce(params, self.scales)
        v = adjust_thermo(params, self.scales, v, self.natoms)

        per_dev = self.natoms / (px * py)
        self.acap = int(math.ceil(per_dev * 1.3 / 8)) * 8 + 8
        zfrac = 2 * c / params.zprd
        self.gcap = int(math.ceil(self.acap * zfrac * 1.8)) + 64
        # x export region: x-face strip of the z-extended pencil
        xfrac = (c / self.wx) * (1 + zfrac)
        self.bxcap = int(math.ceil(self.acap * xfrac * 1.8)) + 64
        # y export scans locals + z-ghosts + x-ghosts (x-extended pencil)
        yfrac = (c / self.wy) * ((self.wx + 2 * c) / self.wx) * (1 + zfrac)
        self.bycap = int(math.ceil(self.acap * yfrac * 1.8)) + 64
        self.migcap = int(math.ceil(self.acap * 0.2)) + 32
        vol = 4.0 / 3.0 * np.pi * c**3
        self.maxneighs = max(
            params.maxneighs, int(math.ceil(vol * params.rho * 1.3 / 8)) * 8
        )
        # per-device rowlist fast path (same scheme as verlet_domain);
        # EAM stays planar
        self._rowlist = self.eam_dev is None and (
            params.kernel == "rowlist"
            or (params.kernel == "auto"
                and jax.default_backend() == "tpu")
        )
        self._rl_backend = (
            "pallas"
            if jax.default_backend() == "tpu" and params.precision == "sp"
            else "xla"
        )
        self.rcap, self.ccap, self.ucl, self.ubr = 64, 128, 6, 8
        self.zw = 5  # z-run width (unit-column zspan + 2, + drift)
        # melted-probe calibration tightens the generous initials
        # before the timed run (parallel/common.apply_rowlist_caps)
        self._calibrated = False
        self._probe_state = None
        self._fix_row_layout()
        # bin capacity: 2.5x the mean — FCC lattice planes alias against
        # the bin boundaries, so some bins run well above the mean and the
        # domain engines have no grow-and-retry loop (the single-chip
        # engines do)
        _box = np.array([self.wx, self.wy, params.zprd])
        _nb = [max(1, int(_box[d] // params.cutneigh)) for d in range(3)]
        _mean = params.rho * (_box[0]/_nb[0]) * (_box[1]/_nb[1]) * (_box[2]/_nb[2])
        self.grid = make_cell_grid(
            _box, params.cutneigh, params.rho,
            capacity=int(math.ceil(_mean * 2.5 / 8.0)) * 8,
        )
        devs = np.array(jax.devices()[: px * py]).reshape(px, py)
        self.mesh = Mesh(devs, (AX, AY))
        self._xv_init = (x, v)
        self._init_host_state(x, v)

    def _fix_row_layout(self):
        from mdbench_tpu.parallel.common import align_acap, round16

        if self._rowlist:
            self.acap = align_acap(True, self._rl_backend, self.acap)
            self.gcap = round16(self.gcap)
            self.bxcap = round16(self.bxcap)
            self.bycap = round16(self.bycap)
        tail = 16 if self._rowlist else 1
        self.nrows = (
            self.acap + self.gcap + 2 * self.bxcap + 2 * self.bycap + tail
        )

    def _resort_dev(self, x, v, nloc):
        from mdbench_tpu.parallel.common import resort_by_cell

        return resort_by_cell(self.grid, x, v, nloc, self.acap)

    def _init_host_state(self, x, v):
        dtype = self.params.dtype
        dx = np.minimum((x[:, 0] / self.wx).astype(np.int64), self.px - 1)
        dy = np.minimum((x[:, 1] / self.wy).astype(np.int64), self.py - 1)
        xs = np.full(
            (self.px, self.py, self.nrows, 3), SENTINEL_COORD, np.float64
        )
        vs = np.zeros((self.px, self.py, self.acap, 3), np.float64)
        counts = np.zeros((self.px, self.py), np.int32)
        for i in range(self.px):
            for j in range(self.py):
                idx = np.nonzero((dx == i) & (dy == j))[0]
                n = len(idx)
                assert n <= self.acap, "initial pencil overflow"
                xs[i, j, :n] = x[idx] - np.array(
                    [i * self.wx, j * self.wy, 0.0]
                )
                vs[i, j, :n] = v[idx]
                counts[i, j] = n
        self.x0 = jnp.asarray(xs, dtype)
        self.v0 = jnp.asarray(vs, dtype)
        self.n0 = jnp.asarray(counts)

    # ---- per-device helpers (inside shard_map) ----------------------------

    def _perm(self, n, sign):
        return [(i, (i + sign) % n) for i in range(n)]

    def _migrate_axis(self, x, v, nloc, axis_name, ndev, width, dim):
        """One staged migration hop along one mesh axis (cf. the 1-D
        engine's _migrate, verlet_domain.py)."""
        acap, migcap = self.acap, self.migcap
        dtype = x.dtype
        rows = jnp.arange(acap, dtype=jnp.int32)
        live = rows < nloc
        xl = x[:acap]
        go_l = live & (xl[:, dim] < 0.0)
        go_r = live & (xl[:, dim] >= width)
        ovf_drift = jnp.any(
            live & ((xl[:, dim] < -width) | (xl[:, dim] >= 2 * width))
        )
        stay = live & ~go_l & ~go_r

        shift_vec = [0.0, 0.0, 0.0]

        def pack(mask, sgn):
            sv = list(shift_vec)
            sv[dim] = sgn * width
            pos = jnp.cumsum(mask) - 1
            cnt = jnp.sum(mask).astype(jnp.int32)
            pos = jnp.where(mask & (pos < migcap), pos, migcap)
            buf = jnp.full((migcap, 6), SENTINEL_COORD, dtype)
            payload = jnp.concatenate(
                [xl + jnp.asarray(sv, dtype), v[:acap]], axis=1
            )
            return buf.at[pos].set(payload, mode="drop"), cnt

        buf_l, cnt_l = pack(go_l, +1.0)
        buf_r, cnt_r = pack(go_r, -1.0)
        ovf = (cnt_l > migcap) | (cnt_r > migcap) | ovf_drift

        recv_from_right = jax.lax.ppermute(
            buf_l, axis_name, self._perm(ndev, -1)
        )
        recv_from_left = jax.lax.ppermute(
            buf_r, axis_name, self._perm(ndev, +1)
        )

        pos = jnp.cumsum(stay) - 1
        n_stay = jnp.sum(stay).astype(jnp.int32)
        pos = jnp.where(stay, pos, acap)
        x2 = jnp.full((acap, 3), SENTINEL_COORD, dtype)
        v2 = jnp.zeros((acap, 3), dtype)
        x2 = x2.at[pos].set(xl, mode="drop")
        v2 = v2.at[pos].set(v[:acap], mode="drop")

        def append(x2, v2, n, buf):
            valid = jnp.abs(buf[:, 0]) < SENTINEL_COORD * 0.5
            pos = jnp.cumsum(valid) - 1 + n
            cnt = jnp.sum(valid).astype(jnp.int32)
            pos = jnp.where(valid & (pos < acap), pos, acap)
            x2 = x2.at[pos].set(buf[:, 0:3], mode="drop")
            v2 = v2.at[pos].set(buf[:, 3:6], mode="drop")
            return x2, v2, n + cnt

        x2, v2, n2 = append(x2, v2, n_stay, recv_from_left)
        x2, v2, n2 = append(x2, v2, n2, recv_from_right)
        ovf = ovf | (n2 > acap)
        x_full = jnp.full((self.nrows, 3), SENTINEL_COORD, dtype)
        x_full = x_full.at[:acap].set(x2)
        return x_full, v2, n2, ovf

    def _pack_map(self, mask, row_ids, cap):
        pos = jnp.cumsum(mask) - 1
        cnt = jnp.sum(mask).astype(jnp.int32)
        pos = jnp.where(mask & (pos < cap), pos, cap)
        bm = jnp.full((cap,), self.nrows - 1, jnp.int32)
        return bm.at[pos].set(row_ids, mode="drop"), cnt

    def _build_halo(self, x, nloc):
        """z-ghosts + x/y export maps (staged; y maps cover x-ghosts)."""
        p = self.params
        c = p.cutneigh
        acap, gcap = self.acap, self.gcap
        rows = jnp.arange(acap, dtype=jnp.int32)
        live = (rows < nloc)[:, None]
        center = jnp.asarray(
            [self.wx / 2, self.wy / 2, p.zprd / 2], x.dtype
        )
        x_safe = x.at[:acap].set(jnp.where(live, x[:acap], center))
        halo = setup_pbc(
            x_safe, acap, acap, gcap,
            np.array([self.wx, self.wy, p.zprd]),
            (0, 0, p.pbc_z), c,
            sort_grid=self.grid if self._rowlist else None,
        )
        x = update_pbc(x, halo, acap)

        # x-face exports over locals + z-ghosts
        nxscan = acap + gcap
        xr = x[:nxscan]
        ids_x = jnp.arange(nxscan, dtype=jnp.int32)
        live_x = jnp.abs(xr[:, 0]) < SENTINEL_COORD * 0.5
        bxl, cl = self._pack_map(
            live_x & (xr[:, 0] < c), ids_x, self.bxcap
        )
        bxr, cr = self._pack_map(
            live_x & (xr[:, 0] >= self.wx - c), ids_x, self.bxcap
        )
        ovf = halo.overflow | (cl > self.bxcap) | (cr > self.bxcap)
        return x, halo, bxl, bxr, ovf

    def _exchange_x(self, x, bxl, bxr):
        dtype = x.dtype
        send_l = x[bxl] + jnp.asarray([self.wx, 0, 0], dtype)
        send_r = x[bxr] - jnp.asarray([self.wx, 0, 0], dtype)
        from_right = jax.lax.ppermute(send_l, AX, self._perm(self.px, -1))
        from_left = jax.lax.ppermute(send_r, AX, self._perm(self.px, +1))
        g0 = self.acap + self.gcap
        x = x.at[g0 : g0 + self.bxcap].set(from_left)
        x = x.at[g0 + self.bxcap : g0 + 2 * self.bxcap].set(from_right)
        return x

    def _build_y_maps(self, x):
        """y-face export maps AFTER x-ghosts landed (corner coverage)."""
        c = self.params.cutneigh
        nyscan = self.acap + self.gcap + 2 * self.bxcap
        xr = x[:nyscan]
        ids = jnp.arange(nyscan, dtype=jnp.int32)
        live = jnp.abs(xr[:, 0]) < SENTINEL_COORD * 0.5
        byd, cd = self._pack_map(live & (xr[:, 1] < c), ids, self.bycap)
        byu, cu = self._pack_map(
            live & (xr[:, 1] >= self.wy - c), ids, self.bycap
        )
        return byd, byu, (cd > self.bycap) | (cu > self.bycap)

    def _exchange_y(self, x, byd, byu):
        dtype = x.dtype
        send_d = x[byd] + jnp.asarray([0, self.wy, 0], dtype)
        send_u = x[byu] - jnp.asarray([0, self.wy, 0], dtype)
        from_up = jax.lax.ppermute(send_d, AY, self._perm(self.py, -1))
        from_down = jax.lax.ppermute(send_u, AY, self._perm(self.py, +1))
        g0 = self.acap + self.gcap + 2 * self.bxcap
        x = x.at[g0 : g0 + self.bycap].set(from_down)
        x = x.at[g0 + self.bycap : g0 + 2 * self.bycap].set(from_up)
        return x

    def _refresh_ghosts(self, x, halo, bxl, bxr, byd, byu):
        """Per-step ghost refresh: local z, then staged x, then y."""
        x = update_pbc(x, halo, self.acap)
        x = self._exchange_x(x, bxl, bxr)
        x = self._exchange_y(x, byd, byu)
        return x

    def _wrap_z(self, x, nloc):
        p = self.params
        rows = jnp.arange(x.shape[0])[:, None]
        live = rows < nloc
        cz = x[:, 2]
        cz = jnp.where(live[:, 0] & (cz < 0), cz + p.zprd, cz)
        cz = jnp.where(live[:, 0] & (cz >= p.zprd), cz - p.zprd, cz)
        return x.at[:, 2].set(cz)

    def _reneighbor_dev(self, x, v, nloc, with_stats: bool = False):
        x = self._wrap_z(x, nloc)
        x, v, nloc, ovf_mx = self._migrate_axis(
            x, v, nloc, AX, self.px, self.wx, 0
        )
        x, v, nloc, ovf_my = self._migrate_axis(
            x, v, nloc, AY, self.py, self.wy, 1
        )
        if self._rowlist:
            x, v = self._resort_dev(x, v, nloc)
        x, halo, bxl, bxr, ovf_g = self._build_halo(x, nloc)
        x = self._exchange_x(x, bxl, bxr)
        byd, byu, ovf_y = self._build_y_maps(x)
        x = self._exchange_y(x, byd, byu)
        cl = build_cells(self.grid, x)
        stats = None
        if self._rowlist:
            from mdbench_tpu.state import NeighborList

            rows, numrows, stats, rovf = derive_rowlists_from_cells(
                self.grid, cl, x, nloc, self.acap, self.rcap,
                self.params.cutneigh, brcap=self.ubr, ucol=self.ucl, zw=self.zw,
                ccap=self.ccap,
            )
            nlist = NeighborList(
                neighbors=rows, numneigh=numrows,
                overflow=cl.overflow | rovf,
            )
        else:
            nlist = build_neighbors(
                self.grid, cl, x, None, self.params.cutneigh**2,
                self.acap, self.acap, self.maxneighs, half=False,
            )
        ovf = jnp.stack(
            [ovf_mx | ovf_my, ovf_g, ovf_y, cl.overflow | nlist.overflow]
        )
        if with_stats:
            return x, v, nloc, halo, bxl, bxr, byd, byu, nlist, ovf, stats
        return x, v, nloc, halo, bxl, bxr, byd, byu, nlist, ovf

    # ---- the sharded run ---------------------------------------------------

    def _make_run_fn(self, ntimes: int):
        p = self.params
        dt, dtf = p.dt, self.dtforce
        every = p.reneigh_every
        n_int = max(ntimes // every, 1)
        mass, scales = p.mass, self.scales
        acap = self.acap

        def dev_body(x, v, nloc):
            from mdbench_tpu.state import NeighborList

            x, v, nloc = x[0, 0], v[0, 0], nloc[0, 0]
            rows = jnp.arange(acap, dtype=jnp.int32)

            def thermo(v, nloc):
                live = (rows < nloc)[:, None]
                vsq = jnp.sum(jnp.where(live, v * v, 0.0)) * mass
                vsq = jax.lax.psum(vsq, (AX, AY))
                return vsq * scales.t_scale

            def integrate1(x, v, f, nloc):
                live = (rows < nloc)[:, None]
                v = jnp.where(live, v + dtf * f, v)
                x = x.at[:acap].set(
                    jnp.where(live, x[:acap] + dt * v, x[:acap])
                )
                return x, v

            def force(x, nlist, halo, bxl, bxr, byd, byu):
                if self.eam_dev is not None:
                    def fp_exchange(fp):
                        # staged fp refresh mirrors _refresh_ghosts:
                        # local z gather, then x/y ppermutes (no shift —
                        # fp is translation invariant)
                        fp = fp.at[acap : acap + self.gcap].set(
                            fp[halo.border_map]
                        )
                        fr = jax.lax.ppermute(
                            fp[bxl], AX, self._perm(self.px, -1)
                        )
                        fl = jax.lax.ppermute(
                            fp[bxr], AX, self._perm(self.px, +1)
                        )
                        g0 = acap + self.gcap
                        fp = fp.at[g0 : g0 + self.bxcap].set(fl)
                        fp = fp.at[
                            g0 + self.bxcap : g0 + 2 * self.bxcap
                        ].set(fr)
                        fu = jax.lax.ppermute(
                            fp[byd], AY, self._perm(self.py, -1)
                        )
                        fd = jax.lax.ppermute(
                            fp[byu], AY, self._perm(self.py, +1)
                        )
                        g1 = g0 + 2 * self.bxcap
                        fp = fp.at[g1 : g1 + self.bycap].set(fd)
                        fp = fp.at[
                            g1 + self.bycap : g1 + 2 * self.bycap
                        ].set(fu)
                        return fp

                    from mdbench_tpu.ops.eam import (
                        compute_force_eam,
                        compute_force_eam_poly,
                    )

                    if self.eam_poly is not None:
                        f, _fp = compute_force_eam_poly(
                            x, nlist.neighbors, nlist.numneigh,
                            halo.border_map, acap, acap,
                            p.cutforce**2, self.eam_dev, self.eam_poly,
                            fp_exchange=fp_exchange,
                        )
                    else:
                        f, _fp = compute_force_eam(
                            x, nlist.neighbors, nlist.numneigh,
                            halo.border_map, acap, acap,
                            p.cutforce**2, self.eam_dev,
                            fp_exchange=fp_exchange,
                        )
                    return f
                if self._rowlist:
                    return compute_force_lj_rowlist(
                        x, nlist.neighbors, acap, p.cutforce**2,
                        p.sigma6, p.epsilon, backend=self._rl_backend,
                        approx_rcp=p.approx_rcp,
                    )
                return compute_force_lj_full(
                    x, nlist.neighbors, nlist.numneigh, acap,
                    p.cutforce**2, p.sigma6, p.epsilon,
                )

            def plain_scan(carry, n):
                # lean scan carry: only (x, v, f) is mutable between
                # rebuilds; per-step thermo (a psum collective) only
                # when dense_thermo asks (engine_cluster._plain_scan)
                x0, v0, f0, nloc, halo, bxl, bxr, byd, byu, nlist, ovf = carry
                live = (rows < nloc)[:, None]

                def body(mv, _):
                    x, v, f = mv
                    x, v = integrate1(x, v, f, nloc)
                    x = self._refresh_ghosts(x, halo, bxl, bxr, byd, byu)
                    f = force(x, nlist, halo, bxl, bxr, byd, byu)
                    v = jnp.where(live, v + dtf * f, v)
                    if p.dense_thermo:
                        t = thermo(v, nloc)
                    else:
                        t = jnp.zeros((), v.dtype)
                    return (x, v, f), t

                (x, v, f), ts = jax.lax.scan(
                    body, (x0, v0, f0), None, length=n
                )
                return (
                    x, v, f, nloc, halo, bxl, bxr, byd, byu, nlist, ovf
                ), ts

            def reneigh_step(carry):
                x, v, f, nloc, halo, bxl, bxr, byd, byu, nlist, ovf = carry
                x, v = integrate1(x, v, f, nloc)
                x, v, nloc, halo, bxl, bxr, byd, byu, nlist, ovf2 = (
                    self._reneighbor_dev(x, v, nloc)
                )
                f = force(x, nlist, halo, bxl, bxr, byd, byu)
                live = (rows < nloc)[:, None]
                v = jnp.where(live, v + dtf * f, v)
                t = thermo(v, nloc)
                return (
                    x, v, f, nloc, halo, bxl, bxr, byd, byu, nlist,
                    ovf | ovf2,
                ), t

            def interval(carry, _):
                carry, ts = plain_scan(carry, every - 1)
                carry, t_last = reneigh_step(carry)
                return carry, jnp.concatenate([ts, t_last[None]])

            x, v, nloc, halo, bxl, bxr, byd, byu, nlist, ovf = (
                self._reneighbor_dev(x, v, nloc)
            )
            f = force(x, nlist, halo, bxl, bxr, byd, byu)
            carry = (x, v, f, nloc, halo, bxl, bxr, byd, byu, nlist, ovf)
            carry, temps = jax.lax.scan(interval, carry, None, length=n_int)
            x, v, nloc, ovf = carry[0], carry[1], carry[3], carry[10]
            return (
                x[None, None],
                v[None, None],
                nloc[None, None],
                jnp.any(ovf)[None, None],
                temps.reshape(1, 1, -1),
            )

        spec = P(AX, AY)
        sharded = jax.shard_map(
            dev_body, mesh=self.mesh,
            in_specs=(spec, spec, spec),
            out_specs=(spec,) * 5,
            check_vma=False,
        )
        return jax.jit(sharded)


    def _grow_and_reinit(self):
        self.acap = (int(self.acap * 1.4) + 39) // 8 * 8
        self.gcap = int(self.gcap * 1.4) + 32
        self.bxcap = int(self.bxcap * 1.4) + 32
        self.bycap = int(self.bycap * 1.4) + 32
        self.migcap = int(self.migcap * 1.4) + 32
        self.maxneighs = (int(self.maxneighs * 1.4) + 7) // 8 * 8
        self.rcap = int(self.rcap * 1.6 + 7) // 8 * 8
        self.ccap = int(self.ccap * 1.5 + 7) // 8 * 8
        self.ucl += 2
        self.zw += 1
        self.ubr += 8
        self._fix_row_layout()
        self.grid = self.grid._replace(
            capacity=int(self.grid.capacity * 1.5 + 7) // 8 * 8
        )
        self._init_host_state(*self._xv_init)

    def _calibrate(self, ntimes: int, _retry: int = 4) -> None:
        """One-shot cap calibration on MELTED data — the same probe-
        interval protocol as the 1-D slab engine (verlet_domain.py
        _calibrate), with the cap-setting hoisted into parallel/common
        (apply_rowlist_caps / calibrated_block_cap) so the margins
        cannot drift between the engines. Pencil-specific extras: the
        staged x/y export caps are calibrated from the observed
        non-sentinel export-map occupancy."""
        if self._calibrated or not self._rowlist:
            return
        self._calibrated = True
        every = self.params.reneigh_every
        if ntimes < every:
            return
        self._run_raw(every, _retry=_retry)
        xs, vs, nlocs = self._probe_state
        spec = P(AX, AY)
        sent = self.nrows - 1

        def observe_dev(x, v, nloc):
            out = self._reneighbor_dev(
                x[0, 0], v[0, 0], nloc[0, 0], with_stats=True
            )
            halo, bxl, bxr, byd, byu, nlist, stats = (
                out[3], out[4], out[5], out[6], out[7], out[8], out[10]
            )
            nbx = jnp.maximum(
                jnp.sum(bxl != sent), jnp.sum(bxr != sent)
            ).astype(jnp.int32)
            nby = jnp.maximum(
                jnp.sum(byd != sent), jnp.sum(byu != sent)
            ).astype(jnp.int32)
            return (
                nlist.numneigh[None, None], stats[None, None],
                halo.nghost[None, None], nbx[None, None], nby[None, None],
            )

        obs = jax.jit(jax.shard_map(
            observe_dev, mesh=self.mesh,
            in_specs=(spec, spec, spec), out_specs=(spec,) * 5,
            check_vma=False,
        ))
        nr, st, ng, nbx, nby = obs(xs, vs, nlocs)
        from mdbench_tpu.parallel.common import (
            apply_rowlist_caps,
            calibrated_block_cap,
        )

        ndev = self.px * self.py
        apply_rowlist_caps(
            self, np.asarray(nr).reshape(ndev, -1),
            np.asarray(st).reshape(ndev, -1),
        )
        self.gcap = calibrated_block_cap(int(np.asarray(ng).max()), 128)
        self.bxcap = calibrated_block_cap(int(np.asarray(nbx).max()), 64)
        self.bycap = calibrated_block_cap(int(np.asarray(nby).max()), 64)
        self._fix_row_layout()
        self._init_host_state(*self._xv_init)

    def run(self, ntimes: Optional[int] = None,
            _retry: int = 6) -> Domain2DResult:
        ntimes = self.params.ntimes if ntimes is None else ntimes
        self._calibrate(ntimes)
        return self._run_raw(ntimes, _retry=_retry)

    def _run_raw(self, ntimes: int, _retry: int = 6) -> Domain2DResult:
        run_fn = self._make_run_fn(ntimes)
        # AOT-compile outside the timed region (same wall-clock protocol
        # as the single-chip engines)
        run_fn = run_fn.lower(self.x0, self.v0, self.n0).compile()
        if jax.default_backend() == "tpu":
            # warm-up execution: the first run of a compiled program
            # carries 1-2 s of server-side warm-up on the tunnel
            warm = run_fn(self.x0, self.v0, self.n0)
            _ = float(jnp.ravel(warm[-1])[0])
            del warm
        t0 = time.perf_counter()
        x, v, nloc, ovf, temps = run_fn(self.x0, self.v0, self.n0)
        _fence = float(jnp.ravel(temps)[0])
        total = time.perf_counter() - t0
        nloc_h = np.asarray(nloc)
        ovf = np.asarray(ovf)
        if ovf.any():
            if _retry > 0:
                self._grow_and_reinit()
                return self._run_raw(ntimes, _retry=_retry - 1)
            raise RuntimeError("2-D domain capacity overflow")
        # melted device state for the calibration observe pass
        self._probe_state = (x, v, nloc)
        return Domain2DResult(
            temps=np.asarray(temps[0, 0]).reshape(-1),
            nlocal=nloc_h, overflow=ovf, total_time=total,
        )

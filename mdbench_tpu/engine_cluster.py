"""Cluster-pair scheme simulation engine (reference: src/clusterpair/
main.c) — same driver-loop semantics as engine.Simulation but all state
lives in cluster layout between reneighbor events:

  reneighbor (every reneigh_every steps, all on device):
    scatter cluster state -> flat atoms -> wrap -> re-sort -> re-chop
    into clusters -> cluster ghosts -> bin clusters -> pair lists
  every step:
    integrate cluster planes -> refresh ghost planes -> Pallas force
    kernel -> integrate -> thermo

The reference's updateSingleAtoms/buildClusters/defineJClusters/
setupPbc/binClusters/buildNeighbor pipeline (clusterpair/main.c:78-93)
maps 1:1 onto the device phases above.
"""

from __future__ import annotations

import math
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mdbench_tpu.config import FF_EAM, FF_LJ, Params
from mdbench_tpu.models.lattice import create_fcc_lattice
from mdbench_tpu.ops.cluster import (
    ClusterGrid,
    ClusterHalo,
    ClusterPairList,
    Clusters,
    attach_bucket_maps,
    bin_clusters,
    build_cluster_pairs,
    build_clusters,
    compute_bboxes,
    derive_ilists,
    make_cluster_grid,
    make_j16_bboxes,
    plan_capacity_buckets,
    refresh_pair_ranges,
    setup_cluster_pbc,
    update_cluster_pbc,
)
from mdbench_tpu.ops.pallas.lj_cluster import (
    lj_cluster_force_ilist_pallas,
    lj_cluster_force_pallas_stream,
    lj_cluster_force_xla,
    lj_cluster_force_xla_half,
    lj_cluster_force_xla_ilist,
)
from mdbench_tpu.state import SENTINEL_COORD
from mdbench_tpu.thermo import ThermoScales, adjust_thermo, adjusted_dtforce, setup_thermo

GROUP = 16  # i-clusters per shared j-list == kernel group size


class CStepState(NamedTuple):
    clusters: Clusters
    vxc: jnp.ndarray  # (n_clusters_pad, 8)
    vyc: jnp.ndarray
    vzc: jnp.ndarray
    fxc: jnp.ndarray
    fyc: jnp.ndarray
    fzc: jnp.ndarray
    halo: ClusterHalo
    pairs: ClusterPairList
    overflow: jnp.ndarray


class CRunResult(NamedTuple):
    temps: np.ndarray
    press: np.ndarray
    state: CStepState
    total_time: float


def _kernel_mode(params: Params) -> str:
    """Resolve the kernel axis. "auto" -> the exact-list path everywhere
    (measured fastest by a wide margin on TPU, PERF.md round 2): the
    Pallas single-pass form on TPU, the fused-XLA twin on CPU (Pallas
    interpret mode is an emulator, not a fast path)."""
    if params.kernel == "auto":
        on_cpu = jax.devices()[0].platform == "cpu"
        if not on_cpu and params.precision == "dp":
            # f64 does not lower through Mosaic (convert recursion in
            # pallas lowering); DP on an accelerator runs the fused-XLA
            # twin (DP is the CPU-parity axis — cli.py already warns)
            return "ilist"
        return "ilist" if on_cpu else "ilist_pl"
    return params.kernel


def _use_pallas(params: Params) -> bool:
    return _kernel_mode(params) == "pallas"


class ClusterSimulation:
    def __init__(
        self,
        params: Params,
        x: Optional[np.ndarray] = None,
        v: Optional[np.ndarray] = None,
        adjust: Optional[bool] = None,
        types: Optional[np.ndarray] = None,
        tables: Optional[tuple] = None,  # (eps, sig6, cutsq) (T,T) arrays
    ):
        self.params = params
        self._force_reps = 1  # cli --timers diff sets 2 (in-loop timing)
        # EAM on the cluster scheme (the reference's clusterpair EAM is
        # a dead stub, force_eam.c:20-37 — this axis EXCEEDS it): same
        # exact ilists as LJ, two-pass force with polynomial pair
        # evaluation (ops/eam_cluster). Overrides land BEFORE the
        # lattice is generated, like engine.Simulation.
        self.eam_tables = None
        self.eam_dev = None
        self.eam_poly = None
        if params.force_field == FF_EAM:
            from mdbench_tpu.models.eam_tables import (
                apply_eam_overrides,
                fit_eam_poly,
                load_eam,
            )

            if not params.eam_file:
                raise ValueError("force_field=eam requires eam_file")
            if params.half_neigh:
                raise ValueError(
                    "cluster-scheme EAM supports full neighbor lists only"
                )
            if params.eam_eval == "spline":
                raise ValueError(
                    "cluster-scheme EAM is polynomial-evaluation only "
                    "(eam_eval=auto|poly); the spline parity axis runs "
                    "on the verlet scheme"
                )
            self.eam_tables = load_eam(params.eam_file)
            apply_eam_overrides(params, self.eam_tables)
            self.eam_poly = fit_eam_poly(self.eam_tables)
        if x is None and params.input_file:
            from mdbench_tpu.io.readers import read_atom

            r = read_atom(params)
            x, v = r.x, r.v
            if r.ntypes > 1 and types is None:
                types = r.types
            if adjust is None:
                adjust = False
        if x is None:
            x, v, _ = create_fcc_lattice(params)
            if adjust is None:
                adjust = True
        self.natoms = self.nlocal = x.shape[0]
        # EXPLICIT_TYPES tables (reference clusterpair/atom.c:78-92): the
        # reference fills every pair slot with the single param
        # epsilon/sigma; custom tables can be injected for tests
        self.ntypes = int(params.ntypes)
        if types is None:
            types = np.zeros(self.nlocal, np.int32)
        self._types0 = np.asarray(types, np.int32)
        nt_seen = int(self._types0.max()) + 1 if self.nlocal else 1
        self.ntypes = max(self.ntypes, nt_seen)
        if tables is None and self.ntypes > 1:
            nt = self.ntypes
            tables = (
                np.full((nt, nt), params.epsilon),
                np.full((nt, nt), params.sigma6),
                np.full((nt, nt), params.cutforce**2),
            )
        self.type_tables = (
            tuple(np.asarray(t, np.float64) for t in tables)
            if tables is not None else None
        )
        self.scales: ThermoScales = setup_thermo(params, self.natoms)
        self.dtforce = adjusted_dtforce(params, self.scales)
        if adjust:
            v = adjust_thermo(params, self.scales, v, self.natoms)

        prd = np.array([params.xprd, params.yprd, params.zprd])
        self.prd = prd
        self.grid: ClusterGrid = make_cluster_grid(
            prd, params.cutneigh, params.rho, GROUP
        )

        # host capacity estimates (grown on overflow)
        ncx, ncy = self.grid.col_dims
        sx, sy = self.grid.col_size
        cx = np.clip((x[:, 0] / sx).astype(np.int64), 0, ncx - 1)
        cy = np.clip((x[:, 1] / sy).astype(np.int64), 0, ncy - 1)
        counts = np.bincount(cx * ncy + cy, minlength=ncx * ncy)
        cl_per_col = np.ceil(np.ceil(counts / 8.0) / GROUP) * GROUP
        n_clusters = int(cl_per_col.sum())
        blk = 8 * GROUP  # kernel writes 8 groups per output block
        self.n_clusters_pad = (int(n_clusters * 1.08) + blk) // blk * blk
        gc = (
            int(
                self.n_clusters_pad
                * ((1 + 2 * params.cutneigh / prd[0])
                   * (1 + 2 * params.cutneigh / prd[1])
                   * (1 + 2 * params.cutneigh / prd[2]) - 1.0)
                * 1.6
            )
            + 64
        )
        self.ghost_cap = (gc + 1) // 2 * 2  # even: rows pair into j16
        # per-group j-list capacity from dilated group-bbox volume
        zspan = GROUP * 8 / (sx * sy * params.rho)
        vol = (
            (sx + 2 * params.cutneigh + sx)
            * (sy + 2 * params.cutneigh + sy)
            * (zspan + 2 * params.cutneigh + 2.0)
        )
        L = int(math.ceil(vol * params.rho / 16.0 * 1.45 / 8.0)) * 8
        self.list_cap = max(32, L)
        # per-i-cluster exact-list capacity (kernel="ilist"): atoms in a
        # cutneigh sphere dilated by typical cluster half-extents, /16
        # per j16 cluster, with headroom; calibrated down after the
        # first build and grown on overflow like every other capacity
        self._kmode = _kernel_mode(params)
        self._ilist = (
            self._kmode in ("ilist", "ilist_pl") and not params.half_neigh
        )
        if self.eam_tables is not None and not self._ilist:
            raise ValueError(
                "cluster-scheme EAM runs on the exact-list kernels only "
                "(kernel=auto|ilist|ilist_pl)"
            )
        # bf16 derive prune (rigorous-superset lists; SP only — in DP
        # the exact f32/f64 prune IS the parity semantics)
        self._derive_bf16 = bool(
            params.derive_bf16 and params.precision == "sp"
        )
        # capacity buckets for the Pallas exact-list force (set by
        # _calibrate_list_cap once the nji distribution is known):
        # (sizes_in_units, caps) or None for the flat-capacity path
        self.buckets = None
        # i-clusters sharing one exact list (derive_ilists share):
        # measured on TPU, share=2 halves the row-issue-bound gather at
        # an identical padded-pair count (z-adjacent i-clusters overlap
        # almost completely in neighbors)
        self.ishare = (
            params.ishare if params.ishare else (2 if self._ilist else 1)
        )
        if not self._ilist:
            self.ishare = 1
        zsp = 8.0 / (sx * sy * params.rho)  # one i-cluster's z-extent
        r_eff = (
            params.cutneigh + 0.5 * max(sx, sy) + 1.2
            + (self.ishare - 1) * 0.5 * zsp
        )
        self.icap = max(
            16,
            int(math.ceil(4.19 * r_eff**3 * params.rho / 16.0 * 1.35 / 8.0))
            * 8,
        )

        self._x0 = x
        self._v0 = v
        self._build_device_state()

    def _build_device_state(self):
        dtype = self.params.dtype
        nrows = self.nlocal + 1
        xf = np.full((nrows, 3), SENTINEL_COORD, np.float64)
        xf[: self.nlocal] = self._x0
        vf = np.zeros((nrows, 3), np.float64)
        vf[: self.nlocal] = self._v0
        self.x_flat0 = jnp.asarray(xf, dtype)
        self.v_flat0 = jnp.asarray(vf, dtype)
        self.types_flat0 = (
            jnp.asarray(self._types0) if self.type_tables is not None
            else None
        )
        if self.type_tables is not None:
            self._tables_jnp = tuple(
                jnp.asarray(t, dtype) for t in self.type_tables
            )
            self._tables_static = tuple(
                tuple(map(tuple, np.asarray(t, np.float64)))
                for t in self.type_tables
            )
        if self.eam_tables is not None:
            from mdbench_tpu.ops.eam import EamDevice

            self.eam_dev = EamDevice.from_tables(self.eam_tables, dtype)
        self.interpret = jax.devices()[0].platform == "cpu"

    # -- device phases ----------------------------------------------------

    def _wrap_flat(self, x_flat):
        prd = jnp.asarray(self.prd, x_flat.dtype)
        xl = x_flat[: self.nlocal]
        xl = jnp.where(xl < 0.0, xl + prd, xl)
        xl = jnp.where(xl >= prd, xl - prd, xl)
        return x_flat.at[: self.nlocal].set(xl)

    def _reneighbor_from_flat(self, x_flat, v_flat):
        # named scope = LIKWID "reneighbour" region (SURVEY §5.1): shows
        # as a span in jax.profiler/xprof traces of the compiled step
        with jax.named_scope("reneighbor"):
            return self._reneighbor_from_flat_inner(x_flat, v_flat)

    def _reneighbor_from_flat_inner(self, x_flat, v_flat):
        p = self.params
        x_flat = self._wrap_flat(x_flat)
        clusters, ovf_c = build_clusters(
            self.grid, x_flat, self.nlocal, self.n_clusters_pad,
            self.ghost_cap, group=GROUP, types=self.types_flat0,
        )
        aid = clusters.atom_id
        valid = aid >= 0
        a = jnp.clip(aid, 0, self.nlocal - 1)
        zeros = jnp.zeros_like(clusters.xc[: self.n_clusters_pad])
        vxc = jnp.where(valid, v_flat[a, 0], zeros)
        vyc = jnp.where(valid, v_flat[a, 1], zeros)
        vzc = jnp.where(valid, v_flat[a, 2], zeros)

        halo = setup_cluster_pbc(
            clusters, self.n_clusters_pad, self.n_clusters_pad,
            self.ghost_cap, self.prd, (p.pbc_x, p.pbc_y, p.pbc_z), p.cutneigh,
        )
        clusters = update_cluster_pbc(
            clusters, halo, self.n_clusters_pad, update_bbox=True
        )
        bbox16 = make_j16_bboxes(clusters.bbox)
        cells, bb_cells, (ovf_bcap, ovf_zext) = bin_clusters(
            self.grid, bbox16
        )
        pairs = build_cluster_pairs(
            self.grid, cells, bb_cells, clusters.bbox,
            self.n_clusters_pad, GROUP, self.list_cap,
            need_ranges=not self._ilist,
        )
        if self._ilist:
            pairs = derive_ilists(
                clusters, pairs, self.n_clusters_pad, GROUP,
                p.cutneigh, self.icap, share=self.ishare,
                bf16=self._derive_bf16,
            )
            if self.buckets is not None:
                pairs = attach_bucket_maps(
                    pairs, self.n_clusters_pad, self.ishare,
                    clusters.xc.shape[0], *self.buckets,
                )
        iovf = pairs.iovf if pairs.iovf is not None else jnp.asarray(False)
        # selective overflow flags -> targeted growth in run()
        ovf = jnp.stack([
            ovf_c, halo.overflow, ovf_bcap, ovf_zext,
            pairs.overflow[0], pairs.overflow[1], iovf,
        ])
        return clusters, (vxc, vyc, vzc), halo, pairs, ovf

    def _flatten(self, state: CStepState):
        """Gather cluster state back to flat atom arrays via the inverse
        map (reference updateSingleAtoms, neighbor.c:1023-1049; gather
        instead of scatter — 2-D scatters are pathological on TPU).
        (A/B note: packing all six planes into one (n, 6) row gather
        measured SLOWER than six element gathers — the narrow stack
        relayout costs more than the saved gather issues.)"""
        inv = state.clusters.inv_map  # (nlocal,) -> cluster*8+slot
        nrows = self.nlocal + 1
        dtype = state.clusters.xc.dtype

        def gath(plane_x, plane_y, plane_z):
            out = jnp.full((nrows, 3), SENTINEL_COORD, dtype)
            vals = jnp.stack(
                [
                    plane_x[: self.n_clusters_pad].reshape(-1)[inv],
                    plane_y[: self.n_clusters_pad].reshape(-1)[inv],
                    plane_z[: self.n_clusters_pad].reshape(-1)[inv],
                ],
                axis=1,
            )
            return out.at[: self.nlocal].set(vals)

        x_flat = gath(state.clusters.xc, state.clusters.yc, state.clusters.zc)
        v_flat = gath(state.vxc, state.vyc, state.vzc).at[self.nlocal].set(0.0)
        return x_flat, v_flat

    def _force_from(self, clusters: Clusters, pairs: ClusterPairList,
                    halo: ClusterHalo):
        with jax.named_scope("force"):  # LIKWID "force" region analogue
            return self._force_from_inner(clusters, pairs, halo)

    def _force_from_inner(self, clusters: Clusters, pairs: ClusterPairList,
                          halo: ClusterHalo):
        p = self.params
        cutsq = p.cutforce**2
        typed = self.type_tables is not None
        if self.eam_tables is not None:
            assert not typed, "cluster EAM is single-type (funcfl)"
            if self._kmode == "ilist_pl":
                from mdbench_tpu.ops.pallas.eam_cluster import (
                    eam_cluster_force_pallas,
                )

                bucketed = (
                    self.buckets is not None and pairs.bijlist is not None
                )
                fx, fy, fz, _fp = eam_cluster_force_pallas(
                    clusters.xc, clusters.yc, clusters.zc, pairs.ijlist,
                    halo.border_map, self.n_clusters_pad, cutsq,
                    self.eam_dev, self.eam_poly, share=self.ishare,
                    interpret=self.interpret,
                    buckets=self.buckets if bucketed else None,
                    bpairs=(
                        (pairs.bijlist, pairs.bcrows, pairs.binv)
                        if bucketed else None
                    ),
                )
            else:
                from mdbench_tpu.ops.eam_cluster import (
                    eam_cluster_force_xla,
                )

                fx, fy, fz, _fp = eam_cluster_force_xla(
                    clusters.xc, clusters.yc, clusters.zc, pairs.ijlist,
                    halo.border_map, self.n_clusters_pad, cutsq,
                    self.eam_dev, self.eam_poly, share=self.ishare,
                )
            return fx, fy, fz
        if p.half_neigh:
            # Newton half-pair axis (reference param.half_neigh,
            # clusterpair/force_lj.c:167-431): XLA kernel — the Newton
            # scatter is the anti-pattern the Pallas full kernel avoids,
            # so half runs on the XLA path on every backend (PERF.md)
            return lj_cluster_force_xla_half(
                clusters.xc, clusters.yc, clusters.zc, pairs.jlist,
                self.n_clusters_pad, GROUP, cutsq, p.sigma6, p.epsilon,
                tc=clusters.tc if typed else None,
                tables=self._tables_jnp if typed else None,
            )
        if self._ilist:
            if self._kmode == "ilist_pl":
                if not typed:
                    if (self.buckets is not None
                            and pairs.bijlist is not None):
                        return self._force_buckets(clusters, pairs, cutsq)
                    return lj_cluster_force_ilist_pallas(
                        clusters.xc, clusters.yc, clusters.zc,
                        pairs.ijlist, self.n_clusters_pad, cutsq,
                        p.sigma6, p.epsilon, share=self.ishare,
                        interpret=self.interpret,
                        approx_rcp=p.approx_rcp,
                    )
                return lj_cluster_force_ilist_pallas(
                    clusters.xc, clusters.yc, clusters.zc, pairs.ijlist,
                    self.n_clusters_pad, cutsq, p.sigma6, p.epsilon,
                    share=self.ishare, interpret=self.interpret,
                    approx_rcp=p.approx_rcp,
                    tc=clusters.tc, tables=self._tables_static,
                )
            return lj_cluster_force_xla_ilist(
                clusters.xc, clusters.yc, clusters.zc, pairs.ijlist,
                self.n_clusters_pad, cutsq, p.sigma6, p.epsilon,
                tc=clusters.tc if typed else None,
                tables=self._tables_jnp if typed else None,
                share=self.ishare,
            )
        if _use_pallas(p):
            # "pallas" -> streaming group-window kernel (j-tiles
            # pre-gathered per step, zero in-kernel dynamic slices).
            # Round-3 hardware A/B at 131k (PERF.md): stream 5.31 ms vs
            # dynamic-slice twin 6.23 and MXU-reduction twin 12.2 —
            # the losing twins were deleted; the exact-list kernels
            # (ilist*) beat all group-window forms by >2x and are the
            # default.
            return lj_cluster_force_pallas_stream(
                clusters.xc, clusters.yc, clusters.zc, pairs.jlist,
                pairs.ranges, self.n_clusters_pad, GROUP, cutsq,
                p.sigma6, p.epsilon, interpret=self.interpret,
                tc=clusters.tc if typed else None,
                tables=self._tables_static if typed else None,
            )
        return lj_cluster_force_xla(
            clusters.xc, clusters.yc, clusters.zc, pairs.jlist,
            self.n_clusters_pad, GROUP, cutsq, p.sigma6, p.epsilon,
            tc=clusters.tc if typed else None,
            tables=self._tables_jnp if typed else None,
        )

    def _force_buckets(self, clusters: Clusters, pairs: ClusterPairList,
                       cutsq: float):
        """Capacity-bucketed exact-list force: units run in nji-sorted
        order through one capacity-matched Pallas kernel per bucket
        (smallest caps first), then the output rows gather back through
        the inverse map. Cuts padded pairs ~25% vs the flat cap (heated
        nji: tight bulk ~31-34 with a low tail, flat cap 48)."""
        p = self.params
        share = self.ishare
        sizes, caps = self.buckets
        xc, yc, zc = clusters.xc, clusters.yc, clusters.zc
        # PACKED permutation gathers: row gathers are ISSUE-bound and
        # narrow 8-wide rows gather poorly (r4 probe: three (npad, 8)
        # binv gathers measured 0.50 ms/step; one 24-wide packed gather
        # is ~5x cheaper) — same lesson as gather_ilist_rows, applied to
        # the bucket permutation on BOTH ends of the force
        xiP3 = jnp.concatenate([xc, yc, zc], axis=1)[pairs.bcrows]
        xiP = xiP3[:, 0:8]
        yiP = xiP3[:, 8:16]
        ziP = xiP3[:, 16:24]
        fxs, fys, fzs = [], [], []
        off = 0
        for n_k, c_k in zip(sizes, caps):
            if c_k == 0:
                # structurally-empty units (zero_tier): no kernel
                z = jnp.zeros((n_k * share, 8), xc.dtype)
                fxs.append(z)
                fys.append(z)
                fzs.append(z)
                off += n_k
                continue
            r0, r1 = off * share, (off + n_k) * share
            fxk, fyk, fzk = lj_cluster_force_ilist_pallas(
                xc, yc, zc, pairs.bijlist[off : off + n_k, :c_k],
                n_k * share, cutsq, p.sigma6, p.epsilon,
                share=share, interpret=self.interpret,
                approx_rcp=p.approx_rcp,
                xi=(xiP[r0:r1], yiP[r0:r1], ziP[r0:r1]),
            )
            fxs.append(fxk)
            fys.append(fyk)
            fzs.append(fzk)
            off += n_k
        inv = pairs.binv
        f3 = jnp.concatenate(
            [jnp.concatenate(fxs, axis=0), jnp.concatenate(fys, axis=0),
             jnp.concatenate(fzs, axis=0)],
            axis=1,
        )[inv]
        return f3[:, 0:8], f3[:, 8:16], f3[:, 16:24]

    # -- stepping ----------------------------------------------------------

    def _plain_step(self, state: CStepState, _):
        p = self.params
        dt, dtf = p.dt, self.dtforce
        vxc = state.vxc + dtf * state.fxc
        vyc = state.vyc + dtf * state.fyc
        vzc = state.vzc + dtf * state.fzc
        cl = state.clusters
        xc = cl.xc.at[: self.n_clusters_pad].add(dt * vxc)
        yc = cl.yc.at[: self.n_clusters_pad].add(dt * vyc)
        zc = cl.zc.at[: self.n_clusters_pad].add(dt * vzc)
        cl = cl._replace(xc=xc, yc=yc, zc=zc)
        cl = update_cluster_pbc(cl, state.halo, self.n_clusters_pad, False)
        fxc, fyc, fzc = self._force_from(cl, state.pairs, state.halo)
        vxc = vxc + dtf * fxc
        vyc = vyc + dtf * fyc
        vzc = vzc + dtf * fzc
        if p.dense_thermo:
            t, pr = self._thermo(vxc, vyc, vzc)
        else:
            t = pr = jnp.zeros((), vxc.dtype)
        return (
            state._replace(
                clusters=cl, vxc=vxc, vyc=vyc, vzc=vzc,
                fxc=fxc, fyc=fyc, fzc=fzc,
            ),
            (t, pr),
        )

    def _plain_scan(self, state: CStepState, n: int):
        """Scan n plain steps carrying ONLY the nine mutable planes
        (coords, velocities, forces). The pair lists, halo map, bbox,
        and id tables are invariant between rebuilds; keeping them in
        the scan carry made XLA thread (and sometimes copy) ~2 MB of
        dead state through every step — hoisting them to closed-over
        scan invariants removes that glue from the hot loop."""
        p = self.params
        npad = self.n_clusters_pad
        dt, dtf = p.dt, self.dtforce
        cl0 = state.clusters
        halo, pairs = state.halo, state.pairs

        def body(mv, _):
            xc, yc, zc, vx, vy, vz, fx, fy, fz = mv
            vx = vx + dtf * fx
            vy = vy + dtf * fy
            vz = vz + dtf * fz
            xc = xc.at[:npad].add(dt * vx)
            yc = yc.at[:npad].add(dt * vy)
            zc = zc.at[:npad].add(dt * vz)
            cl = cl0._replace(xc=xc, yc=yc, zc=zc)
            cl = update_cluster_pbc(cl, halo, npad, False)
            fx, fy, fz = self._force_from(cl, pairs, halo)
            # differential in-loop FORCE timing (cli --timers diff):
            # extra data-dependent passes, CSE-proof
            for _r in range(self._force_reps - 1):
                cl2 = cl._replace(
                    xc=cl.xc.at[:npad].add(1e-30 * fx)
                )
                fx, fy, fz = self._force_from(cl2, pairs, halo)
            vx = vx + dtf * fx
            vy = vy + dtf * fy
            vz = vz + dtf * fz
            if p.dense_thermo:
                t, pr = self._thermo(vx, vy, vz)
            else:
                t = pr = jnp.zeros((), vx.dtype)
            return (cl.xc, cl.yc, cl.zc, vx, vy, vz, fx, fy, fz), (t, pr)

        mv0 = (cl0.xc, cl0.yc, cl0.zc, state.vxc, state.vyc, state.vzc,
               state.fxc, state.fyc, state.fzc)
        mv, tp = jax.lax.scan(body, mv0, None, length=n)
        xc, yc, zc, vx, vy, vz, fx, fy, fz = mv
        return state._replace(
            clusters=cl0._replace(xc=xc, yc=yc, zc=zc),
            vxc=vx, vyc=vy, vzc=vz, fxc=fx, fyc=fy, fzc=fz,
        ), tp

    def _reneigh_step(self, state: CStepState):
        p = self.params
        dt, dtf = p.dt, self.dtforce
        vxc = state.vxc + dtf * state.fxc
        vyc = state.vyc + dtf * state.fyc
        vzc = state.vzc + dtf * state.fzc
        cl = state.clusters
        xc = cl.xc.at[: self.n_clusters_pad].add(dt * vxc)
        yc = cl.yc.at[: self.n_clusters_pad].add(dt * vyc)
        zc = cl.zc.at[: self.n_clusters_pad].add(dt * vzc)
        tmp_state = state._replace(
            clusters=cl._replace(xc=xc, yc=yc, zc=zc),
            vxc=vxc, vyc=vyc, vzc=vzc,
        )
        x_flat, v_flat = self._flatten(tmp_state)
        clusters, (vxc, vyc, vzc), halo, pairs, ovf = (
            self._reneighbor_from_flat(x_flat, v_flat)
        )
        fxc, fyc, fzc = self._force_from(clusters, pairs, halo)
        vxc = vxc + dtf * fxc
        vyc = vyc + dtf * fyc
        vzc = vzc + dtf * fzc
        t, pr = self._thermo(vxc, vyc, vzc)
        return (
            CStepState(
                clusters=clusters, vxc=vxc, vyc=vyc, vzc=vzc,
                fxc=fxc, fyc=fyc, fzc=fzc, halo=halo, pairs=pairs,
                overflow=state.overflow | ovf,
            ),
            (t, pr),
        )

    def _reneigh_step_cheap(self, state: CStepState):
        """List rebuild WITHOUT re-clustering: atom->cluster membership
        is kept between resort_every boundaries, so the flatten +
        sort + re-cluster + velocity-regather glue (~8 ms of the 40 ms
        rebuild at 131k) is skipped; only bboxes, ghosts, bins, pair
        lists, and the exact per-unit lists are rebuilt from CURRENT
        coordinates. Physics stays exact — only list tightness decays
        as clusters diffuse, and the periodic full resort restores it.
        This splits the reference's sortAtom-vs-buildNeighbor cadence
        (verletlist/neighbor.c:360-426 resorts on its own interval) the
        same way, TPU-first. PBC wrap is cluster-granular here: the
        whole 8-atom cluster shifts by a box period when its bbox
        midpoint exits (atom-granular wrap would tear clusters apart);
        atoms can thus sit slightly outside the box, exactly like the
        reference's atoms between its own wrap points."""
        p = self.params
        npad = self.n_clusters_pad
        dt, dtf = p.dt, self.dtforce
        vxc = state.vxc + dtf * state.fxc
        vyc = state.vyc + dtf * state.fyc
        vzc = state.vzc + dtf * state.fzc
        cl = state.clusters
        xc = cl.xc.at[:npad].add(dt * vxc)
        yc = cl.yc.at[:npad].add(dt * vyc)
        zc = cl.zc.at[:npad].add(dt * vzc)

        with jax.named_scope("reneighbor"):
            bbox_l = compute_bboxes(xc[:npad], yc[:npad], zc[:npad])
            prd = jnp.asarray(self.prd, xc.dtype)
            pbc_on = jnp.asarray(
                [p.pbc_x, p.pbc_y, p.pbc_z], xc.dtype
            )
            # wrap at j16-PAIR granularity: shifting one 8-cluster of a
            # pair without its partner would blow the j16 bbox up to the
            # box size (same invariant the pair-granular ghost halo
            # protects — setup_cluster_pbc docstring)
            bb16_l = make_j16_bboxes(bbox_l)

            def wrap_shift(lo, hi, L, on):
                mid = 0.5 * (lo + hi)
                return jnp.repeat(-L * jnp.floor(mid / L) * on, 2)

            shx = wrap_shift(bb16_l[:, 0], bb16_l[:, 1], prd[0], pbc_on[0])
            shy = wrap_shift(bb16_l[:, 2], bb16_l[:, 3], prd[1], pbc_on[1])
            shz = wrap_shift(bb16_l[:, 4], bb16_l[:, 5], prd[2], pbc_on[2])
            xc = xc.at[:npad].add(shx[:, None])
            yc = yc.at[:npad].add(shy[:, None])
            zc = zc.at[:npad].add(shz[:, None])
            sh8 = jnp.stack(
                [shx, shx, shy, shy, shz, shz,
                 jnp.zeros_like(shx), jnp.zeros_like(shx)], axis=1
            )
            bbox = cl.bbox.at[:npad].set(bbox_l + sh8)
            cl = cl._replace(xc=xc, yc=yc, zc=zc, bbox=bbox)

            halo = setup_cluster_pbc(
                cl, npad, npad, self.ghost_cap, self.prd,
                (p.pbc_x, p.pbc_y, p.pbc_z), p.cutneigh,
            )
            cl = update_cluster_pbc(cl, halo, npad, update_bbox=True)
            bbox16 = make_j16_bboxes(cl.bbox)
            cells, bb_cells, (ovf_bcap, ovf_zext) = bin_clusters(
                self.grid, bbox16
            )
            pairs = build_cluster_pairs(
                self.grid, cells, bb_cells, cl.bbox, npad, GROUP,
                self.list_cap, need_ranges=not self._ilist,
            )
            if self._ilist:
                pairs = derive_ilists(
                    cl, pairs, npad, GROUP, p.cutneigh, self.icap,
                    share=self.ishare, bf16=self._derive_bf16,
                )
                if self.buckets is not None:
                    pairs = attach_bucket_maps(
                        pairs, npad, self.ishare, cl.xc.shape[0],
                        *self.buckets,
                    )
            iovf = pairs.iovf if pairs.iovf is not None else jnp.asarray(False)
            ovf = jnp.stack([
                jnp.asarray(False), halo.overflow, ovf_bcap, ovf_zext,
                pairs.overflow[0], pairs.overflow[1], iovf,
            ])

        fxc, fyc, fzc = self._force_from(cl, pairs, halo)
        vxc = vxc + dtf * fxc
        vyc = vyc + dtf * fyc
        vzc = vzc + dtf * fzc
        t, pr = self._thermo(vxc, vyc, vzc)
        return (
            CStepState(
                clusters=cl, vxc=vxc, vyc=vyc, vzc=vzc,
                fxc=fxc, fyc=fyc, fzc=fzc, halo=halo, pairs=pairs,
                overflow=state.overflow | ovf,
            ),
            (t, pr),
        )

    def _thermo(self, vxc, vyc, vzc):
        vsq = (
            jnp.sum(vxc * vxc) + jnp.sum(vyc * vyc) + jnp.sum(vzc * vzc)
        ) * self.params.mass
        t = vsq * self.scales.t_scale
        pr = (t * self.scales.dof_boltz) * self.scales.p_scale
        return t, pr

    # -- run ---------------------------------------------------------------

    def initial_state(self) -> CStepState:
        @jax.jit
        def init(x_flat, v_flat):
            clusters, (vxc, vyc, vzc), halo, pairs, ovf = (
                self._reneighbor_from_flat(x_flat, v_flat)
            )
            fxc, fyc, fzc = self._force_from(clusters, pairs, halo)
            return CStepState(
                clusters=clusters, vxc=vxc, vyc=vyc, vzc=vzc,
                fxc=fxc, fyc=fyc, fzc=fzc, halo=halo, pairs=pairs,
                overflow=ovf,
            )

        return init(self.x_flat0, self.v_flat0)

    def _prune(self, state: CStepState) -> CStepState:
        """pruneNeighbor analogue (reference neighbor.c:483-531): tighten
        the per-member tile windows from current coordinates without
        rebuilding lists. Fires every prune_every steps WITHIN a
        reneighbor interval (the reference aligns to global step count;
        with its defaults — prune 1000, reneigh 20 — neither ever fires
        between rebuilds). On the ilist path the prune re-derives the
        exact per-i-cluster lists from current coordinates (list only
        shrinks: candidates come from the existing group list)."""
        if self._ilist:
            pairs = derive_ilists(
                state.clusters, state.pairs, self.n_clusters_pad,
                GROUP, self.params.cutneigh, self.icap,
                share=self.ishare, bf16=self._derive_bf16,
            )
            if self.buckets is not None:
                pairs = attach_bucket_maps(
                    pairs, self.n_clusters_pad, self.ishare,
                    state.clusters.xc.shape[0], *self.buckets,
                )
            return state._replace(pairs=pairs)
        return state._replace(
            pairs=refresh_pair_ranges(
                state.clusters, state.pairs, self.n_clusters_pad, GROUP,
                self.params.cutneigh,
            )
        )

    def _make_run_fn(self, ntimes: int):
        every = self.params.reneigh_every
        n_intervals = ntimes // every
        tail = ntimes - n_intervals * every
        prune = self.params.prune_every
        prune = prune if (prune and 0 < prune < every) else 0
        resort = self.params.resort_every

        def plain_steps(state, n):
            return self._plain_scan(state, n)

        def interval(state, full: bool):
            if prune:
                tps = []
                done = 0
                while done < every - 1:
                    n = min(prune, every - 1 - done)
                    state, tp = plain_steps(state, n)
                    tps.append(tp)
                    done += n
                    if n == prune and done < every - 1:
                        state = self._prune(state)
                tp_a = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs), *tps
                )
            else:
                state, tp_a = plain_steps(state, every - 1)
            if full:
                state, tp_b = self._reneigh_step(state)
            else:
                state, tp_b = self._reneigh_step_cheap(state)
            tp = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b[None]]), tp_a, tp_b
            )
            return state, tp

        # resort cadence: interval i ends at step (i+1)*every; the full
        # re-cluster (sortAtom analogue) fires only when that step hits
        # a resort_every boundary, every other rebuild is the cheap
        # fixed-membership one. Consecutive same-kind intervals roll up
        # into one lax.scan (the program stays small).
        full_flags = [
            bool(resort > 0 and ((i + 1) * every) % resort == 0)
            for i in range(n_intervals)
        ]
        segments = []  # (full: bool, count: int)
        for f in full_flags:
            if segments and segments[-1][0] == f:
                segments[-1][1] += 1
            else:
                segments.append([f, 1])

        def run(state):
            temps = jnp.zeros((0,), state.vxc.dtype)
            press = jnp.zeros((0,), state.vxc.dtype)
            for f, count in segments:
                state, tps = jax.lax.scan(
                    lambda s, _, f=f: interval(s, f), state, None,
                    length=count,
                )
                temps = jnp.concatenate([temps, tps[0].reshape(-1)])
                press = jnp.concatenate([press, tps[1].reshape(-1)])
            if tail:
                state, tp_t = self._plain_scan(state, tail)
                temps = jnp.concatenate([temps, tp_t[0]])
                press = jnp.concatenate([press, tp_t[1]])
            return state, (temps, press)

        return jax.jit(run, donate_argnums=(0,))

    def _calibrate_list_cap(self, state0) -> bool:
        """Shrink the per-group j-list capacity to the observed maximum
        (+25% drift headroom). The volume-based initial estimate is
        conservative; every padded tail entry costs a gathered row in
        the per-step repack (repack_jtiles), so a tight capacity cuts
        the gather ~proportionally. Returns True if shrunk (caller
        rebuilds the state; later growth is handled by the normal
        overflow-retry)."""
        if self._ilist:
            # ranges are not built on the exact-list path; the group
            # list length itself bounds the needed capacity
            need = int(np.asarray(state0.pairs.nj).max())
        else:
            njg = np.asarray(state0.pairs.ranges)[:, 0, 2 * GROUP]
            need = int(njg.max()) * 8
        tight = max((int(need * 1.25) + 7) // 8 * 8, 32)
        shrunk = False
        if tight < self.list_cap:
            self.list_cap = tight
            shrunk = True
        if state0.pairs.nji is not None:
            # ilist capacity: the kernel computes icap*16 pairs per
            # i-cluster row whether real or padding, so every unused
            # slab costs ~1% of the force step — calibrate tightly
            need_i = int(np.asarray(state0.pairs.nji).max())
            tight_i = max((int(need_i * 1.15) + 2 + 7) // 8 * 8, 16)
            if tight_i < self.icap:
                self.icap = tight_i
                shrunk = True
            if self._plan_buckets(np.asarray(state0.pairs.nji)):
                shrunk = True
        return shrunk

    def _plan_buckets(self, nji: np.ndarray) -> bool:
        """Choose capacity buckets for the Pallas exact-list force from
        the observed nji distribution (shared quantile planner,
        ops/cluster.plan_capacity_buckets); skipped for small boxes,
        typed runs, and non-Pallas kernels."""
        if self.buckets is not None:
            return False
        if self._kmode != "ilist_pl" or self.type_tables is not None:
            return False
        # margin 2: the cold-lattice nji bulk sits ~2 below the melted
        # steady state's (measured at 131k, tools/r3_nji.py); membership
        # is argsort-adaptive so the margin only protects the static
        # sizes, and bovf -> grow-retry backstops a larger drift
        plan = plan_capacity_buckets(
            nji, self.icap, self.ishare, margin=2, zero_tier=True
        )
        if plan is None:
            return False
        self.buckets = plan
        return True

    def run(self, ntimes: Optional[int] = None, max_retries: int = 5,
            repeats: int = 1, chain: int = 1) -> CRunResult:
        """Run `ntimes` steps; with repeats>1, time the SAME compiled
        program `repeats` times (each from a fresh initial state — the
        program donates its input) and report the MEDIAN wall time. The
        trajectory is identical across repeats (same compiled program,
        same inputs), so the golden gate sees one trace; the median
        controls the tunnel/host run-to-run variance the single-shot
        protocol was exposed to (round 4 shipped 57.3 and the driver
        captured 53.3 on the identical code — a ~7% swing).

        With chain>1, each timed region executes the program `chain`
        times back-to-back and reports region_time / chain: TPU
        dispatches on one device execute in submission order, so one
        final scalar fence covers all of them and the per-dispatch
        host<->device round trip (~30 ms on the tunnel — an artifact of
        the harness, not the simulation; the reference times its loop
        host-side with zero network in the region, main.c:250-287) is
        amortized instead of billed to every run."""
        p = self.params
        ntimes = p.ntimes if ntimes is None else ntimes
        calibrated = False
        for _ in range(max_retries + 1):
            state0 = self.initial_state()
            jax.block_until_ready(state0)
            if bool(np.any(np.asarray(state0.overflow))):
                self._grow(np.asarray(state0.overflow))
                continue
            if not calibrated:
                calibrated = True
                if self._calibrate_list_cap(state0):
                    continue
            run_fn = self._make_run_fn(ntimes)
            compiled = run_fn.lower(state0).compile()
            # un-timed warm-up execution: the first call after AOT compile
            # still pays large one-time server-side costs on tunneled
            # backends; the reference's timer protocol measures steady
            # execution
            warm = compiled(self.initial_state())
            _ = float(jnp.sum(warm[0].vxc[0]))
            del warm
            # overflow check on an un-timed execution (donated inputs:
            # every run needs its own fresh state)
            state, (temps, press) = compiled(state0)
            flags = np.asarray(state.overflow)
            if flags.any():
                self._grow(flags)
                continue
            totals = []
            for _r in range(repeats):
                s0s = [self.initial_state() for _ in range(chain)]
                jax.block_until_ready(s0s)
                t0 = time.perf_counter()
                last = None
                for s0 in s0s:
                    if last is not None:
                        del last[1]
                    last = list(compiled(s0))
                _fence = float(jnp.sum(last[0].vxc[0]))
                totals.append((time.perf_counter() - t0) / chain)
                del last, s0s
            return CRunResult(
                temps=np.asarray(temps), press=np.asarray(press),
                state=state, total_time=float(np.median(totals)),
            )
        raise RuntimeError("cluster capacity overflow persisted")

    def _restart_from_flat(self, xb, vb, flags=None,
                           max_retries: int = 5) -> "CStepState":
        """Grow capacities and rebuild a runnable state from host
        snapshots of the FLAT atom arrays (a chunk-boundary restart
        point, original atom-id order via _flatten). The restart point
        becomes the engine's new t=0 arrays; re-clustering from the same
        positions under grown caps reproduces the same physics (lists
        are a pure function of positions, padding adds exact zeros)."""
        self._x0 = np.asarray(xb[: self.nlocal])
        self._v0 = np.asarray(vb[: self.nlocal])
        self._grow(flags)
        for _ in range(max_retries + 1):
            state = self.initial_state()
            jax.block_until_ready(state)
            if not bool(np.any(np.asarray(state.overflow))):
                return state
            self._grow(np.asarray(state.overflow))
        raise RuntimeError("cluster capacity overflow persisted in restart")

    def run_chunked(self, chunk: int, nchunks: int, callback,
                    max_retries: int = 5, tail: int = 0):
        """Run in host-visible chunks for trajectory output (the
        cluster twin of engine.Simulation.run_chunked; the reference's
        clusterpair loop writes VTK/XTC per x_out_every step,
        clusterpair/main.c). callback(state, step) runs on host between
        chunks; nchunks*chunk + tail == the exact step count. Same
        capacity protocol as run(): calibrate, grow-and-retry at setup;
        a mid-run overflow discards the failed chunk's output, grows
        capacities, rebuilds from the last good chunk boundary, and
        REPLAYS the chunk (never aborts — reference neighbor.c resize
        semantics)."""
        calibrated = False
        for _ in range(max_retries + 1):
            state = self.initial_state()
            jax.block_until_ready(state)
            if bool(np.any(np.asarray(state.overflow))):
                self._grow(np.asarray(state.overflow))
                continue
            if not calibrated:
                calibrated = True
                if self._calibrate_list_cap(state):
                    continue
            break
        else:
            raise RuntimeError("cluster capacity overflow persisted")
        callback(state, 0)
        compiled = (
            self._make_run_fn(chunk).lower(state).compile()
            if nchunks > 0 else None
        )
        flatten = jax.jit(self._flatten)
        temps_all, press_all = [], []
        t0 = time.perf_counter()
        retries = 0
        c = 0
        while c < nchunks:
            # boundary snapshot BEFORE the chunk (the chunk call donates
            # the state; a failed chunk's output state is truncated)
            xb, vb = flatten(state)
            xb, vb = np.asarray(xb), np.asarray(vb)
            state, (temps, press) = compiled(state)
            if bool(np.any(np.asarray(state.overflow))):
                retries += 1
                if retries > max_retries:
                    raise RuntimeError(
                        "cluster capacity overflow persisted in run_chunked"
                    )
                state = self._restart_from_flat(
                    xb, vb, np.asarray(state.overflow)
                )
                compiled = self._make_run_fn(chunk).lower(state).compile()
                continue  # replay chunk c from the boundary state
            callback(state, (c + 1) * chunk)
            temps_all.append(np.asarray(temps))
            press_all.append(np.asarray(press))
            c += 1
        if tail:
            while True:
                xb, vb = flatten(state)
                xb, vb = np.asarray(xb), np.asarray(vb)
                compiled_t = self._make_run_fn(tail).lower(state).compile()
                state, (temps, press) = compiled_t(state)
                if not bool(np.any(np.asarray(state.overflow))):
                    break
                retries += 1
                if retries > max_retries:
                    raise RuntimeError(
                        "cluster overflow persisted in the tail chunk"
                    )
                state = self._restart_from_flat(
                    xb, vb, np.asarray(state.overflow)
                )
            callback(state, nchunks * chunk + tail)
            temps_all.append(np.asarray(temps))
            press_all.append(np.asarray(press))
        _fence = float(jnp.sum(state.vxc[0]))
        total = time.perf_counter() - t0
        return CRunResult(
            temps=np.concatenate(temps_all) if temps_all
            else np.zeros((0,)),
            press=np.concatenate(press_all) if press_all
            else np.zeros((0,)),
            state=state, total_time=total,
        )

    def _grow(self, flags=None):
        """Targeted capacity growth. flags = [clusters, ghosts, bin_cap,
        z_ext, pairs_nj, pairs_coverage, ilist_nji]; None grows all."""
        if flags is None:
            flags = np.ones(7, bool)
        if len(flags) > 6 and flags[6]:
            self.icap = (int(self.icap * 1.5) + 7) // 8 * 8
            if self.buckets is not None:
                # bucket overflow: widen every cap (the last cap tracks
                # icap, which just grew)
                sizes, caps = self.buckets
                caps = tuple(c + 8 for c in caps[:-1]) + (self.icap,)
                self.buckets = (sizes, caps)
        blk = 8 * GROUP
        if flags[0]:
            self.n_clusters_pad = (
                int(self.n_clusters_pad * 1.3) + blk
            ) // blk * blk
        if flags[1]:
            self.ghost_cap = (int(self.ghost_cap * 1.4) + 64 + 1) // 2 * 2
        if flags[4]:
            self.list_cap = int(self.list_cap * 1.5 + 7) // 8 * 8
        if flags[2] or flags[3] or flags[5]:
            self.grid = make_cluster_grid(
                self.prd, self.params.cutneigh, self.params.rho, GROUP,
                bin_capacity=(
                    int(self.grid.bin_capacity * 1.5 + 3) // 4 * 4
                    if flags[2] else self.grid.bin_capacity
                ),
                slop_z=(
                    self.grid.slop_z * 1.5 if flags[3] else self.grid.slop_z
                ),
                slop_xy=(
                    self.grid.slop_xy * 1.5 if flags[3] else self.grid.slop_xy
                ),
                zspan_factor=(
                    self.grid.zspan_factor * 1.3
                    if flags[5] else self.grid.zspan_factor
                ),
                drift_xy=(
                    self.grid.drift_xy * 1.5
                    if flags[5] else self.grid.drift_xy
                ),
            )
        self._build_device_state()

    def measure_phases(self, state: CStepState, reps: int = 20):
        """Out-of-band FORCE / NEIGH timing (see engine.Simulation)."""
        @jax.jit
        def force_reps(st):
            def body(cl_x, _):
                fx, fy, fz = self._force_from(
                    st.clusters._replace(xc=cl_x), st.pairs, st.halo
                )
                return cl_x + 1e-30 * fx[0, 0], ()
            cl_x, _ = jax.lax.scan(
                body, st.clusters.xc, None, length=reps
            )
            return cl_x

        @jax.jit
        def reneigh_reps(st):
            n = max(reps // 4, 1)
            def body(x_flat, _):
                x2, _v, _h, pairs, _o = self._reneighbor_from_flat(
                    x_flat, self.v_flat0
                )
                return x_flat + 1e-30 * pairs.nj[0].astype(x_flat.dtype), ()
            x_flat, _ = jax.lax.scan(
                body, self.x_flat0, None, length=n
            )
            return x_flat

        import time as _time

        r = force_reps(state)
        _ = float(r[0, 0])
        t0 = _time.perf_counter()
        r = force_reps(state)
        _ = float(r[0, 0])
        t_force = (_time.perf_counter() - t0) / reps

        n = max(reps // 4, 1)
        r = reneigh_reps(state)
        _ = float(r[0, 0])
        t0 = _time.perf_counter()
        r = reneigh_reps(state)
        _ = float(r[0, 0])
        t_neigh = (_time.perf_counter() - t0) / n
        return t_force, t_neigh

    # convenience ----------------------------------------------------------

    def first_force_atoms(self) -> np.ndarray:
        """Step-0 forces scattered back to original atom order (tests)."""
        state = self.initial_state()
        aid = np.asarray(state.clusters.atom_id).reshape(-1)
        fx = np.asarray(state.fxc).reshape(-1)
        fy = np.asarray(state.fyc).reshape(-1)
        fz = np.asarray(state.fzc).reshape(-1)
        out = np.zeros((self.nlocal, 3))
        m = aid >= 0
        out[aid[m], 0] = fx[m]
        out[aid[m], 1] = fy[m]
        out[aid[m], 2] = fz[m]
        return out

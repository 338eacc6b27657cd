"""Command-line driver, flag- and output-compatible with the reference
(src/verletlist/main.c:129-344): same flags, parameter banner, thermo
rows, and the final System/TOTAL/Performance block, so existing MD-Bench
result-parsing scripts work unchanged.

Extra flags for TPU-build axes: --scheme, --precision, --kernel, --stub.

Usage:  python -m mdbench_tpu.cli [-p file] [-f lj|eam] [-n 200] ...
"""

from __future__ import annotations

import sys

import numpy as np

from mdbench_tpu.config import Params, print_parameters, read_parameter_file, str2ff
from mdbench_tpu.stats import Stats, display_statistics

HLINE = "----------------------------------------------------------------------------\n"

HELP = """MD Bench (TPU): A performance-oriented prototyping harness for MD algorithms
-p / --params <string>:     file to read parameters from (can be specified more than once)
-f <string>:                force field (lj or eam), default lj
-i <string>:                input file with atom positions (dump)
-e <string>:                input file for EAM
-n / --nsteps <int>:        set number of timesteps for simulation
-nx/-ny/-nz <int>:          set linear dimension of systembox in x/y/z direction
-half <int>:                use half (1) or full (0) neighbor lists
-r / --radius <real>:       set cutoff radius
-s / --skin <real>:         set skin (verlet buffer)
-w <file>:                  write input atoms to file
--freq <real>:              processor frequency (GHz)
--vtk <string>:             VTK file for visualization
--xtc <string>:             XTC trajectory output file
--scheme <verlet|cluster>:  neighbor scheme (TPU axis; reference OPT_SCHEME)
--precision <sp|dp>:        floating point precision (reference DATA_TYPE)
--kernel <auto|ilist|ilist_pl|xla|pallas|rowlist>: force-kernel backend
                            (cluster: ilist* exact-list kernels, pallas =
                            streaming group windows; verlet: rowlist =
                            packed-row TPU fast path, xla = planar)
--eam-eval <auto|spline|poly>: EAM per-pair table evaluation (spline =
                            reference-exact gathered splines; poly =
                            gather-free fitted polynomials, TPU fast axis)
--trace-index <prefix>:     dump INDEX_TRACER-style neighbor-index trace
                            of the initial lists (reference tracing.h:47-123)
--timers <est|diff>:        FORCE/NEIGH timing: out-of-band estimates
                            (default) or in-loop differential runs
--trace-mem <prefix>:       dump MEM_TRACER-style address-stream trace
                            (reference tracing.h:24-45)
--profile <logdir>:         capture a jax.profiler device trace of the run
                            (LIKWID/xprof analogue; named force/reneighbor
                            scopes appear as spans)
--checkpoint <file>:        save the final state (positions+velocities+
                            types+step) as a binary npz checkpoint
--restore <file>:           resume from a checkpoint written by
                            --checkpoint (runs -n further steps)
"""


def parse_args(argv) -> Params:
    """Flag-compatible argument loop (reference: main.c:145-231)."""
    p = Params()
    i = 0
    while i < len(argv):
        a = argv[i]

        def nxt():
            nonlocal i
            i += 1
            return argv[i]

        if a in ("-p", "--params"):
            read_parameter_file(p, nxt())
        elif a == "-f":
            ff = str2ff(nxt())
            if ff < 0:
                sys.stderr.write("Invalid force field!\n")
                sys.exit(-1)
            p.force_field = ff
        elif a == "-i":
            p.input_file = nxt()
        elif a == "-e":
            p.eam_file = nxt()
        elif a in ("-n", "--nsteps"):
            p.ntimes = int(nxt())
        elif a == "-nx":
            p.nx = int(nxt())
        elif a == "-ny":
            p.ny = int(nxt())
        elif a == "-nz":
            p.nz = int(nxt())
        elif a == "-half":
            p.half_neigh = int(nxt())
        elif a in ("-r", "--radius"):
            p.cutforce = float(nxt())
        elif a in ("-s", "--skin"):
            p.skin = float(nxt())
        elif a == "--freq":
            p.proc_freq = float(nxt())
        elif a == "--vtk":
            p.vtk_file = nxt()
        elif a == "--xtc":
            p.xtc_file = nxt()
        elif a == "-w":
            p.write_atom_file = nxt()
        elif a == "--scheme":
            p.scheme = nxt()
        elif a == "--precision":
            p.precision = nxt()
        elif a == "--kernel":
            p.kernel = nxt()
        elif a == "--eam-eval":
            p.eam_eval = nxt()
        elif a == "--trace-index":
            p.trace_index = nxt()
        elif a == "--trace-mem":
            p.trace_mem = nxt()
        elif a == "--profile":
            p.profile_dir = nxt()
        elif a == "--timers":
            p.timers = nxt()
        elif a == "--checkpoint":
            p.checkpoint_file = nxt()
        elif a == "--restore":
            p.restore_file = nxt()
        elif a in ("-h", "--help"):
            print(HELP)
            sys.exit(0)
        elif a.startswith("-"):
            # the reference mains skip unknown argv entries; keep that
            # compatibility but warn loudly — a typo like "--prec sp"
            # silently running the DP default is a numerics trap
            sys.stderr.write("WARNING: ignoring unknown flag %r\n" % a)
        i += 1
    p.finalize()
    return p


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    params = parse_args(argv)

    if params.precision == "dp":
        import jax

        jax.config.update("jax_enable_x64", True)
        if jax.devices()[0].platform != "cpu":
            # f64 is emulated on TPU and, on the tunneled axon backend,
            # silently produces wrong numerics — DP is the CPU parity
            # axis (SURVEY §7 risk list); SP is the TPU benchmark axis
            sys.stderr.write(
                "WARNING: precision=dp on a TPU backend: f64 is "
                "emulated/unreliable on TPU; DP runs are intended for "
                "CPU parity (use --precision sp on TPU)\n"
            )

    if params.scheme == "cluster":
        from mdbench_tpu.engine_cluster import ClusterSimulation as Engine
    else:
        from mdbench_tpu.engine import Simulation as Engine

    step0 = 0
    if params.restore_file:
        # resume from a binary checkpoint (exceeds the reference's -w
        # .in round-trip): restored states are never thermo-adjusted
        from mdbench_tpu.io.checkpoint import load_checkpoint

        rx, rv, rtypes, meta = load_checkpoint(params.restore_file)
        step0 = int(meta.get("step", 0))
        sim = Engine(
            params, x=np.asarray(rx), v=np.asarray(rv),
            types=(np.asarray(rtypes) if rtypes is not None else None),
            adjust=False,
        )
        print("restored %d atoms at step %d from %s"
              % (sim.natoms, step0, params.restore_file))
    else:
        sim = Engine(params)
    print(print_parameters(params))
    sys.stdout.write(HLINE)
    print("step\ttemp\t\tpressure")

    state0 = sim.initial_state()
    if params.scheme == "cluster":
        t0v, p0v = sim._thermo(state0.vxc, state0.vyc, state0.vzc)
    else:
        from mdbench_tpu.thermo import compute_thermo

        t0v, p0v = compute_thermo(
            state0.v, sim.nlocal, params.mass, sim.scales
        )
    print("%i\t%e\t%e" % (0, float(t0v), float(p0v)))

    if params.write_atom_file:
        from mdbench_tpu.io.writers import write_atom

        write_atom(params.write_atom_file, sim, state0)

    tracing_on = bool(params.trace_index or params.trace_mem)

    def dump_traces(state, step: int):
        """traceAddresses analogue (reference main.c:240-242 initial +
        main.c:269 in-loop under TRACER_CONDITION = every reneighbor
        boundary, tracing.h:20-22)."""
        from mdbench_tpu import tracing

        if params.scheme == "cluster":
            ng, _, L = state.pairs.jlist.shape
            nb = np.asarray(state.pairs.jlist).reshape(ng, L)
            nn = np.asarray(np.minimum(np.asarray(state.pairs.nj), L))
        else:
            nl = state.nlist
            if nl.neighbors.shape[0] < sim.nlocal:  # rowlist fast path
                nl = sim.per_atom_lists(state.x, state.types)
            nb = np.asarray(nl.neighbors[: sim.nlocal])
            nn = np.asarray(nl.numneigh[: sim.nlocal])
        if params.trace_index:
            print("tracing index stream ->",
                  tracing.dump_index_trace(params.trace_index, nb, nn,
                                           step))
        if params.trace_mem:
            fs = 8 if params.precision == "dp" else 4
            print("tracing address stream ->",
                  tracing.dump_mem_trace(params.trace_mem, nb, nn, step,
                                         float_size=fs))

    if tracing_on:
        dump_traces(state0, 0)

    want_traj = bool(params.vtk_file or params.xtc_file)
    if want_traj:
        # in-loop trajectory output at x_out_every cadence (reference
        # main.c:282-284 for both schemes)
        from mdbench_tpu.io.trr import xtc_end, xtc_init

        writer = None
        if params.xtc_file:
            writer = xtc_init(
                params.xtc_file, (params.xprd, params.yprd, params.zprd)
            )
        chunk = params.x_out_every

        if params.scheme == "cluster":
            import jax as _jax

            from mdbench_tpu.io.vtk import write_cluster_vtk_files

            flatten_fn = _jax.jit(sim._flatten)

            def emit(state, step):
                if params.vtk_file:
                    write_cluster_vtk_files(
                        params.vtk_file, state.clusters,
                        sim.n_clusters_pad, int(state.halo.nghost), step,
                    )
                if writer is not None:
                    x_flat, _v = flatten_fn(state)
                    writer.write(
                        np.asarray(x_flat[: sim.nlocal]), step,
                        step * params.dt,
                    )
        else:
            from mdbench_tpu.io.vtk import write_atoms_to_vtk_file

            def emit(state, step):
                xs = np.asarray(state.x[: sim.nlocal])
                if params.vtk_file:
                    write_atoms_to_vtk_file(params.vtk_file, xs, step)
                if writer is not None:
                    writer.write(xs, step, step * params.dt)

        nchunks = params.ntimes // chunk
        tail = params.ntimes - nchunks * chunk
        out = sim.run_chunked(chunk, nchunks, emit, tail=tail)
        if writer is not None:
            xtc_end(writer)
    elif tracing_on:
        # per-reneighbor trace cadence (TRACER_CONDITION): chunk the
        # run at reneighbor boundaries and dump the fresh lists
        # (both schemes — dump_traces reads cluster j-lists too)
        def emit_traces(state, step):
            if step > 0:
                dump_traces(state, step)

        chunk = params.reneigh_every
        nchunks = params.ntimes // chunk
        out = sim.run_chunked(chunk, nchunks, emit_traces,
                              tail=params.ntimes - nchunks * chunk)
    elif params.profile_dir:
        from mdbench_tpu.tracing import profile

        with profile(params.profile_dir):
            out = sim.run()
        print("profile trace ->", params.profile_dir)
    else:
        out = sim.run()

    # thermo rows at nstat cadence (reference: main.c:275-280, 289)
    for n in range(params.nstat, params.ntimes, params.nstat):
        print("%i\t%e\t%e" % (n, out.temps[n - 1], out.press[n - 1]))
    print(
        "%i\t%e\t%e"
        % (params.ntimes, out.temps[-1], out.press[-1])
    )

    if params.scheme == "cluster":
        # halo counts 16-atom j-cluster images
        nghost = int(out.state.halo.nghost) * 16
    else:
        nghost = int(out.state.halo.nghost)
    if params.timers == "diff":
        # IN-LOOP differential timing (reference times each phase per
        # call inside the loop, main.c:250-287; our whole run is one
        # fused program, so the honest in-loop number is a difference
        # of full runs): FORCE = T(run with one extra chained force
        # pass per step) - T(run); NEIGH = T(run at half the reneighbor
        # interval) - T(run), per extra rebuild. Data-dependent
        # chaining makes the extra passes CSE/DCE-proof.
        import dataclasses

        sim2 = Engine(params)
        sim2._force_reps = 2
        out2 = sim2.run()
        # the extra chained force pass runs only in PLAIN steps (the
        # reneighbor step keeps a single pass), so the delta divides by
        # the plain-step count, not ntimes
        n_plain = params.ntimes - params.ntimes // params.reneigh_every
        t_force = (
            max(out2.total_time - out.total_time, 0.0) / max(n_plain, 1)
        )
        p3 = dataclasses.replace(
            params, reneigh_every=max(params.reneigh_every // 2, 1)
        )
        extra = (params.ntimes // p3.reneigh_every) - (
            params.ntimes // params.reneigh_every
        )
        sim3 = Engine(p3)
        out3 = sim3.run()
        t_neigh = max(out3.total_time - out.total_time, 0.0) / max(extra, 1)
    else:
        t_force, t_neigh = sim.measure_phases(out.state)
    force_total = t_force * (params.ntimes + 1)
    neigh_total = t_neigh * (params.ntimes // params.reneigh_every)

    sys.stdout.write(HLINE)
    print(
        "System: %d atoms %d ghost atoms, Steps: %d"
        % (sim.natoms, nghost, params.ntimes)
    )
    print(
        "TOTAL %.2fs FORCE %.2fs NEIGH %.2fs REST %.2fs"
        % (
            out.total_time,
            force_total,
            neigh_total,
            max(out.total_time - force_total - neigh_total, 0.0),
        )
    )
    # Always label which timing mode produced the FORCE/NEIGH split
    # (TOTAL is a measured wall clock in both modes). The reference
    # measures in-loop (main.c:250-287); our whole run is ONE fused
    # program, so the default split is out-of-band estimates and the
    # report must say so unconditionally, not only on disagreement.
    print(
        "(timers: diff — in-loop differential measurement)"
        if params.timers == "diff"
        else "(timers: est — FORCE/NEIGH are out-of-band per-call "
        "estimates x call counts; TOTAL is measured)"
    )
    # Cross-check against the real TOTAL and say so when they disagree.
    est = force_total + neigh_total
    if est > out.total_time * 1.15:
        print(
            "(note: FORCE+NEIGH estimates exceed TOTAL by %.0f%% — the "
            "fused run overlaps phases the estimates time separately)"
            % (100.0 * (est / out.total_time - 1.0))
        )
    sys.stdout.write(HLINE)
    print(
        "Performance: %.2f million atom updates per second"
        % (1e-6 * sim.natoms * params.ntimes / out.total_time)
    )

    if params.compute_stats:
        stats = Stats()
        if params.scheme == "cluster":
            # exact cluster counters (reference clusterpair/stats.c:
            # 26-85) from one masked pass over the final state's windows
            from mdbench_tpu.stats import compute_cluster_stats

            cs = compute_cluster_stats(
                out.state.clusters, out.state.pairs, sim.n_clusters_pad,
                16, params.cutforce**2, params.cutneigh**2,
                buckets=getattr(sim, "buckets", None),
            )
            stats.num_neighs = cs["clusters_processed"]
            stats.total_force_neighs = (
                cs["pairs_within_cutforce"] * (params.ntimes + 1)
            )
            stats.total_force_iters = cs["tiles"] * (params.ntimes + 1)
            print(
                "\tCluster pairs processed: %d (within force cutoff: %d)"
                % (cs["clusters_processed"], cs["clusters_within_cutoff"])
            )
            print(
                "\tPadded pair lanes: %d, real pairs in cutoff: %d "
                "(efficiency %.1f%%)"
                % (
                    cs["padded_pairs"], cs["pairs_within_cutforce"],
                    100.0 * cs["pairs_within_cutforce"]
                    / max(cs["padded_pairs"], 1),
                )
            )
        else:
            nl = out.state.nlist
            if nl.neighbors.shape[0] < sim.nlocal:  # rowlist fast path
                nl = sim.per_atom_lists(out.state.x, out.state.types)
            numneigh = np.asarray(nl.numneigh[: sim.nlocal])
            stats.accumulate_list(numneigh, params.ntimes + 1)
        float_size = 8 if params.precision == "dp" else 4
        print(
            display_statistics(
                stats, sim.nlocal, params.ntimes, force_total,
                params.proc_freq, float_size,
            )
        )

    if params.checkpoint_file:
        from mdbench_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(
            params.checkpoint_file, sim, out.state, step0 + params.ntimes
        )
        print("checkpoint ->", params.checkpoint_file)

    # (trajectory runs already wrote every frame incl. the final one in
    # the chunked loop above — nothing left to emit here)
    return 0


if __name__ == "__main__":
    sys.exit(main())

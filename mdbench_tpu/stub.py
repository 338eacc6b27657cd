"""Synthetic-workload kernel microbenchmark — the reference's `-stub`
variant (src/verletlist/main-stub.c): fake atoms + synthetic neighbor
lists with controlled access patterns replace the whole data/neighbor
stack, so the force kernel is measured in isolation for cache/pattern
studies.

Patterns (main-stub.c:60-105):
  seq  — neighbors of i are i+1, i+2, ... (mod Nlocal)
  fix  — every atom's neighbors are 0, 1, ..., nneighs-1
  rand — nneighs distinct random neighbors != i
replicated `nreps` times per row; cutforce = 1e6 so every pair interacts
(main-stub.c:46-47).

Metrics (main-stub.c:280-320): Mega atom updates/s, cycles/atom,
cycles/neighbor, optional CSV row.

Usage: python -m mdbench_tpu.stub [-na N] [-nn NN] [-nr R]
       [--pattern seq|fix|rand] [-n steps] [--csv] [-f lj|eam] [-half 0|1]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def create_stub_atoms(natoms: int):
    """Synthetic positions (reference: main-stub.c places atoms at tiny
    increments so all pairs interact)."""
    i = np.arange(natoms, dtype=np.float64)
    x = np.stack([i * 1e-5, i * 1e-5, i * 1e-5], axis=1)
    v = np.zeros_like(x)
    return x, v


def create_neighbors(natoms: int, pattern: str, nneighs: int, nreps: int,
                     seed: int = 42):
    """Synthetic fixed-width lists (reference createNeighbors,
    main-stub.c:60-105)."""
    maxneighs = nneighs * nreps
    neigh = np.zeros((natoms, maxneighs), np.int32)
    if pattern == "rand" and natoms <= nneighs:
        raise ValueError(
            "random pattern requires natoms > nneighs (main-stub.c:67-71)"
        )
    rng = np.random.default_rng(seed)
    for i in range(natoms):
        if pattern == "seq":
            row = (i + 1 + np.arange(nneighs)) % natoms
        elif pattern == "fix":
            row = np.arange(nneighs) % nneighs
        elif pattern == "rand":
            row = rng.choice(natoms, size=nneighs + 1, replace=False)
            row = row[row != i][:nneighs]
        else:
            raise ValueError(f"unknown pattern {pattern}")
        neigh[i] = np.tile(row, nreps)
    numneigh = np.full(natoms, maxneighs, np.int32)
    return neigh, numneigh


def run_stub(
    natoms: int = 65536,
    nneighs: int = 76,
    nreps: int = 1,
    pattern: str = "seq",
    ntimes: int = 200,
    half: bool = False,
    proc_freq: float = 2.4,
    csv: bool = False,
    precision: str = "sp",
) -> dict:
    import jax
    import jax.numpy as jnp

    from mdbench_tpu.ops.lj import (
        compute_force_lj_full,
        compute_force_lj_half,
    )

    dtype = jnp.float64 if precision == "dp" else jnp.float32
    xh, _ = create_stub_atoms(natoms)
    neigh_h, numneigh_h = create_neighbors(natoms, pattern, nneighs, nreps)

    nlocal_pad = natoms
    x = jnp.asarray(
        np.concatenate([xh, [[1e30, 1e30, 1e30]]]), dtype
    )  # + sentinel row
    neigh = jnp.asarray(neigh_h)
    numneigh = jnp.asarray(numneigh_h)
    cutsq = 1.0e6**2  # all pairs hit (main-stub.c:46)

    def force(x):
        if half:
            return compute_force_lj_half(
                x, neigh, numneigh, natoms, nlocal_pad, cutsq, 1.0, 1.0
            )
        return compute_force_lj_full(
            x, neigh, numneigh, nlocal_pad, cutsq, 1.0, 1.0
        )

    @jax.jit
    def loop(x):
        def body(x, _):
            f = force(x)
            return x.at[:nlocal_pad].add(1e-30 * f), ()

        x, _ = jax.lax.scan(body, x, None, length=ntimes)
        return x

    r = loop(x)
    _ = float(r[0, 0])  # compile + fence
    t0 = time.perf_counter()
    r = loop(x)
    _ = float(r[0, 0])
    total = time.perf_counter() - t0

    freq_hz = proc_freq * 1e9
    upd_per_s = natoms / total * ntimes
    cy_atom = total / natoms / ntimes * freq_hz
    cy_neigh = cy_atom / nneighs
    result = dict(
        pattern=pattern, natoms=natoms, nneighs=nneighs, nreps=nreps,
        ntimes=ntimes, total=total, mega_updates=upd_per_s / 1e6,
        cycles_per_atom=cy_atom, cycles_per_neighbor=cy_neigh,
    )
    if csv:
        print("steps,pattern,natoms,nneighs,nreps,time(s),atom upds/s(M),"
              "cy/atom,cy/neigh")
        print(
            "%d,%s,%d,%d,%d,%.4f,%.4f,%.4f,%.4f"
            % (ntimes, pattern, natoms, nneighs, nreps, total,
               upd_per_s / 1e6, cy_atom, cy_neigh)
        )
    else:
        print(
            "Total time: %.4f, Mega atom updates/s: %.4f"
            % (total, upd_per_s / 1e6)
        )
        print(
            "Cycles per atom: %.4f, Cycles per neighbor: %.4f"
            % (cy_atom, cy_neigh)
        )
    return result


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    kw = {}
    i = 0
    while i < len(argv):
        a = argv[i]

        def nxt():
            nonlocal i
            i += 1
            return argv[i]

        if a == "-na":
            kw["natoms"] = int(nxt())
        elif a == "-nn":
            kw["nneighs"] = int(nxt())
        elif a == "-nr":
            kw["nreps"] = int(nxt())
        elif a == "--pattern":
            kw["pattern"] = nxt()
        elif a in ("-n", "--nsteps"):
            kw["ntimes"] = int(nxt())
        elif a == "-half":
            kw["half"] = bool(int(nxt()))
        elif a == "--freq":
            kw["proc_freq"] = float(nxt())
        elif a == "--csv":
            kw["csv"] = True
        elif a == "--precision":
            kw["precision"] = nxt()
        i += 1
    run_stub(**kw)
    return 0


if __name__ == "__main__":
    sys.exit(main())

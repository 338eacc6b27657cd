"""Atom state writers (reference: writeAtom, src/verletlist/atom.c:564-588)."""

from __future__ import annotations

import numpy as np


def write_atom(path: str, sim, state) -> None:
    """CSV lines `type,mass,x,y,z,vx,vy,vz,0`, exactly as writeAtom."""
    x = np.asarray(state.x[: sim.nlocal])
    v = np.asarray(state.v[: sim.nlocal])
    types = np.asarray(state.types[: sim.nlocal])
    with open(path, "w") as fp:
        for i in range(sim.nlocal):
            fp.write(
                "%d,%f,%f,%f,%f,%f,%f,%f,0\n"
                % (
                    types[i], 1.0,
                    x[i, 0], x[i, 1], x[i, 2],
                    v[i, 0], v[i, 1], v[i, 2],
                )
            )
    print(
        "Wrote input data to %s, grid size: %f, %f, %f"
        % (path, sim.params.xprd, sim.params.yprd, sim.params.zprd)
    )

"""Binary checkpoint / resume of simulation state.

The reference has no mid-run checkpointing (SURVEY §5.4); its closest
facility is the `-w` restartable `.in` atom file (atom.c:564-588). This
module adds proper save/restore (positions + velocities + step + params
fingerprint) via npz — cheap on TPU because state lives in a handful of
dense arrays.
"""

from __future__ import annotations

import json

import numpy as np


def save_checkpoint(path: str, sim, state, step: int) -> None:
    """Works for both engines (flat or cluster layout)."""
    if hasattr(state, "clusters"):  # cluster engine
        x_flat, v_flat = sim._flatten(state)
        x = np.asarray(x_flat[: sim.nlocal])
        v = np.asarray(v_flat[: sim.nlocal])
    else:
        x = np.asarray(state.x[: sim.nlocal])
        v = np.asarray(state.v[: sim.nlocal])
    meta = dict(
        step=step,
        natoms=sim.natoms,
        scheme=sim.params.scheme,
        force_field=sim.params.force_field,
        xprd=sim.params.xprd,
        yprd=sim.params.yprd,
        zprd=sim.params.zprd,
    )
    np.savez(path, x=x, v=v, meta=json.dumps(meta))


def load_checkpoint(path: str):
    """Returns (x, v, meta). Feed x/v into Simulation(params, x=x, v=v)
    to resume."""
    d = np.load(path, allow_pickle=False)
    meta = json.loads(str(d["meta"]))
    return d["x"], d["v"], meta

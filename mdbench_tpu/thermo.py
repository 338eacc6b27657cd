"""Thermodynamics: unit scales, temperature/pressure readout, velocity
adjustment (reference: src/common/thermo.c).

`compute_thermo` runs on device (a cheap reduction that fuses into the
step scan); `adjust_thermo` is host-side setup (NumPy, float64) to match
the reference's sequential double-precision setup path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mdbench_tpu.config import FF_EAM, FF_LJ, Params


class ThermoScales(NamedTuple):
    mvv2e: float
    dof_boltz: float
    t_scale: float
    p_scale: float
    e_scale: float


def setup_thermo(params: Params, natoms: int) -> ThermoScales:
    """Unit scale factors (reference: thermo.c:30-53).

    NOTE: for EAM the reference also divides param->dtforce by mvv2e
    (thermo.c:51); callers must apply `adjusted_dtforce`.
    """
    if params.force_field == FF_LJ:
        mvv2e = 1.0
        dof_boltz = float(natoms * 3 - 3)
        t_scale = mvv2e / dof_boltz
        p_scale = 1.0 / 3 / params.xprd / params.yprd / params.zprd
        e_scale = 0.5
    elif params.force_field == FF_EAM:
        mvv2e = 1.036427e-04
        dof_boltz = (natoms * 3 - 3) * 8.617343e-05
        t_scale = mvv2e / dof_boltz
        p_scale = 1.602176e06 / 3 / params.xprd / params.yprd / params.zprd
        e_scale = 524287.985533
    else:
        raise ValueError(f"unknown force field {params.force_field}")
    return ThermoScales(mvv2e, dof_boltz, t_scale, p_scale, e_scale)


def adjusted_dtforce(params: Params, scales: ThermoScales) -> float:
    """dtforce after the EAM unit correction (reference: thermo.c:51)."""
    if params.force_field == FF_EAM:
        return params.dtforce / scales.mvv2e
    return params.dtforce


def compute_thermo(v: jnp.ndarray, nlocal: int, mass: float, scales: ThermoScales):
    """Temperature and pressure from local velocities
    (reference: thermo.c:55-80). Returns (t, p) device scalars.
    """
    vsq = jnp.sum(v[:nlocal] * v[:nlocal]) * mass
    t = vsq * scales.t_scale
    p = (t * scales.dof_boltz) * scales.p_scale
    return t, p


def adjust_thermo(params: Params, scales: ThermoScales, v: np.ndarray, natoms: int):
    """Zero center-of-mass momentum, then rescale to the target temperature
    (reference: thermo.c:82-122). Host-side, float64, returns new v.
    """
    v = np.asarray(v, np.float64).copy()
    vtot = v.sum(axis=0) / natoms  # reference divides by Natoms, not Nlocal
    v -= vtot
    t = (v * v).sum() * params.mass * scales.t_scale
    factor = np.sqrt(params.temp / t)
    v *= factor
    return v

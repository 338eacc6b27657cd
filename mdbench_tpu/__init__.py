"""mdbench_tpu — a TPU-native molecular-dynamics benchmark framework.

A from-scratch rebuild of the capabilities of MD-Bench (the NHR@FAU
short-range MD proxy-app toolbox) designed TPU-first:

- force/neighbor kernels expressed as XLA programs and Pallas TPU kernels
  over HBM-resident, fixed-capacity padded arrays (replacing the reference's
  AVX intrinsics and CUDA kernels),
- the whole timestep loop inside one jitted ``lax.scan`` (zero host
  round-trips between reneighbor events),
- multi-chip scaling via spatial domain decomposition sharded over a
  ``jax.sharding.Mesh`` with ICI halo exchange (the reference is
  single-node; see parallel/).

Two neighbor schemes, mirroring the reference's two compile-time trees:

- ``verlet``  — LAMMPS/miniMD-style per-atom Verlet neighbor lists
  (reference: src/verletlist/).
- ``cluster`` — GROMACS MxN cluster-pair lists re-dimensioned so the
  M x N interaction tile maps onto the 8x128 TPU VPU
  (reference: src/clusterpair/).

Force fields: Lennard-Jones and EAM (funcfl spline tables), as in the
reference (src/verletlist/force_lj.c, force_eam.c, src/common/eam_utils.c).
"""

__version__ = "0.1.0"

from mdbench_tpu.config import Params, read_parameter_file  # noqa: F401

"""VTK trajectory output (reference: src/verletlist/vtk.c:12-55).

Same ASCII UNSTRUCTURED_GRID layout: one `<name>_<step>.vtk` file per
timestep with POINTS / CELLS / CELL_TYPES / POINT_DATA sections.
"""

from __future__ import annotations

import numpy as np


def write_atoms_to_vtk_file(filename: str, x: np.ndarray, timestep: int) -> str:
    n = x.shape[0]
    path = f"{filename}_{timestep}.vtk"
    with open(path, "w") as fp:
        fp.write("# vtk DataFile Version 2.0\n")
        fp.write("Particle data\n")
        fp.write("ASCII\n")
        fp.write("DATASET UNSTRUCTURED_GRID\n")
        fp.write(f"POINTS {n} double\n")
        for i in range(n):
            fp.write("%.4f %.4f %.4f\n" % (x[i, 0], x[i, 1], x[i, 2]))
        fp.write("\n\n")
        fp.write(f"CELLS {n} {n * 2}\n")
        for i in range(n):
            fp.write(f"1 {i}\n")
        fp.write("\n\n")
        fp.write(f"CELL_TYPES {n}\n")
        fp.write("1\n" * n)
        fp.write("\n\n")
        fp.write(f"POINT_DATA {n}\n")
        fp.write("SCALARS mass double\n")
        fp.write("LOOKUP_TABLE default\n")
        fp.write("1.0\n" * n)
        fp.write("\n\n")
    return path


def write_ghost_atoms_to_vtk_file(filename: str, xg: np.ndarray, timestep: int) -> str:
    """Ghost-atom dump (clusterpair reference writes separate ghost files,
    src/clusterpair/vtk.c:14-230); same point format."""
    return write_atoms_to_vtk_file(filename + "_ghost", xg, timestep)

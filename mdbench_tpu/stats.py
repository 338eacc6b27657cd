"""Workload statistics (reference COMPUTE_STATS, src/verletlist/stats.c).

The reference accumulates per-iteration counters inside the kernels
(addStat). On TPU that would poison the hot loop, so the same quantities
are computed analytically from the neighbor lists at reneighbor
boundaries and scaled by the steps each list was live — the totals are
identical because lists are immutable between rebuilds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

VECTOR_WIDTH = 8  # TPU VPU sublanes per f32 tile; SIMD-iteration analogue


@dataclass
class Stats:
    total_force_neighs: int = 0
    total_force_iters: int = 0
    atoms_within_cutoff: int = 0
    atoms_outside_cutoff: int = 0
    num_neighs: int = 0  # clusterpair: cluster pairs
    force_iters: int = 0

    def accumulate_list(self, numneigh: np.ndarray, steps_live: int):
        """Add a neighbor list's per-step work, times the steps it was
        used (force runs once per step + once at setup)."""
        nn = int(numneigh.sum())
        iters = int(((numneigh + VECTOR_WIDTH - 1) // VECTOR_WIDTH).sum())
        self.total_force_neighs += nn * steps_live
        self.total_force_iters += iters * steps_live


def display_statistics(
    stats: Stats,
    nlocal: int,
    ntimes: int,
    force_time: float,
    proc_freq: float,
    float_size: int,
) -> str:
    """Render the statistics block (reference stats.c:22-68)."""
    evals = nlocal * (ntimes + 1)
    force_useful_volume = 1e-9 * (
        float(evals) * (float_size * 6 + 4)
        + float(stats.total_force_neighs) * (float_size * 3 + 4)
    )
    avg_neigh = stats.total_force_neighs / float(evals)
    avg_simd = stats.total_force_iters / float(evals)
    lines = ["Statistics:"]
    lines.append(
        "\tVector width: %d, Processor frequency: %.4f GHz"
        % (VECTOR_WIDTH, proc_freq)
    )
    lines.append("\tAverage neighbors per atom: %.4f" % avg_neigh)
    lines.append("\tAverage SIMD iterations per atom: %.4f" % avg_simd)
    lines.append(
        "\tTotal number of computed pair interactions: %d"
        % stats.total_force_neighs
    )
    lines.append(
        "\tTotal number of SIMD iterations: %d" % stats.total_force_iters
    )
    lines.append(
        "\tUseful read data volume for force computation: %.2fGB"
        % force_useful_volume
    )
    if stats.total_force_iters and np.isfinite(force_time):
        lines.append(
            "\tCycles/SIMD iteration: %.4f"
            % (force_time * proc_freq * 1e9 / stats.total_force_iters)
        )
    return "\n".join(lines)

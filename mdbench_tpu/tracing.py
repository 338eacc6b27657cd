"""Tracing / profiling hooks (reference: src/verletlist/tracing.{c,h},
likwid-marker.h — SURVEY §5.1).

Three mechanisms, mapped TPU-native:

- LIKWID marker regions -> `region(name)`: jax.profiler.TraceAnnotation
  scopes that show up as named spans in an xprof/tensorboard trace.
- Whole-run hardware traces -> `profile(logdir)`: jax.profiler trace
  context (open with xprof / tensorboard-profile).
- MEM_TRACER / INDEX_TRACER -> `dump_index_trace`: writes the neighbor
  indices and per-row SIMD-chunk j-distances for one timestep to
  `index_tracer_<step>.out` in the reference's spirit (tracing.h:47-123)
  — an off-hot-path host dump for gather/cache studies.
"""

from __future__ import annotations

import contextlib

import numpy as np


def region(name: str):
    """Named profiling span (LIKWID_MARKER_START/STOP analogue)."""
    import jax.profiler

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile(logdir: str):
    """Capture a device trace for xprof (jax.profiler wrapper)."""
    import jax.profiler

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def dump_index_trace(path_prefix: str, neighbors, numneigh, step: int,
                     vector_width: int = 8) -> str:
    """INDEX_TRACER-style dump (reference tracing.h:47-123): per atom the
    neighbor indices, chunked by the vector width, with min/max distance
    (in index space) per chunk — input for gather-pattern analysis."""
    path = f"{path_prefix}index_tracer_{step}.out"
    nb = np.asarray(neighbors)
    nn = np.asarray(numneigh)
    with open(path, "w") as fp:
        for i in range(nb.shape[0]):
            k = int(nn[i])
            fp.write(f"A: {i} {k}\n")
            for c0 in range(0, k, vector_width):
                chunk = nb[i, c0 : min(c0 + vector_width, k)]
                fp.write(
                    "C: %d %d\n" % (int(chunk.min()), int(chunk.max()))
                )
                fp.write("I: " + " ".join(str(int(j)) for j in chunk) + "\n")
    return path

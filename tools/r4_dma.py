"""Round-4 experiment (VERDICT r3 item 1): can list-driven in-kernel DMA
fetch beat the per-step XLA row gather for the exact-list force path?

Mechanism under test: the scalar-prefetch class — the per-unit j16 id
lists ride as PrefetchScalarGridSpec scalar operands, BlockSpec
index_maps read them to pick which rows the pipeline DMAs into VMEM, so
the DMA engine (not the scalar core issuing dynamic slices, the
measured round-1 failure; not a separate XLA gather pass) performs the
fetch, overlapped with compute by the Pallas pipeline.

Economics being measured: the XLA gather engine fetches random rows at
~400M rows/s (~2.3 cycles/row, round-2 measurement). A pipelined
BlockSpec fetch costs one DMA descriptor per (input x grid step whose
block index changed). The question is ns per list-driven DMA: if it is
>> 2.5 ns/row the mechanism cannot beat the gather at ANY granularity
and the force path keeps the gather.

    python tools/r4_dma.py

Prints ns/fetch for: (a) the XLA row-gather baseline at the benchmark's
row count, (b) list-driven (1,128)-block DMA (one j16-row-sized block
per grid step), (c) list-driven (8,128)-block DMA (8 j16 rows per
descriptor — the coalesced-run upper bound).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import fence, timeit, tunnel_rtt  # noqa: E402


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    R = 8192          # table rows (~j16 cluster count at 131k + ghosts)
    N = 65536         # fetches per call (~benchmark's 300k scaled 1/4.5)
    table = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, R, size=(N,)), jnp.int32)
    idx8 = jnp.asarray(rng.integers(0, R // 8, size=(N // 8,)), jnp.int32)

    # (a) XLA row-gather baseline (row-issue-bound reference point)
    def xla_gather(t, idx):
        return t[idx]

    t = timeit(xla_gather, table, idx)
    print("XLA row gather       : %7.2f ns/row  (%.3f ms / %d rows)"
          % (t / N * 1e9, t * 1e3, N))

    # (b) list-driven (1,128) block DMA: grid (N,), index_map reads the
    # prefetched id list. One descriptor per grid step.
    def k1(idx_ref, blk_ref, out_ref):
        out_ref[0, :] = out_ref[0, :] * 0.0 + blk_ref[0, :]

    def dma1(t, idx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, 128), lambda g, idx_ref: (idx_ref[g], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 128), lambda g, idx_ref: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            k1,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(idx, t)

    try:
        t = timeit(dma1, table, idx)
        print("prefetch DMA (1,128) : %7.2f ns/row  (%.3f ms / %d rows)"
              % (t / N * 1e9, t * 1e3, N))
    except Exception as e:  # Mosaic rejection is a result, not a crash
        print("prefetch DMA (1,128) : REJECTED —", str(e).splitlines()[0])

    # (c) (8,128) blocks: 8 consecutive rows per descriptor — the
    # coalesced z-run upper bound (runs of >=8 consecutive j16 ids)
    def k8(idx_ref, blk_ref, out_ref):
        out_ref[:, :] = out_ref[:, :] * 0.0 + blk_ref[:, :]

    def dma8(t, idx8):
        n8 = N // 8
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n8,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda g, idx_ref: (idx_ref[g], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda g, idx_ref: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            k8,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(idx8, t)

    try:
        t = timeit(dma8, table, idx8)
        print("prefetch DMA (8,128) : %7.2f ns/row  (%.3f ms / %d rows, "
              "%d descriptors)" % (t / N * 1e9, t * 1e3, N, N // 8))
    except Exception as e:
        print("prefetch DMA (8,128) : REJECTED —", str(e).splitlines()[0])


if __name__ == "__main__":
    tunnel_rtt()
    main()

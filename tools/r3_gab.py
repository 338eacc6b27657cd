"""Round-3 gather-layout A/B: can the force path's planarize copies
(0.26 ms at 131k) be folded into the row gather itself by asking XLA
for the (nu, 3, icap, 16) output layout directly (operand viewed as
(cjn, 3, 16), offset dims split around the index dim)?

    python tools/r3_gab.py

Times, at the 131k force-path shapes: (a) the current packed gather +
per-plane relayout, (b) the direct layout-fused lax.gather, (c) the
bare packed gather (isolates the relayout cost).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cjn, nu, icap = 10240, 8192, 48
    W = icap * 16
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(cjn, 48)).astype(np.float32))
    ijlist = jnp.asarray(
        rng.integers(0, cjn, size=(nu, icap)).astype(np.int32)
    )

    def cur(packed, ijlist):
        rows = packed[ijlist.reshape(-1)].reshape(nu, icap, 48)
        xjp = rows[:, :, 0:16].reshape(nu, W)
        yjp = rows[:, :, 16:32].reshape(nu, W)
        zjp = rows[:, :, 32:48].reshape(nu, W)
        return xjp + 0.0, yjp, zjp

    def bare(packed, ijlist):
        rows = packed[ijlist.reshape(-1)].reshape(nu, icap, 48)
        return rows + 0.0

    def direct(packed, ijlist):
        # flattened index batch, offsets trailing -> (nu*icap, 3, 16)
        op = packed.reshape(cjn, 3, 16)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2),
            collapsed_slice_dims=(0,),
            start_index_map=(0,),
        )
        out = jax.lax.gather(
            op, ijlist.reshape(nu * icap, 1), dn, (1, 3, 16),
        )
        return out + 0.0

    o = jax.jit(direct)(packed, ijlist)
    print("direct out shape:", o.shape)
    r = jax.jit(bare)(packed, ijlist)
    want = np.asarray(r).reshape(nu, icap, 3, 16)
    got = np.asarray(o).reshape(nu, icap, 3, 16)
    print("direct matches packed rows:", np.array_equal(want, got))

    print("cur (gather+planarize): %.3f ms" % (timeit(cur, packed, ijlist) * 1e3))
    print("bare (gather only)    : %.3f ms" % (timeit(bare, packed, ijlist) * 1e3))
    print("direct (layout-fused) : %.3f ms" % (timeit(direct, packed, ijlist) * 1e3))

    # the candidate the force path needs: (nu, 3, icap*16) planes — the
    # transpose of (icap,(3,16)) at 16-lane granularity, expressed as
    # gather output layout (batch dims nu,icap at output 0,2; offset
    # dims 3,16 at output 1,3)
    def direct2(packed, ijlist):
        op = packed.reshape(cjn, 3, 16)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0,),
        )
        out = jax.lax.gather(
            op, ijlist[:, :, None], dn, (1, 3, 16),
        )  # (nu, icap, 3, 16)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(nu, 3, W)
        return out + 0.0

    o2 = jax.jit(direct2)(packed, ijlist)
    got2 = np.asarray(o2).reshape(nu, 3, icap, 16).transpose(0, 2, 1, 3)
    print("direct2 matches:", np.array_equal(want, got2))
    print("direct2 (gather+T)    : %.3f ms" % (timeit(direct2, packed, ijlist) * 1e3))

    def direct3(packed, ijlist):
        # offset dims (3, 16) at output positions (1, 3); index batch
        # dims (nu, icap) fill positions (0, 2) -> (nu, 3, icap, 16),
        # i.e. the planar layout the kernel wants, no transpose
        op = packed.reshape(cjn, 3, 16)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0,),
        )
        out = jax.lax.gather(
            op, ijlist[:, :, None], dn, (1, 3, 16),
        )
        return out + 0.0

    try:
        o3 = jax.jit(direct3)(packed, ijlist)
        print("direct3 out shape:", o3.shape)
        got3 = np.asarray(o3).reshape(nu, 3, icap, 16).transpose(0, 2, 1, 3)
        print("direct3 matches:", np.array_equal(want, got3))
        print("direct3 (interleaved) : %.3f ms" % (timeit(direct3, packed, ijlist) * 1e3))
    except Exception as e:  # noqa: BLE001
        print("direct3 failed:", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()

"""Single-pass Pallas exact-list kernel (kernel="ilist_pl" — the TPU
fast path) in interpret mode, against the XLA twin and the group-list
oracle; plus the share=2 list axis itself."""

import numpy as np
import pytest

from mdbench_tpu.config import Params
from mdbench_tpu.engine_cluster import ClusterSimulation

pytestmark = pytest.mark.slow  # engine-level: minutes of XLA:CPU compile on 1 vCPU

def test_ilist_pallas_forces_match_xla_twin():
    p1 = Params(precision="sp", kernel="ilist_pl", nx=4, ny=4, nz=4)
    p2 = Params(precision="sp", kernel="ilist", nx=4, ny=4, nz=4)
    f1 = ClusterSimulation(p1).first_force_atoms()
    f2 = ClusterSimulation(p2).first_force_atoms()
    # same lists, same pair order, same arithmetic -> only the reduce
    # association differs (lane fold + ones-dot vs XLA row reduce)
    # (forces at step 0 are near-zero by FCC symmetry; the trajectory
    # test below exercises non-trivial forces)
    assert np.abs(f1 - f2).max() < 1e-4


def test_ilist_pallas_trajectory_vs_group_oracle():
    p1 = Params(precision="sp", kernel="ilist_pl", nx=4, ny=4, nz=4,
                ntimes=20)
    p2 = Params(precision="sp", kernel="xla", nx=4, ny=4, nz=4, ntimes=20)
    r1 = ClusterSimulation(p1).run()
    r2 = ClusterSimulation(p2).run()
    assert np.abs(np.asarray(r1.temps) - np.asarray(r2.temps)).max() < 2e-3


def test_share2_lists_halve_rows():
    p = Params(precision="dp", kernel="ilist", nx=5, ny=5, nz=5)
    sim = ClusterSimulation(p)
    assert sim.ishare == 2
    st = sim.initial_state()
    nu = np.asarray(st.pairs.ijlist).shape[0]
    assert nu * 2 == sim.n_clusters_pad
    # every i-cluster's exact neighbors must be covered by its unit list
    nji = np.asarray(st.pairs.nji)
    assert (nji > 0).any()


def test_fused_gather_layout_matches_packed(monkeypatch):
    """ILIST_GATHER="fused" (layout-fused lax.gather, zero relayout
    copies) produces identical forces to the packed-row form."""
    import jax.numpy as jnp
    import numpy as np

    from mdbench_tpu.ops.pallas import lj_cluster as ljc

    rng = np.random.default_rng(3)
    cjn, nu, icap, share = 256, 64, 16, 2
    n_pad = nu * share
    xc = jnp.asarray(rng.normal(0, 1.0, (cjn * 2, 8)).astype(np.float32))
    yc = jnp.asarray(rng.normal(0, 1.0, (cjn * 2, 8)).astype(np.float32))
    zc = jnp.asarray(rng.normal(0, 1.0, (cjn * 2, 8)).astype(np.float32))
    ijl = jnp.asarray(rng.integers(0, cjn, (nu, icap)).astype(np.int32))

    def run():
        return ljc.lj_cluster_force_ilist_pallas(
            xc, yc, zc, ijl, n_pad, 2.5**2, 1.0, 1.0, share=share,
            interpret=True,
        )

    fx_a, fy_a, fz_a = run()
    monkeypatch.setattr(ljc, "ILIST_GATHER", "fused")
    fx_b, fy_b, fz_b = run()
    np.testing.assert_array_equal(np.asarray(fx_b), np.asarray(fx_a))
    np.testing.assert_array_equal(np.asarray(fy_b), np.asarray(fy_a))
    np.testing.assert_array_equal(np.asarray(fz_b), np.asarray(fz_a))

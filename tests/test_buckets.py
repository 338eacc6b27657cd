"""Capacity-bucketed exact-list force (engine_cluster._force_buckets +
attach_bucket_maps): force parity with the flat-capacity paths in
interpret mode, and overflow detection when a cap is too small."""

import numpy as np
import pytest

from mdbench_tpu.config import Params
from mdbench_tpu.engine_cluster import ClusterSimulation

pytestmark = pytest.mark.slow  # engine-level: minutes of XLA:CPU compile on 1 vCPU

def _bucketed_sim(nx=8, cap_a_slack=6, **kw):
    p = Params(precision="sp", kernel="ilist_pl", nx=nx, ny=nx, nz=nx,
               **kw)
    sim = ClusterSimulation(p)
    st = sim.initial_state()
    nji = np.sort(np.asarray(st.pairs.nji))
    nu = nji.shape[0]
    cap_a = (int(nji[int(0.5 * nu)]) + cap_a_slack + 7) // 8 * 8
    cap_a = min(cap_a, sim.icap - 8)
    n_a = max(int(0.4 * nu) // 64 * 64, 64)
    n_c = max(64, (nu - n_a + 63) // 64 * 64)
    sim.buckets = ((n_a, n_c), (max(cap_a, 8), sim.icap))
    return sim


def test_bucketed_forces_match_flat():
    sim_b = _bucketed_sim()
    f_b = sim_b.first_force_atoms()
    p2 = Params(precision="sp", kernel="ilist", nx=8, ny=8, nz=8)
    f_flat = ClusterSimulation(p2).first_force_atoms()
    assert np.abs(f_b - f_flat).max() < 1e-4


def test_bucketed_trajectory_runs():
    sim = _bucketed_sim(ntimes=25, reneigh_every=10)
    out = sim.run()
    t = np.asarray(out.temps)
    assert t.shape == (25,)
    assert np.isfinite(t).all()
    assert not np.asarray(out.state.overflow).any()


def test_bucket_overflow_flagged_and_grown():
    sim = _bucketed_sim(ntimes=4)
    sizes, caps = sim.buckets
    # cap far below what bucket A's units need -> iovf -> grow path
    sim.buckets = (sizes, (8, caps[1]))
    out = sim.run()  # run() must grow caps and retry
    assert np.isfinite(np.asarray(out.temps)).all()
    assert sim.buckets[1][0] > 8


def test_zero_tier_matches_flat():
    """A cap-0 bucket (plan_capacity_buckets zero_tier) skips the
    kernel for structurally-empty padding units; forces must stay
    identical to the flat path."""
    sim = _bucketed_sim()
    st = sim.initial_state()
    nji = np.asarray(st.pairs.nji)
    nz = int((np.sort(nji) == 0).sum()) // 64 * 64
    if nz < 64:
        import pytest

        pytest.skip("no 64-granule of empty units at this box size")
    sizes, caps = sim.buckets
    nu = nji.shape[0]
    n_rest = max(64, (nu - nz + 63) // 64 * 64)
    sim.buckets = ((nz, n_rest), (0, sim.icap))
    f_b = sim.first_force_atoms()
    p2 = Params(precision="sp", kernel="ilist", nx=8, ny=8, nz=8)
    f_flat = ClusterSimulation(p2).first_force_atoms()
    assert np.abs(f_b - f_flat).max() < 1e-4


def test_planner_zero_tier_and_cap_enumeration():
    from mdbench_tpu.ops.cluster import plan_capacity_buckets

    rng = np.random.default_rng(0)
    nji = np.concatenate([
        np.zeros(1600, np.int32),
        rng.integers(25, 42, size=8192).astype(np.int32),
    ])
    plan = plan_capacity_buckets(nji, 48, 2, margin=2, zero_tier=True)
    assert plan is not None
    sizes, caps = plan
    assert caps[0] == 0 and sizes[0] >= 64
    assert all(c % 8 == 0 for c in caps[1:])
    assert caps[-1] == 48
    assert sum(sizes) >= nji.shape[0]
    # sorted assignment must hold on the planning distribution
    srt = np.sort(nji)
    off = 0
    for n_k, c_k in zip(sizes, caps):
        hi = min(off + n_k, srt.shape[0])
        if hi > off:
            assert srt[hi - 1] <= c_k
        off = hi

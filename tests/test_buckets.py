"""Capacity-bucketed exact-list force (engine_cluster._force_buckets +
attach_bucket_maps): force parity with the flat-capacity paths in
interpret mode, and overflow detection when a cap is too small."""

import numpy as np

from mdbench_tpu.config import Params
from mdbench_tpu.engine_cluster import ClusterSimulation


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

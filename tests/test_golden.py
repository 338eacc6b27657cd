"""Golden-trajectory parity against the compiled C reference.

The golden values below were produced by BUILDING AND RUNNING the actual
reference (no code copied — the binary's stdout is the oracle):

    cp -r /root/reference build && cd build
    make TOOLCHAIN=GCC SIMD=NONE ENABLE_OPENMP=false
    echo "nstat 10" > nstat10.conf
    ./MDBench-VL-GCC-X86-DP -p nstat10.conf -nx 6 -ny 6 -nz 6 -n 100
    ./MDBench-VL-GCC-X86-DP -p nstat10.conf -f eam \
        -e data/Cu_u3.eam -nx 6 -ny 6 -nz 6 -n 50

Both engines integrate the same deterministic initial conditions (the
bit-exact Park-Miller lattice), so in DP the temperature/pressure traces
agree to FP-summation-order noise (~1e-7 relative) across 100 steps and
5 reneighbor events — the strongest available end-to-end parity check
(SURVEY §4 validation mechanism 2).
"""


import numpy as np
import pytest

from mdbench_tpu.config import FF_EAM, Params
from mdbench_tpu.engine import Simulation

pytestmark = pytest.mark.slow  # trajectory/engine tier: run with the full suite

# step -> (temperature, pressure), LJ 6x6x6, DP, defaults otherwise
GOLDEN_LJ = {
    0: (1.440000e00, 1.214241e00),
    10: (1.205134e00, 1.016196e00),
    20: (7.279416e-01, 6.138170e-01),
    30: (6.631061e-01, 5.591463e-01),
    40: (7.682416e-01, 6.477989e-01),
    50: (7.717707e-01, 6.507747e-01),
    60: (7.310144e-01, 6.164081e-01),
    70: (7.723809e-01, 6.512893e-01),
    80: (7.580772e-01, 6.392281e-01),
    90: (7.756821e-01, 6.540729e-01),
    100: (7.508457e-01, 6.331303e-01),
}

# EAM Cu_u3, 6x6x6, 50 steps
GOLDEN_EAM = {
    0: (6.000000e02, 5.826047e03),
    10: (5.779018e02, 5.611472e03),
    20: (5.155637e02, 5.006164e03),
    30: (4.242325e02, 4.119330e03),
    40: (3.234145e02, 3.140380e03),
    50: (2.368962e02, 2.300281e03),
}


def test_lj_trajectory_matches_c_reference():
    p = Params(nx=6, ny=6, nz=6, ntimes=100)
    out = Simulation(p).run()
    for step, (t_gold, p_gold) in GOLDEN_LJ.items():
        if step == 0:
            continue
        assert out.temps[step - 1] == pytest.approx(t_gold, rel=5e-6)
        assert out.press[step - 1] == pytest.approx(p_gold, rel=5e-6)


def test_lj_cluster_scheme_matches_c_reference():
    from mdbench_tpu.engine_cluster import ClusterSimulation

    p = Params(nx=6, ny=6, nz=6, ntimes=100, kernel="xla")
    out = ClusterSimulation(p).run()
    # the cluster scheme sums pairs in a different order than the C
    # verlet loop; the ~1e-16 rounding difference grows at the Lyapunov
    # rate (~e^0.25/step), reaching ~1e-5 by step 100 — physical, not a
    # bug (measured: 1.7e-6 @30, 8.6e-6 @100)
    for step, (t_gold, _) in GOLDEN_LJ.items():
        if step == 0:
            continue
        assert out.temps[step - 1] == pytest.approx(t_gold, rel=1e-4)


def test_eam_trajectory_matches_c_reference():
    p = Params(
        nx=6, ny=6, nz=6, ntimes=50, force_field=FF_EAM,
        eam_file="/root/reference/data/Cu_u3.eam",
    )
    out = Simulation(p).run()
    for step, (t_gold, p_gold) in GOLDEN_EAM.items():
        if step == 0:
            continue
        assert out.temps[step - 1] == pytest.approx(t_gold, rel=5e-6)
        assert out.press[step - 1] == pytest.approx(p_gold, rel=5e-6)


def test_eam_cluster_scheme_matches_c_reference():
    """Cluster-scheme EAM (poly pair evaluation — an axis the reference
    left as a dead stub) against the C verlet-scheme golden trace: the
    ~1e-6 polynomial fit residual plus cluster-order summation noise
    grows at the Lyapunov rate, so the tolerance is looser than the
    spline path's 5e-6 but still binds the trajectory to the
    reference's physics."""
    from mdbench_tpu.engine_cluster import ClusterSimulation

    p = Params(
        nx=6, ny=6, nz=6, ntimes=50, force_field=FF_EAM,
        eam_file="/root/reference/data/Cu_u3.eam", kernel="ilist",
    )
    out = ClusterSimulation(p).run()
    for step, (t_gold, _) in GOLDEN_EAM.items():
        if step == 0:
            continue
        assert out.temps[step - 1] == pytest.approx(t_gold, rel=2e-3)


# EAM Cu_u6 variant (second funcfl file in reference data/), 6x6x6,
# 50 steps; generated with the same binary + `-e data/Cu_u6.eam`
GOLDEN_EAM_U6 = {
    10: (5.769310e02, 5.602045e03),
    20: (5.121007e02, 4.972538e03),
    30: (4.179043e02, 4.057883e03),
    40: (3.153886e02, 3.062448e03),
    50: (2.294434e02, 2.227913e03),
}


def test_eam_cu_u6_trajectory_matches_c_reference():
    """Second EAM table file: exercises the funcfl reader + spline
    re-interpolation on different grid parameters."""
    p = Params(
        nx=6, ny=6, nz=6, ntimes=50, force_field=FF_EAM,
        eam_file="/root/reference/data/Cu_u6.eam",
    )
    out = Simulation(p).run()
    for step, (t_gold, p_gold) in GOLDEN_EAM_U6.items():
        assert out.temps[step - 1] == pytest.approx(t_gold, rel=5e-6)
        assert out.press[step - 1] == pytest.approx(p_gold, rel=5e-6)


def test_lj_half_neighbor_matches_c_reference():
    """half_neigh=1 (Newton scatter path) against the same golden trace
    (the reference's half and full traces coincide at this tolerance —
    verified by running the binary with -half 1)."""
    p = Params(nx=6, ny=6, nz=6, ntimes=50, half_neigh=1)
    out = Simulation(p).run()
    for step, (t_gold, _) in GOLDEN_LJ.items():
        if step == 0 or step > 50:
            continue
        assert out.temps[step - 1] == pytest.approx(t_gold, rel=1e-5)

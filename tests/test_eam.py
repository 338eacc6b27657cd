"""EAM: table builder + two-pass force vs scalar oracle + engine run."""

import numpy as np
import pytest

from mdbench_tpu.config import FF_EAM, Params
from mdbench_tpu.engine import Simulation
from mdbench_tpu.models.eam_tables import load_eam
from tests.reference_impls import eam_force_reference

EAM_FILE = "/root/reference/data/Cu_u3.eam"


def test_funcfl_header_and_tables():
    t = load_eam(EAM_FILE)
    assert t.mass == pytest.approx(63.55)
    assert t.cut == pytest.approx(4.95, abs=1e-6)
    # global grid = int((n-1)*d/d + 0.5) = n-1 (eam_utils.c:115-117)
    assert t.nr == 499 and t.nrho == 499
    # spline value column reproduces the (re-interpolated) input
    assert np.isfinite(t.frho_spline[1:]).all()
    assert np.isfinite(t.z2r_spline[1:]).all()


@pytest.mark.slow  # engine compile on 1-vCPU CI
def test_eam_first_force_matches_scalar_oracle():
    p = Params(nx=3, ny=3, nz=3, force_field=FF_EAM, eam_file=EAM_FILE)
    sim = Simulation(p)
    f = sim.first_force()
    f_ref = eam_force_reference(
        sim._x0, sim.prd, p.cutforce, sim.eam_tables
    )
    np.testing.assert_allclose(f, f_ref, rtol=1e-8, atol=1e-10)


def test_eam_overrides_applied():
    p = Params(nx=3, ny=3, nz=3, force_field=FF_EAM, eam_file=EAM_FILE)
    Simulation(p)
    assert p.mass == pytest.approx(63.55)
    assert p.cutforce == pytest.approx(4.95, abs=1e-6)
    assert p.cutneigh == pytest.approx(5.95, abs=1e-6)
    assert p.temp == 600.0
    assert p.dt == 0.001
    assert p.rho == pytest.approx(0.07041125)


@pytest.mark.slow
def test_eam_short_run_stable():
    p = Params(nx=4, ny=4, nz=4, force_field=FF_EAM, eam_file=EAM_FILE,
               ntimes=30, reneigh_every=10)
    sim = Simulation(p)
    out = sim.run()
    assert not bool(out.state.overflow)
    assert np.isfinite(out.temps).all()
    # starts at the EAM target temperature
    t0 = out.temps[0]
    assert 100 < t0 < 700  # cools from 600 as the lattice absorbs KE

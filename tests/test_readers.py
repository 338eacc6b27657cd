"""File readers against the reference's real data files, plus the
write/read round-trip (reference -w + .in reload)."""

import numpy as np
import pytest

from mdbench_tpu.config import Params
from mdbench_tpu.io.readers import (
    read_atom,
    read_atom_dmp,
    read_atom_gro,
    read_atom_in,
)

DATA = "/root/reference/data"


def test_read_dmp_copper():
    r = read_atom_dmp(f"{DATA}/copper_melting/input_lj_cu_one_atomtype_20x20x20.dmp")
    assert r.x.shape == (32000, 3)
    assert r.box == pytest.approx((33.591923827650149,) * 3)
    assert r.ntypes == 1
    assert (r.types == 0).all()
    # first atom from the file
    np.testing.assert_allclose(r.x[0], [0, 0, 0])
    np.testing.assert_allclose(r.v[0], [-0.121524, -0.558288, -1.68102])
    np.testing.assert_allclose(r.x[5], [2.51939, 0.839798, 0])


def test_read_dmp_two_types():
    r = read_atom_dmp(f"{DATA}/copper_melting/input_lj_cu_two_atomtypes_20x20x20.dmp")
    assert r.ntypes == 2
    assert set(np.unique(r.types)) == {0, 1}


def test_read_gro_argon():
    r = read_atom_gro(f"{DATA}/argon/input.gro")
    assert r.x.shape[0] == 1000
    assert r.ntypes == 1
    assert r.box is not None and r.box[0] > 0
    np.testing.assert_allclose(r.x[0], [3.161, 1.507, 3.589])
    np.testing.assert_allclose(r.v[0], [-0.2076, -0.0331, 0.1963])


def test_dispatch_and_box_override():
    p = Params()
    p.input_file = f"{DATA}/argon/input.gro"
    r = read_atom(p)
    assert p.xprd == pytest.approx(r.box[0])


def test_in_roundtrip(tmp_path):
    """writeAtom CSV -> read_atom_in (the reference's restart loop)."""
    path = tmp_path / "state.in"
    n = 5
    rng = np.random.default_rng(0)
    x = rng.random((n, 3)) * 10
    v = rng.standard_normal((n, 3))
    with open(path, "w") as fp:
        fp.write(f"{n} 0.0 10.0 0.0 10.0 0.0 10.0\n")
        for i in range(n):
            fp.write(
                "%d,%f,%f,%f,%f,%f,%f,%f,0\n"
                % (0, 1.0, x[i, 0], x[i, 1], x[i, 2], v[i, 0], v[i, 1], v[i, 2])
            )
    r = read_atom_in(str(path))
    np.testing.assert_allclose(r.x, x, atol=1e-6)
    np.testing.assert_allclose(r.v, v, atol=1e-6)
    assert r.box == (10.0, 10.0, 10.0)


def test_native_loader_matches_python():
    from mdbench_tpu.io import native

    if not native.available():
        pytest.skip("no native toolchain")
    path = f"{DATA}/copper_melting/input_lj_cu_two_atomtypes_20x20x20.dmp"
    x, v, types, box = native.parse(path, "dmp")
    # compare against the pure-Python fallback parse of the same file
    import numpy as _np

    natoms = 0
    with open(path) as fp:
        lines = iter(fp)
        for line in lines:
            if not line.startswith("ITEM: "):
                continue
            item = line[6:]
            if item.startswith("TIMESTEP"):
                next(lines)
            elif item.startswith("NUMBER OF ATOMS"):
                natoms = int(next(lines))
                xp = _np.zeros((natoms, 3)); vp = _np.zeros((natoms, 3))
                tp = _np.zeros(natoms, _np.int32)
            elif item.startswith("BOX BOUNDS pp pp pp"):
                bp = []
                for d in range(3):
                    lo, hi = map(float, next(lines).split()[:2])
                    bp.append(hi - lo)
            elif item.startswith("ATOMS id type x y z vx vy vz"):
                for _ in range(natoms):
                    t = next(lines).split()
                    aid = int(t[0]) - 1
                    tp[aid] = int(t[1]) - 1
                    xp[aid] = [float(t[2]), float(t[3]), float(t[4])]
                    vp[aid] = [float(t[5]), float(t[6]), float(t[7])]
                break
    np.testing.assert_array_equal(x, xp)
    np.testing.assert_array_equal(v, vp)
    np.testing.assert_array_equal(types, tp)
    np.testing.assert_allclose(box, bp)

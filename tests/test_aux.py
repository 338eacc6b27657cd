"""Auxiliary subsystems: stub benchmark, checkpoint/resume, tracing
dumps, TRR trajectory round-trip."""

import numpy as np
import pytest

from mdbench_tpu.config import Params
from mdbench_tpu.engine import Simulation
from mdbench_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from mdbench_tpu.io.trr import read_trr, xtc_end, xtc_init, xtc_write
from mdbench_tpu.stub import create_neighbors, run_stub
from mdbench_tpu.tracing import dump_index_trace


def test_stub_patterns():
    n, nn = 64, 8
    for pattern in ("seq", "fix", "rand"):
        neigh, numneigh = create_neighbors(n, pattern, nn, nreps=2)
        assert neigh.shape == (n, nn * 2)
        assert (numneigh == nn * 2).all()
        # replication (main-stub.c:97-102)
        np.testing.assert_array_equal(neigh[:, :nn], neigh[:, nn:])
        if pattern == "rand":
            for i in range(n):
                assert i not in neigh[i]
                assert len(set(neigh[i, :nn])) == nn
    assert (create_neighbors(n, "seq", nn, 1)[0][5, 0]) == 6


@pytest.mark.slow  # engine compile on 1-vCPU CI
def test_stub_runs(capsys):
    r = run_stub(natoms=512, nneighs=16, ntimes=5, csv=True)
    assert r["mega_updates"] > 0
    out = capsys.readouterr().out
    assert "steps,pattern" in out


@pytest.mark.slow  # engine compile on 1-vCPU CI
def test_stub_eam_runs():
    """-f eam stub axis (reference main-stub.c:129,200,269): the
    two-pass EAM kernel over synthetic lists, cutforce = table cutoff."""
    r = run_stub(
        natoms=512, nneighs=16, ntimes=3, force_field="eam",
        eam_file="/root/reference/data/Cu_u3.eam",
    )
    assert r["mega_updates"] > 0
    assert r["force_field"] == "eam"


@pytest.mark.slow  # engine compile on 1-vCPU CI
def test_checkpoint_roundtrip(tmp_path):
    p = Params(nx=3, ny=3, nz=3, ntimes=10, reneigh_every=5)
    sim = Simulation(p)
    out = sim.run()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, sim, out.state, step=10)
    x, v, types, meta = load_checkpoint(path)
    assert meta["step"] == 10
    assert x.shape == (sim.natoms, 3)
    assert types is not None and types.shape == (sim.natoms,)
    # resume: new sim continues from the checkpoint incl. type assignments
    sim2 = Simulation(p, x=x, v=v, types=types, adjust=False)
    out2 = sim2.run(ntimes=5)
    assert np.isfinite(out2.temps).all()
    # continuity: first post-resume temperature close to last pre-save
    assert abs(out2.temps[0] - out.temps[-1]) < 0.2


@pytest.mark.slow  # engine compile on 1-vCPU CI
def test_cluster_stub_runs():
    """Cluster-scheme synthetic-list microbenchmark (reference
    clusterpair/main-stub.c analogue)."""
    from mdbench_tpu.stub import run_cluster_stub

    r = run_cluster_stub(natoms=2048, nneighs=8, ntimes=2, pattern="rand")
    assert r["mega_updates"] > 0
    assert r["scheme"] == "cluster"


@pytest.mark.slow  # engine compile on 1-vCPU CI
def test_cluster_vtk_four_files(tmp_path):
    """The clusterpair 4-file VTK dump writes all four files with
    parseable headers."""
    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import ClusterSimulation
    from mdbench_tpu.io.vtk import write_cluster_vtk_files

    p = Params(nx=3, ny=3, nz=3, kernel="xla")
    sim = ClusterSimulation(p)
    st = sim.initial_state()
    files = write_cluster_vtk_files(
        str(tmp_path / "c"), st.clusters, sim.n_clusters_pad,
        int(st.halo.nghost), 0,
    )
    assert len(files) == 4
    for f in files:
        head = open(f).readline()
        assert head.startswith("# vtk DataFile"), f


@pytest.mark.slow  # engine compile on 1-vCPU CI
def test_cluster_run_chunked_trajectory(tmp_path):
    """Cluster-scheme in-loop trajectory output: run_chunked covers
    exactly ntimes steps for a non-dividing cadence and the callback
    sees every boundary; temps match an unchunked run of the same
    trajectory."""
    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import ClusterSimulation

    mk = lambda: Params(nx=3, ny=3, nz=3, kernel="xla", ntimes=13)
    steps = []
    out = ClusterSimulation(mk()).run_chunked(
        5, 2, lambda st, step: steps.append(step), tail=3
    )
    assert steps == [0, 5, 10, 13]
    assert out.temps.shape == (13,)
    ref = ClusterSimulation(mk()).run(ntimes=13)
    np.testing.assert_allclose(out.temps, ref.temps, rtol=1e-12)


def test_native_writers_byte_identical(tmp_path, monkeypatch):
    """The C++ fast writers (native/fast_writers.cpp) must produce
    byte-identical VTK / tracer files to the pure-Python fallbacks."""
    from mdbench_tpu.io import native
    from mdbench_tpu.io.vtk import write_atoms_to_vtk_file
    from mdbench_tpu.tracing import dump_index_trace, dump_mem_trace

    if native._load_writers() is None:
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.RandomState(0)
    x = rng.rand(37, 3) * 10
    nb = rng.randint(0, 40, (37, 12)).astype(np.int32)
    nn = rng.randint(0, 13, 37).astype(np.int32)

    p_native = write_atoms_to_vtk_file(str(tmp_path / "n"), x, 0)
    i_native = dump_index_trace(str(tmp_path / "n_"), nb, nn, 0)
    m_native = dump_mem_trace(str(tmp_path / "n_"), nb, nn, 1,
                              nlocal=37, float_size=4)

    # force the Python fallbacks
    monkeypatch.setattr(native, "write_atoms_vtk", lambda *a: False)
    monkeypatch.setattr(native, "write_index_trace", lambda *a: False)
    monkeypatch.setattr(native, "write_mem_trace", lambda *a: False)
    p_py = write_atoms_to_vtk_file(str(tmp_path / "p"), x, 0)
    i_py = dump_index_trace(str(tmp_path / "p_"), nb, nn, 0)
    m_py = dump_mem_trace(str(tmp_path / "p_"), nb, nn, 1,
                          nlocal=37, float_size=4)

    for a, b in ((p_native, p_py), (i_native, i_py), (m_native, m_py)):
        assert open(a, "rb").read() == open(b, "rb").read(), (a, b)


def test_index_trace_dump(tmp_path):
    p = Params(nx=3, ny=3, nz=3)
    sim = Simulation(p)
    st = sim.initial_state()
    path = dump_index_trace(
        str(tmp_path) + "/", st.nlist.neighbors[: sim.nlocal],
        st.nlist.numneigh[: sim.nlocal], step=0,
    )
    lines = open(path).read().splitlines()
    assert lines[0].startswith("A: 0 ")
    assert any(l.startswith("C: ") for l in lines)
    assert any(l.startswith("I: ") for l in lines)


def test_trr_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x1 = rng.random((100, 3)) * 10
    x2 = x1 + 0.1
    w = xtc_init(str(tmp_path / "traj.trr"), box=(10.0, 11.0, 12.0))
    xtc_write(w, x1, step=0, time=0.0)
    xtc_write(w, x2, step=20, time=0.1)
    xtc_end(w)
    frames = read_trr(w.path)
    assert len(frames) == 2
    step, t, box, x, v = frames[0]
    assert step == 0 and box == (10.0, 11.0, 12.0)
    np.testing.assert_allclose(x, x1, atol=1e-5)
    assert frames[1][0] == 20
    np.testing.assert_allclose(frames[1][3], x2, atol=1e-5)


def test_xtc_roundtrip_compressed(tmp_path):
    """Real XTC (XDR 3dfcoord, reference xtc.c:13-65): lossy at the
    stated precision; the decoder must invert the encoder exactly at
    integer level, so |err| <= 0.5/precision."""
    from mdbench_tpu.io.xtc import read_xtc, write_xtc_frame

    rng = np.random.default_rng(7)
    # clustered coords exercise the small-delta run-length path (the
    # encoder reorders near pairs), spread ones the key-atom path
    base = rng.random((40, 3)) * 8
    x1 = np.repeat(base, 3, axis=0) + rng.random((120, 3)) * 0.05
    x2 = x1 + (rng.random((120, 3)) - 0.5) * 0.3
    path = str(tmp_path / "traj.xtc")
    with open(path, "wb") as fp:
        write_xtc_frame(fp, x1, (10.0, 11.0, 12.0), step=0, time=0.0)
        write_xtc_frame(fp, x2, (10.0, 11.0, 12.0), step=20, time=0.1)
    frames = read_xtc(path)
    assert len(frames) == 2
    assert frames[0]["step"] == 0 and frames[1]["step"] == 20
    np.testing.assert_allclose(frames[0]["box"][0, 0], 10.0)
    np.testing.assert_allclose(frames[0]["x"], x1, atol=0.5001e-3)
    np.testing.assert_allclose(frames[1]["x"], x2, atol=0.5001e-3)
    # compression actually engaged (file much smaller than raw floats)
    import os

    assert os.path.getsize(path) < 2 * (16 + 36 + 120 * 12)


def test_xtc_small_system_uncompressed(tmp_path):
    from mdbench_tpu.io.xtc import read_xtc, write_xtc_frame

    x = np.arange(27, dtype=np.float64).reshape(9, 3) * 0.37
    path = str(tmp_path / "small.xtc")
    with open(path, "wb") as fp:
        write_xtc_frame(fp, x, (5.0, 5.0, 5.0))
    f = read_xtc(path)[0]
    np.testing.assert_allclose(f["x"], x, atol=1e-6)


def test_xtc_writer_dispatch_by_extension(tmp_path):
    from mdbench_tpu.io.xtc import read_xtc

    x = np.random.default_rng(3).random((64, 3)) * 6
    w = xtc_init(str(tmp_path / "t.xtc"), box=(6.0, 6.0, 6.0))
    xtc_write(w, x, step=0, time=0.0)
    xtc_end(w)
    np.testing.assert_allclose(read_xtc(w.path)[0]["x"], x, atol=6e-4)


@pytest.mark.slow
def test_run_chunked_overflow_recovery():
    """Mid-trajectory capacity overflow must grow-and-REPLAY the failed
    chunk from the last good boundary, producing the trajectory an
    uninterrupted run writes (VERDICT r3 item 6; reference anchor: the
    in-loop resize loop never aborts, verletlist/neighbor.c:247-262)."""
    mk = lambda: Params(nx=8, ny=4, nz=4, ntimes=30, reneigh_every=10,
                        kernel="rowlist")
    oracle = Simulation(mk()).run()

    sim = Simulation(mk())
    st0 = sim.initial_state()
    nrmax = int(np.asarray(st0.nlist.numrows).max())
    # pin rcap at the cold-lattice maximum: fits t=0, overflows once the
    # melt widens the row unions at a later rebuild
    sim._rcap_calibrated = True
    sim._melt_calibrated = True
    sim.rcap = (nrmax + 7) // 8 * 8
    rcap0 = sim.rcap
    sim._build_device_state()
    steps = []
    out = sim.run_chunked(10, 3, lambda s, step: steps.append(step))
    assert sim.rcap > rcap0, "recovery never fired: overflow not forced"
    assert steps == [0, 10, 20, 30]
    np.testing.assert_allclose(out.temps, oracle.temps, rtol=1e-9,
                               atol=1e-12)


@pytest.mark.slow
def test_cluster_run_chunked_overflow_recovery():
    """Cluster-engine twin of the chunked overflow recovery: pin icap at
    the cold-lattice nji maximum, force a mid-run ilist overflow, assert
    the recovered trajectory equals the uninterrupted run's."""
    from mdbench_tpu.engine_cluster import ClusterSimulation

    # temp 6x the default: the hot melt inflates the per-unit nji past
    # the cold-lattice maximum within a couple of rebuilds
    mk = lambda: Params(nx=8, ny=4, nz=4, ntimes=30, reneigh_every=10,
                        kernel="ilist", temp=9.0)
    oracle = ClusterSimulation(mk()).run()

    sim = ClusterSimulation(mk())
    st0 = sim.initial_state()
    need = int(np.asarray(st0.pairs.nji).max())
    sim.icap = need  # exact cold fit — melt growth overflows it
    icap0 = sim.icap
    out = sim.run_chunked(10, 3, lambda s, step: None)
    assert sim.icap > icap0, "recovery never fired: overflow not forced"
    np.testing.assert_allclose(out.temps, oracle.temps, rtol=1e-9,
                               atol=1e-12)

"""bf16 derive prune (ops/cluster.derive_ilists bf16=True): the
inflated-cutoff bf16 distance check must keep a SUPERSET of the exact
f32/f64 lists (physics safety — the force kernel applies the exact
cutoff, so extra entries only pad), with a small excess rate, and no
sentinel-padding aliasing (the per-slot sentinel displacement is
invisible at bf16 precision, so padding atoms are masked explicitly)."""

import jax
import numpy as np
import pytest

from mdbench_tpu.config import Params
from mdbench_tpu.engine_cluster import GROUP, ClusterSimulation
from mdbench_tpu.ops.cluster import derive_ilists

pytestmark = pytest.mark.slow  # engine-level: minutes of XLA:CPU compile on 1 vCPU

def _lists(sim, state, bf16):
    pairs = derive_ilists(
        state.clusters, state.pairs, sim.n_clusters_pad, GROUP,
        sim.params.cutneigh, sim.icap, share=sim.ishare, bf16=bf16,
    )
    return np.asarray(pairs.ijlist), np.asarray(pairs.nji)


@pytest.mark.parametrize("heated", [False, True])
def test_bf16_lists_superset_of_exact(heated):
    p = Params(nx=6, ny=6, nz=6, precision="sp", kernel="ilist",
               ntimes=20, reneigh_every=10)
    sim = ClusterSimulation(p)
    if heated:
        out = sim.run()  # 20 heated steps -> disordered coordinates
        state = out.state
    else:
        state = sim.initial_state()
    jax.block_until_ready(state)

    jl_f32, nji_f32 = _lists(sim, state, bf16=False)
    jl_b16, nji_b16 = _lists(sim, state, bf16=True)

    sentinel = int(np.asarray(state.clusters.xc).shape[0] // 2 - 1)
    excess = 0
    for u in range(jl_f32.shape[0]):
        exact = set(jl_f32[u][jl_f32[u] != sentinel].tolist())
        loose = set(jl_b16[u][jl_b16[u] != sentinel].tolist())
        assert exact <= loose, f"unit {u} dropped exact entries"
        # sentinel masking: kept (non-sentinel) entries match the count
        # — a padding j16 surviving the bf16 keep would inflate nji
        # beyond the compacted non-sentinel prefix
        assert len(loose) == nji_b16[u], (u, len(loose), nji_b16[u])
        excess += len(loose) - len(exact)
    total = int((jl_f32 != sentinel).sum())
    # the inflated cutoff keeps only a boundary shell of extras
    assert excess <= 0.12 * total + 8, (excess, total)
    # no sentinel aliasing: padding j16s never survive the bf16 keep
    # (they would inflate nji for column-tail units)
    assert nji_b16.max() <= sim.icap
    assert (nji_b16 >= nji_f32).all()

"""Headline benchmark: the reference's default workload — Cu-like FCC
32x32x32 cells = 131,072 atoms, LJ sigma=eps=1.0, 200 steps, cutoff 2.5,
skin 0.3, reneighbor every 20 (reference: parameter.c:27-50, README.md:60-62).

Metric: million atom-updates per second = 1e-6 * Natoms * ntimes / TOTAL
(reference: src/verletlist/main.c:337-338). Baseline: 500 M/s north-star
target on one v5e chip (BASELINE.md).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import sys

# Golden temperature trace for the EXACT benchmark workload, produced by
# building and running the C reference (binary stdout is the oracle, no
# code copied):
#   cp -r /root/reference /tmp/mdb && cd /tmp/mdb
#   make TOOLCHAIN=GCC SIMD=NONE ENABLE_OPENMP=false
#   echo "nstat 10" > nstat10.conf
#   ./MDBench-VL-GCC-X86-DP -p nstat10.conf -n 200
# step -> temperature (DP). The bench gates the SP Pallas trajectory on
# these before printing a score: a fast-but-wrong kernel must FAIL here,
# not post a number (VERDICT r1 "on-TPU correctness gate").
GOLDEN_TEMP_131K = {
    20: 6.895877e-01, 40: 6.637927e-01, 60: 8.179967e-01,
    80: 8.584812e-01, 100: 8.200911e-01, 120: 8.084264e-01,
    140: 8.014512e-01, 160: 7.924040e-01, 180: 7.959717e-01,
    200: 7.961535e-01,
}


def check_golden(temps, reneigh_every: int) -> None:
    """Assert the run's temperature at reneighbor boundaries against the
    DP golden trace. SP trajectories decorrelate from DP over time
    (chaotic dynamics), but temperature is an N-averaged aggregate, so
    early steps must match tightly and late steps within SP drift."""
    for step, t_gold in GOLDEN_TEMP_131K.items():
        if step % reneigh_every != 0:
            continue
        t = float(temps[step - 1])
        rel = abs(t - t_gold) / abs(t_gold)
        tol = 1e-3 if step <= 60 else 2e-2
        if not rel < tol:
            raise SystemExit(
                f"GOLDEN GATE FAILED at step {step}: temp {t:.6e} vs "
                f"golden {t_gold:.6e} (rel {rel:.2e} > tol {tol:.0e}) — "
                "refusing to report a benchmark score for a wrong "
                "trajectory"
            )


def main() -> int:
    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import ClusterSimulation

    # benchmark axis: SP + cluster scheme + Pallas kernel (the fast path;
    # DP/verlet is the parity axis)
    params = Params(precision="sp", scheme="cluster", dense_thermo=False)
    sim = ClusterSimulation(params)
    # median of 3 timed regions, each 3 back-to-back executions of the
    # same compiled program: the median controls the ~7% tunnel/host
    # run-to-run swing the single-shot protocol exposed (round 4:
    # builder 57.3, driver artifact 53.3, identical code); the chain
    # amortizes the ~29 ms per-dispatch host<->device fetch (measured as
    # the exact fixed offset of a 100-vs-200-step program pair, round 5)
    # that the reference's in-process host timer never pays
    # (verletlist/main.c:250-287).
    out = sim.run(repeats=3, chain=3)
    check_golden(out.temps, params.reneigh_every)
    mups = 1e-6 * sim.natoms * params.ntimes / out.total_time

    baseline = 500.0  # M atom-updates/s, BASELINE.md north star
    print(
        json.dumps(
            {
                "metric": "atom_updates_per_second",
                "value": round(mups * 1e6),
                "unit": "atom-updates/s",
                "vs_baseline": round(mups / baseline, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Round-4 A/B harness: run the exact benchmark workload with parameter
overrides and print the golden-gated headline, so structural variants
are admitted or rejected by the same gate as bench.py.

    python tools/r4_ab.py key=value [key=value ...]

e.g.  python tools/r4_ab.py ishare=1
      python tools/r4_ab.py scheme=verlet kernel=rowlist
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import check_golden  # noqa: E402


def main() -> int:
    from mdbench_tpu.config import Params

    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                if v in ("True", "False"):
                    v = v == "True"
        kw[k] = v
    base = dict(precision="sp", scheme="cluster", dense_thermo=False)
    base.update(
        {k: v for k, v in kw.items() if k in Params.__dataclass_fields__}
    )
    params = Params(**base)
    if params.scheme == "cluster":
        from mdbench_tpu.engine_cluster import ClusterSimulation as Engine
    else:
        from mdbench_tpu.engine import Simulation as Engine
    sim = Engine(params)
    out = sim.run()
    check_golden(out.temps, params.reneigh_every)
    mups = 1e-6 * sim.natoms * params.ntimes / out.total_time
    print("AB %s: %.1f M updates/s (golden PASS, total %.3f s)"
          % (kw or "baseline", mups, out.total_time))
    return 0


if __name__ == "__main__":
    sys.exit(main())

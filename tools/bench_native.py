"""Native worker-pool throughput: jobs/sec through the abcq claim/exec/
writeback cycle (native/abcq.cpp) against a real SQLite store, with a
near-zero-cost external executable so the measured rate is the POOL's
overhead (claim txns + fork/exec + pipe read + guarded writeback), not the
simulator.

Reference anchor: the C++ reference runs one claimed particle at a time in
process (src/AbcSmc.cpp:1007-1032) and batches writebacks per --simulate
call; clusters scaled by running many such processes against the shared DB.
abcq is this framework's native replacement (self-scheduling fork/exec pool).

    python tools/bench_native.py [n_jobs] [workers...]
"""

from __future__ import annotations

import os
import stat
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_jobs: int = 2000, workers_list=(1, 4, 8, 16)):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from abcsmc_tpu.engine import AbcSmc
    from abcsmc_tpu.native import run_workers

    with tempfile.TemporaryDirectory() as td:
        sim = os.path.join(td, "fast_sim.sh")
        with open(sim, "w") as f:
            # constant metrics; /bin/sh + echo keeps exec cost minimal
            f.write("#!/bin/sh\necho 44 2.4\n")
        os.chmod(sim, os.stat(sim).st_mode | stat.S_IEXEC)

        for nw in workers_list:
            db = os.path.join(td, f"q{nw}.sqlite")
            cfg = {
                "smc_iterations": 1, "num_samples": n_jobs,
                "predictive_prior_fraction": 0.25,
                "database_filename": db,
                "parameters": [
                    {"name": "a", "dist_type": "UNIFORM", "num_type": "FLOAT",
                     "par1": 0.0, "par2": 1.0},
                    {"name": "b", "dist_type": "UNIFORM", "num_type": "FLOAT",
                     "par1": 0.0, "par2": 1.0},
                ],
                "metrics": [
                    {"name": "sum", "num_type": "INT", "value": 44},
                    {"name": "sd", "num_type": "FLOAT", "value": 2.39925},
                ],
            }
            abc = AbcSmc(cfg)
            abc.build_database(seed=0)
            abc.storage.close()

            t0 = time.perf_counter()
            done = run_workers(db, sim, -1, nw)
            dt = time.perf_counter() - t0
            assert done == n_jobs, (done, n_jobs)
            print(
                f"abcq pool: {nw:3d} worker(s): {n_jobs} jobs in {dt:6.2f} s "
                f"= {n_jobs / dt:8.0f} jobs/s",
                flush=True,
            )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    ws = tuple(int(w) for w in sys.argv[2:]) or (1, 4, 8, 16)
    main(n, ws)

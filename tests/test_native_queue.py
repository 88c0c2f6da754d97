"""Native C++ worker pool (native/abcq.cpp): parallel claim/exec/writeback of
external simulators against the SQLite run store."""

import os
import sqlite3
import stat

import numpy as np
import pytest

from abcsmc_tpu.engine import AbcSmc
from abcsmc_tpu.native import load_abcq, run_workers

pytestmark = pytest.mark.skipif(
    os.environ.get("ABCSMC_SKIP_NATIVE") == "1", reason="native disabled"
)


def dice_exec_script(tmp_path):
    """An external 'simulator' executable: reads ndice, sides from argv, seeds
    from ABC_RNG_SEED, prints 'sum sd' to stdout."""
    script = tmp_path / "dice_sim.py"
    script.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, os, random, statistics\n"
        "n = int(float(sys.argv[1])); m = int(float(sys.argv[2]))\n"
        "random.seed(int(os.environ.get('ABC_RNG_SEED', 0)))\n"
        "rolls = [random.randint(1, max(m, 1)) for _ in range(max(n, 1))]\n"
        "sd = statistics.stdev(rolls) if len(rolls) > 1 else 0.0\n"
        "print(sum(rolls), sd)\n"
    )
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script)


def make_db(tmp_path, n=24):
    cfg = {
        "smc_iterations": 1,
        "num_samples": n,
        "predictive_prior_fraction": 0.25,
        "database_filename": str(tmp_path / "q.sqlite"),
        "parameters": [
            {"name": "ndice", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 20},
            {"name": "sides", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 20},
        ],
        "metrics": [
            {"name": "sum", "num_type": "INT", "value": 44},
            {"name": "sd", "num_type": "FLOAT", "value": 2.39925},
        ],
    }
    abc = AbcSmc(cfg)
    abc.build_database(seed=0)
    abc.storage.close()
    return cfg["database_filename"]


def test_abcq_builds_and_reports_version():
    lib = load_abcq()
    assert b"abcq" in lib.abcq_version()


def test_parallel_pool_completes_all_jobs(tmp_path):
    db = make_db(tmp_path, n=24)
    cmd = dice_exec_script(tmp_path)
    done = run_workers(db, f"python3 {cmd}", n_jobs=-1, n_workers=4)
    assert done == 24
    conn = sqlite3.connect(db)
    st, att = conn.execute(
        "select sum(status = 'D'), max(attempts) from job"
    ).fetchone()
    assert st == 24 and att == 1
    mets = conn.execute("select sum, sd from met").fetchall()
    assert all(m[0] is not None and m[1] is not None for m in mets)
    # deterministic replay: metrics derive from the stored seed
    pars = conn.execute(
        "select p.ndice, p.sides, p.seed, m.sum from par p, met m "
        "where p.serial = m.serial limit 5"
    ).fetchall()
    for nd, sides, seed, s in pars:
        import random
        random.seed(int(seed))
        rolls = [random.randint(1, max(int(sides), 1))
                 for _ in range(max(int(nd), 1))]
        assert s == sum(rolls)
    conn.close()


def test_pool_batch_limit_and_requeue(tmp_path):
    db = make_db(tmp_path, n=10)
    cmd = dice_exec_script(tmp_path)
    done = run_workers(db, f"python3 {cmd}", n_jobs=4, n_workers=2)
    assert done == 4
    conn = sqlite3.connect(db)
    assert conn.execute(
        "select count(*) from job where status = 'D'"
    ).fetchone()[0] == 4
    conn.close()
    # rest still claimable
    done2 = run_workers(db, f"python3 {cmd}", n_jobs=-1, n_workers=3)
    assert done2 == 6


def test_failed_child_leaves_job_running_for_retry(tmp_path):
    db = make_db(tmp_path, n=4)
    done = run_workers(db, "false", n_jobs=-1, n_workers=2)
    assert done == 0
    conn = sqlite3.connect(db)
    # all jobs were claimed (attempts=1) and left 'R' for at-least-once retry
    rows = conn.execute("select status, attempts from job").fetchall()
    assert all(s == "R" and a == 1 for s, a in rows)
    conn.close()
    # a healthy pool picks them back up
    cmd = dice_exec_script(tmp_path)
    assert run_workers(db, f"python3 {cmd}", n_jobs=-1, n_workers=2) == 4


def test_two_concurrent_pools_share_queue(tmp_path):
    """Two worker pools (separate OS processes) draining one database
    concurrently: every job completes exactly once (chunked claiming +
    EXCLUSIVE transactions + guarded writeback)."""
    import subprocess
    import sys as _sys

    db = make_db(tmp_path, n=16)
    cmd = dice_exec_script(tmp_path)
    worker = (
        "import sys\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from abcsmc_tpu.native import run_workers\n"
        f"print(run_workers({db!r}, 'python3 {cmd}', -1, 2, chunk_size=3))\n"
    )
    procs = [
        subprocess.Popen([_sys.executable, "-c", worker],
                         stdout=subprocess.PIPE, text=True)
        for _ in range(2)
    ]
    counts = [int(p.communicate()[0].strip()) for p in procs]
    assert all(p.returncode == 0 for p in procs)
    # at-least-once execution: a slow pool's 'R' jobs may be re-claimed and
    # re-run by the other (attempts up to 2), but the guarded writeback means
    # each job is *counted* exactly once across pools
    assert sum(counts) == 16
    assert min(counts) > 0            # both pools got work
    conn = sqlite3.connect(db)
    assert conn.execute(
        "select count(*) from job where status = 'D'"
    ).fetchone()[0] == 16
    assert conn.execute(
        "select max(attempts) from job"
    ).fetchone()[0] <= 2
    conn.close()

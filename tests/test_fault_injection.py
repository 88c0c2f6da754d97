"""Fault-injection soaks for the queue layer: real SIGKILLed workers (python
engine and the native abcq pool), not just simulated claim overlap.

At-least-once semantics under crashes (reference anchors:
src/AbcSmc.cpp:983-991 claim ordered by (status, attempts);
src/AbcSmc.cpp:1017-1029 guarded first-write-wins writeback):
a worker killed -9 mid-batch leaves its claims 'R'; a later pass re-claims
them (attempts incremented) and completes; rows already 'D' are never
overwritten.

Set ABCSMC_SOAK=1 to run the large (100k-job dengue-surrogate) variant.
"""

import os
import signal
import sqlite3
import stat
import subprocess
import sys
import time

import numpy as np
import pytest

from abcsmc_tpu.engine import AbcSmc
from abcsmc_tpu.models.simulators import PySimulator

SOAK = os.environ.get("ABCSMC_SOAK") == "1"
N_JOBS = 100_000 if SOAK else 48
NPAR, NMET = (6, 13) if SOAK else (2, 2)


def surrogate_cfg(tmp_path, n=N_JOBS):
    """Dengue-surrogate shaped store (6 pars x 13 mets under ABCSMC_SOAK)."""
    return {
        "smc_iterations": 1,
        "num_samples": n,
        "predictive_prior_fraction": 0.25,
        "database_filename": str(tmp_path / "soak.sqlite"),
        "parameters": [
            {"name": f"p{i}", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0.0, "par2": 1.0}
            for i in range(NPAR)
        ],
        "metrics": [
            {"name": f"m{j}", "num_type": "FLOAT", "value": 0.5}
            for j in range(NMET)
        ],
    }


def _build(tmp_path):
    cfg = surrogate_cfg(tmp_path)
    abc = AbcSmc(cfg, simulator=PySimulator(lambda p, s, ser: list(p) * (
        NMET // NPAR) + list(p)[: NMET % NPAR]))
    abc.build_database(seed=0)
    abc.storage.close()
    return cfg


def _counts(db):
    conn = sqlite3.connect(db)
    q, r, d, max_att = conn.execute(
        "select sum(status='Q'), sum(status='R'), sum(status='D'), "
        "max(attempts) from job"
    ).fetchone()
    conn.close()
    return (q or 0, r or 0, d or 0, max_att or 0)


def _wait_for(db, pred, timeout=30.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred(_counts(db)):
            return True
        time.sleep(0.05)
    return False


def test_sigkill_python_worker_reclaim_and_finish(tmp_path):
    """kill -9 a claim-and-run python worker mid-batch: its 'R' rows are
    re-claimed (ordered after fresh 'Q' rows, attempts -> 2) and the run
    completes with every metric written exactly once."""
    cfg = _build(tmp_path)
    db = cfg["database_filename"]

    import json

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    json_cfg = json.dumps(cfg)
    worker_src = f"""
import sys, time, json
sys.path.insert(0, {repo_root!r})
import jax
jax.config.update("jax_platforms", "cpu")
from abcsmc_tpu.engine import AbcSmc
from abcsmc_tpu.models.simulators import PySimulator

def slow_sim(p, s, serial):
    time.sleep(0.25)   # slow enough that SIGKILL lands mid-batch
    return list(p) * ({NMET} // {NPAR}) + list(p)[: {NMET} % {NPAR}]

abc = AbcSmc(json.loads({json_cfg!r}), simulator=PySimulator(slow_sim))
for _ in range(100000):
    abc.simulate_next_particles(n=2)
"""
    proc = subprocess.Popen([sys.executable, "-c", worker_src])
    try:
        # wait until the worker holds live claims, then murder it
        assert _wait_for(db, lambda c: c[1] >= 1 or c[2] >= 1)
        assert _wait_for(db, lambda c: c[1] >= 1)
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=10)
    finally:
        if proc.poll() is None:
            proc.kill()

    q, r, d, _ = _counts(db)
    assert r >= 1, "kill did not land mid-batch"
    conn = sqlite3.connect(db)
    stuck = [row[0] for row in conn.execute(
        "select serial from job where status = 'R'"
    )]
    # the dead worker's claims: attempts=1, metrics unwritten
    for s in stuck:
        att, m0 = conn.execute(
            f"select j.attempts, m.m0 from job j, met m "
            f"where j.serial = {s} and m.serial = {s}"
        ).fetchone()
        assert att == 1 and m0 is None
    done_before = {
        row[0]: row[1] for row in conn.execute(
            "select m.serial, m.m0 from met m, job j "
            "where m.serial = j.serial and j.status = 'D'"
        )
    }
    conn.close()

    # a healthy worker drains the queue: fresh 'Q' rows first (status
    # ordering), then the stuck 'R' rows (re-claim, attempts -> 2)
    abc = AbcSmc(cfg, simulator=PySimulator(
        lambda p, s, ser: list(p) * (NMET // NPAR) + list(p)[: NMET % NPAR]))
    abc.simulate_next_particles(n=-1)
    q, r, d, max_att = _counts(db)
    assert (q, r, d) == (0, 0, N_JOBS)
    assert max_att == 2

    conn = sqlite3.connect(db)
    for s in stuck:
        att, m0 = conn.execute(
            f"select j.attempts, m.m0 from job j, met m "
            f"where j.serial = {s} and m.serial = {s}"
        ).fetchone()
        assert att == 2 and m0 is not None and np.isfinite(m0)
    # first-write-wins: rows completed before the crash keep their metrics
    for s, m0 in done_before.items():
        now = conn.execute(f"select m0 from met where serial = {s}").fetchone()
        assert now[0] == m0
    conn.close()


@pytest.mark.skipif(
    os.environ.get("ABCSMC_SKIP_NATIVE") == "1", reason="native disabled"
)
def test_sigkill_native_pool_reclaim_and_finish(tmp_path):
    """kill -9 the native abcq pool mid-run: claims stay 'R', a fresh pool
    re-claims and completes everything."""
    from abcsmc_tpu.native import run_workers

    cfg = _build(tmp_path)
    db = cfg["database_filename"]

    script = tmp_path / "slow_sim.py"
    script.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, time\n"
        "time.sleep(0.3)\n"
        f"print(' '.join(sys.argv[1:{NPAR + 1}] * ({NMET} // {NPAR}) "
        f"+ sys.argv[1:{NMET} % {NPAR} + 1]))\n"
    )
    script.chmod(script.stat().st_mode | stat.S_IEXEC)

    pool_src = (
        "import sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from abcsmc_tpu.native import run_workers\n"
        f"run_workers({db!r}, 'python3 {script}', -1, 4, chunk_size=4)\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", pool_src])
    try:
        assert _wait_for(db, lambda c: c[1] >= 2)
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=10)
    finally:
        if proc.poll() is None:
            proc.kill()
    # reap any orphaned sim children so they don't hold claims forever
    subprocess.run(["pkill", "-9", "-f", str(script)], capture_output=True)
    time.sleep(0.3)

    q, r, d, _ = _counts(db)
    assert r >= 1, "kill did not land mid-batch"

    # drain with a FAST simulator: the slow sleep only exists so the SIGKILL
    # lands mid-batch; at the 100k-job soak size a slow drain would take hours
    fields = " ".join(
        f"${(i % NPAR) + 1}" for i in range(NMET)
    )
    fast = tmp_path / "fast_sim.sh"
    fast.write_text(f"#!/bin/sh\necho {fields}\n")
    fast.chmod(fast.stat().st_mode | stat.S_IEXEC)
    done = run_workers(db, str(fast), n_jobs=-1, n_workers=6)
    q, r, d, max_att = _counts(db)
    assert (q, r, d) == (0, 0, N_JOBS)
    assert max_att >= 2
    assert done >= 1
    conn = sqlite3.connect(db)
    nulls = conn.execute("select count(*) from met where m0 is null").fetchone()
    assert nulls[0] == 0
    conn.close()


def test_resume_from_create_crash_window(tmp_path):
    """A crash between storage.create() and the generation-0 insert (two
    separate transactions) leaves a database with tables but zero rows.
    Both engines must repair that state by enqueueing generation 0 -
    previously process_database indexed into empty survivor/weight state
    (IndexError) on such a store."""
    from abcsmc_tpu.models.simulators import make_dice_simulator
    from abcsmc_tpu.storage import SQLiteStorage

    cfg = {
        "smc_iterations": 2,
        "num_samples": 64,
        "predictive_prior_fraction": 0.25,
        "database_filename": str(tmp_path / "crashwin.sqlite"),
        "parameters": [
            {"name": "ndice", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 50},
            {"name": "sides", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 50},
        ],
        "metrics": [
            {"name": "sum", "num_type": "INT", "value": 44},
            {"name": "sd", "num_type": "FLOAT", "value": 2.4},
        ],
    }
    sim = make_dice_simulator(max_dice=50)

    # simulate the crash: tables created, generation 0 never enqueued
    abc0 = AbcSmc(cfg, simulator=sim)
    abc0.storage.create(
        abc0.par_set.short_names(),
        [m.short_name for m in abc0.metrics],
        abc0.transform.has_any,
    )
    assert abc0.storage.exists() and abc0.storage.is_empty()
    abc0.storage.close()

    # host engine resumes: build_database repairs (returns True), then the
    # normal loop completes the run
    abc1 = AbcSmc(cfg, simulator=sim)
    assert abc1.build_database(seed=1) is True
    abc1.run(seed=1)
    gens = abc1.storage.read_generations()
    assert len(gens) == 2 and all(g.complete for g in gens)
    abc1.storage.close()

    # device engine resumes from the same crash-window state
    db2 = str(tmp_path / "crashwin_dev.sqlite")
    cfg2 = dict(cfg, database_filename=db2)
    abc2 = AbcSmc(cfg2, simulator=sim)
    abc2.storage.create(
        abc2.par_set.short_names(),
        [m.short_name for m in abc2.metrics],
        abc2.transform.has_any,
    )
    abc2.storage.close()
    abc3 = AbcSmc(cfg2, simulator=sim)
    abc3.run_device(seed=1)
    gens = abc3.storage.read_generations()
    assert len(gens) == 2 and all(g.complete for g in gens)
    abc3.storage.close()
    # sanity on the second backend too
    from abcsmc_tpu.storage import MemoryStorage

    ms = MemoryStorage()
    assert ms.is_empty()
    ms.create(["a"], ["m"], False)
    assert ms.exists() and ms.is_empty()


def _crashwin_cfg(tmp_path, name="race.sqlite"):
    return {
        "smc_iterations": 2,
        "num_samples": 32,
        "predictive_prior_fraction": 0.25,
        "database_filename": str(tmp_path / name),
        "parameters": [
            {"name": "ndice", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 50},
            {"name": "sides", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 50},
        ],
        "metrics": [
            {"name": "sum", "num_type": "INT", "value": 44},
            {"name": "sd", "num_type": "FLOAT", "value": 2.4},
        ],
    }


def test_crash_window_repair_race_is_atomic(tmp_path):
    """Two workers racing on the same crash-window database (tables, zero
    rows) must not double-populate set 0: the emptiness check re-runs inside
    the insert's EXCLUSIVE transaction, so the loser inserts nothing and
    build_database returns False (the reference's second process fails its
    exclusive create-table the same way, src/AbcSmc.cpp:819-835)."""
    from abcsmc_tpu.models.simulators import make_dice_simulator

    cfg = _crashwin_cfg(tmp_path)
    sim = make_dice_simulator(max_dice=50)
    abc0 = AbcSmc(cfg, simulator=sim)
    abc0.storage.create(
        abc0.par_set.short_names(),
        [m.short_name for m in abc0.metrics],
        abc0.transform.has_any,
    )
    abc0.storage.close()

    # worker A repairs
    abc_a = AbcSmc(cfg, simulator=sim)
    assert abc_a.build_database(seed=1) is True

    # worker B holds a STALE emptiness view (it checked before A's insert
    # landed); its conditional insert must abort inside the transaction
    abc_b = AbcSmc(cfg, simulator=sim)
    abc_b.storage.is_empty = lambda: True  # simulate the TOCTOU window
    assert abc_b.build_database(seed=2) is False

    gens = abc_a.storage.read_generations()
    assert len(gens) == 1 and gens[0].size == 32  # exactly one set 0
    abc_a.storage.close()
    abc_b.storage.close()

    # MemoryStorage honors the same contract
    from abcsmc_tpu.storage import MemoryStorage

    ms = MemoryStorage()
    ms.create(["a", "b"], ["m"], False)
    s1 = ms.insert_generation(
        0, np.zeros((4, 2)), np.arange(4), if_empty=True
    )
    assert s1 is not None and len(s1) == 4
    assert ms.insert_generation(
        0, np.zeros((4, 2)), np.arange(4), if_empty=True
    ) is None
    assert len(ms.serial) == 4


def test_crash_window_repair_rejects_mismatched_schema(tmp_path):
    """Repairing an existing empty schema that does not match the config
    must raise a coded StorageError, not silently populate wrong columns
    (equal-count mismatch) or die in a raw sqlite binding error (count
    mismatch)."""
    from abcsmc_tpu.errors import StorageError
    from abcsmc_tpu.models.simulators import make_dice_simulator
    from abcsmc_tpu.storage import SQLiteStorage

    cfg = _crashwin_cfg(tmp_path, "schema.sqlite")
    sim = make_dice_simulator(max_dice=50)

    # equal-count but differently-named parameter columns
    st = SQLiteStorage(cfg["database_filename"])
    st.create(["alpha", "beta"], ["sum", "sd"], False)
    st.close()
    abc = AbcSmc(cfg, simulator=sim)
    with pytest.raises(StorageError) as ei:
        abc.build_database(seed=1)
    assert "does not match the configuration" in str(ei.value)
    abc.storage.close()

    # wrong metric count
    cfg2 = _crashwin_cfg(tmp_path, "schema2.sqlite")
    st = SQLiteStorage(cfg2["database_filename"])
    st.create(["ndice", "sides"], ["sum"], False)
    st.close()
    abc2 = AbcSmc(cfg2, simulator=sim)
    with pytest.raises(StorageError):
        abc2.build_database(seed=1)
    abc2.storage.close()

"""Worker script for the multi-host test: run as N processes, each with 4
virtual CPU devices, forming one global mesh via jax.distributed. Runs two
sharded SMC generations and prints the (replicated) survivor summary so the
parent can check all processes agree.

    python tests/multihost_worker.py <process_id> <num_processes> <port>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nprocs,
    process_id=proc_id,
)

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from abcsmc_tpu.config import parse_config  # noqa: E402
from abcsmc_tpu.models.parameters import ParameterSet  # noqa: E402
from abcsmc_tpu.models.simulators import make_dice_simulator  # noqa: E402
from abcsmc_tpu.models.transforms import ParameterTransform  # noqa: E402
from abcsmc_tpu.parallel.generation import ShardedGeneration  # noqa: E402
from abcsmc_tpu.parallel.mesh import particle_mesh  # noqa: E402

assert len(jax.devices()) == 4 * nprocs, jax.devices()
assert len(jax.local_devices()) == 4

cfg = parse_config({
    "smc_iterations": 2,
    "num_samples": 64,
    "predictive_prior_fraction": 0.25,
    "parameters": [
        {"name": "ndice", "dist_type": "UNIFORM", "num_type": "INT",
         "par1": 1, "par2": 50},
        {"name": "sides", "dist_type": "UNIFORM", "num_type": "INT",
         "par1": 1, "par2": 50},
    ],
    "metrics": [
        {"name": "sum", "num_type": "INT", "value": 44},
        {"name": "sd", "num_type": "FLOAT", "value": 2.39925},
    ],
})
gen = ShardedGeneration(
    ParameterSet.from_specs(cfg.parameters),
    ParameterTransform(cfg.parameters),
    make_dice_simulator(max_dice=50),
    np.array([44.0, 2.39925]),
    mesh=particle_mesh(),  # global mesh across both processes
)

key = jax.random.PRNGKey(7)
key, k0, k1, k2 = jax.random.split(key, 4)
params, seeds = gen.init_population(k0, 64)
r0 = gen.step(k1, params, seeds, 16, 64, None)
state = (r0.survivor_params, r0.weights, r0.doubled_variance)
r1 = gen.step(k2, r0.next_params, r0.next_seeds, 16, 64, state)

# replicated outputs: every process can read them fully
w = np.asarray(jax.device_get(r1.weights))
surv = np.asarray(jax.device_get(r1.survivor_params))
assert w.shape == (16,) and np.all(np.isfinite(w))
print(
    f"RESULT {proc_id} {np.round(float(surv.mean()), 6)} "
    f"{np.round(float(np.linalg.norm(w)), 6)}",
    flush=True,
)

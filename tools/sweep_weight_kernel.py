"""One-off tuning sweep for the mixture weight kernel (block sizes,
precision, static vs online) + accuracy vs the highest-precision reference.
Informational; feeds the defaults in ops/pallas_kernels.py."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from abcsmc_tpu._cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def sync(r):
    # index before fetching (eager ravel relayouts the whole buffer)
    np.asarray(jax.device_get(r[(0,) * r.ndim]))


def timeit(f, reps=3):
    sync(f())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from abcsmc_tpu.ops.weights import _prep_scaled
    from abcsmc_tpu.ops.pallas_kernels import mixture_logsumexp

    rng = np.random.default_rng(0)
    p = 6

    # --- accuracy at 50k^2 vs (online, highest) ---
    k = 50_000
    prev = jnp.asarray(rng.uniform(0.3, 0.7, (k, p)), jnp.float32)
    w = jnp.full((k,), 1.0 / k, jnp.float32)
    dv = jnp.full((p,), 0.02, jnp.float32)
    a, b, _ = _prep_scaled(prev, prev, dv)
    lw = jnp.log(w)
    ref = np.asarray(mixture_logsumexp(a, b, lw, mode="online",
                                       precision="highest"))
    for prec in ("highest", "high", "default"):
        got = np.asarray(mixture_logsumexp(a, b, lw, mode="static",
                                           precision=prec))
        err = np.max(np.abs(got - ref))
        print(json.dumps({
            "metric": f"static/{prec} max |dlog| vs online/highest, 50k^2",
            "value": float(err), "unit": "nats",
        }), flush=True)

    # --- timing at 200k^2 ---
    k = 200_000
    prev = jnp.asarray(rng.uniform(0.3, 0.7, (k, p)), jnp.float32)
    w = jnp.full((k,), 1.0 / k, jnp.float32)
    a, b, _ = _prep_scaled(prev, prev, dv)
    lw = jnp.log(w)
    for mode in ("static", "online"):
        for prec in ("highest", "high", "default"):
            # tiles above ~bi*bj = 4M f32 exceed the 16 MB scoped-VMEM limit
            for bi, bj in ((512, 2048), (1024, 4096), (512, 4096)):
                try:
                    t = timeit(lambda: mixture_logsumexp(
                        a, b, lw, block_i=bi, block_j=bj, mode=mode,
                        precision=prec,
                    ))
                except Exception as e:  # e.g. VMEM OOM on a bad combo
                    print(json.dumps({
                        "metric": f"200k^2 {mode}/{prec} bi={bi} bj={bj}",
                        "error": type(e).__name__,
                    }), flush=True)
                    continue
                print(json.dumps({
                    "metric": f"200k^2 {mode}/{prec} bi={bi} bj={bj}",
                    "value": round(t * 1000, 1), "unit": "ms",
                }), flush=True)


if __name__ == "__main__":
    main()

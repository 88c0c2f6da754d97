"""The multi-chip scaling contract, pinned at compile level.

The design's scaling claim (docs/SCALING.md; SURVEY.md section 5.7's
"population-scale axis"): sharding the particle axis over an n-device mesh
must cut per-device FLOPs ~1/ndev while cross-device traffic stays a fixed
set of collectives whose all-reduce payload is independent of BOTH mesh size
and population size. These tests compile the exact north-star step
(`ShardedGeneration._build_step`) at tiny shapes on the virtual CPU mesh and
read the contract out of the compiled artifact, so a refactor that silently
replicates an O(N) pass, drops a psum fusion, or starts all-gathering raw
rows fails here instead of on an 8-chip bill.
"""

import os
import sys

import jax

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)

import functools  # noqa: E402

from scaling_analysis import collective_inventory  # noqa: E402
from scaling_analysis import analyze as _analyze  # noqa: E402

# both tests need the same (ndev, N, KEEP) compiles - cache them (each is a
# full XLA compile, ~8 s on this box)
analyze = functools.lru_cache(maxsize=None)(_analyze)

N, KEEP = 4096, 256


def test_per_device_flops_scale_with_mesh():
    assert len(jax.devices()) == 8
    r1 = analyze(1, N, KEEP)
    r8 = analyze(8, N, KEEP)
    speedup = r1["flops_per_device"] / r8["flops_per_device"]
    # perfect would be 8.0; the replicated A x A recombination constant is
    # proportionally large at this tiny shape (measured 7.33x here, 7.96x at
    # the 1M production shape) - anything under ~5x means an O(N) pass got
    # replicated
    assert speedup > 5.0, (r1["flops_per_device"], r8["flops_per_device"])


def test_collective_structure_fixed_and_allreduce_constant():
    r1 = analyze(1, N, KEEP)
    r8 = analyze(8, N, KEEP)
    r8_bign = analyze(8, 4 * N, KEEP)

    for r in (r1, r8, r8_bign):
        kinds = set(r["collectives"])
        assert kinds <= {"all-reduce", "all-gather"}, kinds
        # the fused step's wire protocol: 3 fused all-reduces (moments +
        # Grams + PRESS/vdv) and 5 all-gathers (top-K candidate pool + the
        # [K] log-weight reassembly)
        assert r["collectives"]["all-reduce"]["count"] == 3, r
        assert r["collectives"]["all-gather"]["count"] == 5, r

    # all-reduce payload: identical bytes regardless of mesh size or N
    ar = {r["collectives"]["all-reduce"]["bytes"] for r in (r1, r8, r8_bign)}
    assert len(ar) == 1, ar

    # all-gather payload is O(ndev * min(keep, local_n) * rowbytes): with
    # local_n >= keep in all three configs it must not grow with N ...
    assert (r8["collectives"]["all-gather"]["bytes"]
            == r8_bign["collectives"]["all-gather"]["bytes"])
    # ... and scales ~ndev at fixed keep (the gathered candidate pool)
    ratio = (r8["collectives"]["all-gather"]["bytes"]
             / r1["collectives"]["all-gather"]["bytes"])
    assert 7.0 < ratio <= 8.0, ratio


def test_collective_inventory_parser():
    hlo = """
  ar = (f32[13,13]{1,0}, f32[6]{0}) all-reduce(a, b), replica_groups={}
  ag.1 = f32[8,256,6]{2,1,0} all-gather(c), dimensions={0}
  ag.2 = (u32[256]{0}, u32[2048]{0}) all-gather-start(d), dimensions={0}
  agd = u32[2048]{0} all-gather-done(ag.2)
  x = f32[4,4]{1,0} add(e, f)
"""
    inv = collective_inventory(hlo)
    assert inv["all-reduce"] == {"count": 1, "bytes": 13 * 13 * 4 + 6 * 4}
    # the async pair is counted once, at -done (the -start result tuple
    # carries both operand and result buffers and would double-count)
    assert inv["all-gather"]["count"] == 2
    assert inv["all-gather"]["bytes"] == 8 * 256 * 6 * 4 + 2048 * 4

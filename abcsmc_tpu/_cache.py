"""Persistent XLA compilation cache.

The fused generation program is large; on remote-compile TPU backends a cold
compile can take minutes. Enabling jax's persistent cache makes every entry
point after the first process-fast (measured 13s -> 1s across processes on
v5e). Safe to call multiple times; silently no-ops if the backend is already
initialized with a cache or doesn't support one.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)


def enable_persistent_cache(cache_dir: str | None = None):
    import jax

    # never persist XLA:CPU AOT results: the cache entries are pinned to the
    # compile machine's feature set and reload with SIGILL-risk warnings;
    # the win is remote TPU compiles anyway. NB this initializes the backend,
    # so call sites must have finalized platform selection (they have: cli,
    # bench, entry(), and the TPU test conftest; dryrun_multichip switches
    # platforms itself and deliberately does not call this).
    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return

    path = cache_dir or os.environ.get("ABCSMC_JAX_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

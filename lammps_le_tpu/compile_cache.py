"""Persistent XLA/Mosaic compilation cache.

Remote Mosaic compiles through the axon tunnel cost 1-5 minutes per
kernel *per process* (PERF_NOTES); the CLI, the bench probe subprocess
and the bench main process each pay it.  JAX's persistent compilation
cache stores compiled executables keyed on HLO hash, so repeated runs of
the same deck/bench reload in milliseconds — the moral equivalent of the
reference being an ahead-of-time-compiled binary (a LAMMPS user compiles
``lmp`` once; our users should not re-pay compilation per run).

Opt out with LLE_COMPILE_CACHE=0; override the directory with
LLE_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/lle_jax_cache"


def enable(cache_dir: str | None = None) -> bool:
    """Idempotently enable the persistent cache.  Returns True if on.

    Safe to call before or after backend initialization (the config
    flags only gate compilation); swallows unsupported-backend errors so
    callers never fail because caching is unavailable.
    """
    if os.environ.get("LLE_COMPILE_CACHE", "1") == "0":
        return False
    path = (cache_dir or os.environ.get("LLE_COMPILE_CACHE_DIR")
            or _DEFAULT_DIR)
    try:
        import jax

        # CPU-only processes skip the cache: XLA:CPU AOT reloads warn
        # about compile-vs-host machine-feature mismatches (possible
        # SIGILL), and host compiles are seconds anyway — the cache
        # exists for the minutes-long remote Mosaic/TPU compiles.
        if str(jax.config.jax_platforms or "").startswith("cpu"):
            return False
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took >= 5 s to compile (the remote Mosaic
        # kernels take minutes; trivial host jits stay uncached)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        return True
    except Exception:
        return False

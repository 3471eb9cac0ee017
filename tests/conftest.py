"""Test configuration: run on CPU with 8 virtual devices, enable f64.

Multi-device sharding tests use the virtual CPU mesh (the TPU-pod analog of
the reference's 1/4-rank MPI bench matrix, bench/README) — unlike MPI tests
these run in one process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_xf = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _xf:
    os.environ["XLA_FLAGS"] = (_xf + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon site hook force-registers the TPU backend via config (overriding
# the env var); undo it so tests never contend for the tunneled chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

"""Test harness config: run JAX on CPU with 8 virtual devices.

Must set the env before the first ``import jax`` anywhere in the test
process, so this lives at conftest import time. The 8 virtual CPU devices
let mesh/sharding tests exercise multi-chip data parallelism without TPUs
(SURVEY.md §4).
"""

import os

# Force-override: the environment pins JAX_PLATFORMS=axon (the remote-TPU
# tunnel); tests must run hermetically on local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test env: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware.

jax may already be imported by the interpreter's sitecustomize (TPU tunnel),
so the platform is forced via jax.config rather than env vars alone; both are
set before any backend is initialized (no jax.devices() call has happened).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

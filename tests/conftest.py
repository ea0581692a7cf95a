"""Test environment: force JAX onto CPU with 8 virtual devices.

This is the TPU answer to "test multi-chip without a cluster" (SURVEY.md §4):
all sharding/pjit tests run against a virtual 8-device CPU mesh. Must run
before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# fp32 parity mode: jax's default matmul precision drops to ~bf16 accuracy even
# on CPU; golden tests compare against torch fp32, so force full precision.
# Set via jax.config (a pytest plugin imports jax before this file runs, so
# env vars are too late for import-time flag parsing; backends themselves
# initialize lazily, so JAX_PLATFORMS above still takes effect).
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var; the
# config update is respected (backends initialize lazily, after conftest).
jax.config.update("jax_platforms", "cpu")

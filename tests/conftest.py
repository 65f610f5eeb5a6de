"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the standard JAX trick for testing shard_map/collective code without
real multi-chip hardware; it also keeps unit tests off the (slow-to-compile)
TPU tunnel. The benchmark (bench.py) runs on the real chip instead.

Note: the environment's TPU plugin force-selects itself regardless of
JAX_PLATFORMS, so we additionally pin the platform through jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

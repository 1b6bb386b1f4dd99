"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin overrides ``jax_platforms`` at import time (env vars
alone do NOT stick — importing jax sets jax_platforms to "axon,cpu"), so
the CPU backend must be forced via jax.config BEFORE any backend
initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS above covers it

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.devices()[0].platform}")
assert len(jax.devices()) >= 8, (
    f"expected 8 virtual CPU devices, got {len(jax.devices())}")

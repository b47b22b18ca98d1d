"""Test config: run the suite on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (the real-TPU tunnel); tests must
run on CPU with 8 virtual devices, so we override via jax.config before
any backend is initialized. XLA_FLAGS must be set before jax import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

assert jax.device_count() == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy tests (Pallas-interpret kernels at shipped scale, "
        "flagship golden parity, multi-process runs). Core tier: "
        "pytest -m 'not slow' (< 5 min); nightly runs everything.")

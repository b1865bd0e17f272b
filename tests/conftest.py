"""Test configuration: force a virtual 8-device CPU mesh before JAX imports.

Multi-chip sharding code paths are exercised on fake CPU devices
(xla_force_host_platform_device_count) — the standard JAX trick, since no
TPU pod is attached during CI.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# This image preloads jax and registers a TPU plugin via sitecustomize,
# which wins over the env var — force the platform through jax.config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def assets_dir():
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(os.path.dirname(here), "assets")

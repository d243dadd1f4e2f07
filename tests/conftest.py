"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin and sets
JAX_PLATFORMS=axon before any of our code runs; for unit tests we want the
fast local CPU backend with 8 virtual devices (for sharding tests), so we
override the already-imported jax config here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def reset_params():
    from audiowmark_tpu.params import Params
    Params.reset()
    yield
    Params.reset()

"""Test configuration: force the CPU backend with a virtual 8-device farm.

Multi-chip sharding logic is tested on 8 virtual CPU devices
(`--xla_force_host_platform_device_count`) so pod-slice code paths run
without TPU hardware (SURVEY.md §4). NOTE: the axon sitecustomize imports
jax at interpreter start, so the env var route is too late — we must go
through jax.config.update before any backend is initialized.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    return devs

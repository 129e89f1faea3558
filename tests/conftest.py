"""Test configuration: run the suite on CPU with 8 virtual devices.

Mirrors the strategy in SURVEY.md §4: kernel tests compare fast paths against
pure-jnp reference implementations on CPU (Pallas in interpret mode), and
multi-chip sharding tests use an 8-device virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8).

Must set env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")

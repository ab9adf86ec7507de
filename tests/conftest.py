"""Test configuration: run everything on a virtual 8-device CPU mesh.

The deployment environment may pre-register an accelerator backend and export
JAX_PLATFORMS, so env vars alone are not reliable; jax.config.update is.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)

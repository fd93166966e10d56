"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the SURVEY.md §4 implication: the reference has no test suite, so we
build the pyramid ourselves; multi-chip sharding is validated on CPU via
`xla_force_host_platform_device_count` (no TPU needed for correctness tests).

Note: this environment injects an `axon` TPU plugin via sitecustomize and
sets JAX_PLATFORMS=axon, so the env var alone cannot force CPU — we use
`jax.config.update` after import, which wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402  (import after env vars take effect)

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    ds = jax.devices()
    assert ds[0].platform == "cpu" and len(ds) == 8, ds
    return ds

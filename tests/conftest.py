"""Test configuration: force CPU backend with 8 virtual devices so the
multi-chip sharding path runs in CI without TPU hardware (SURVEY.md §4
"Multi-chip without a cluster")."""

import os

# Must run before jax is imported anywhere. Force-set: the session environment
# may pre-set JAX_PLATFORMS (e.g. to the axon TPU tunnel) and tests must run
# on the virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (if present) force-selects its platform via jax.config
# at interpreter startup, which beats the env var — override it back to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the CPU backend, got " + jax.devices()[0].platform
    )
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"

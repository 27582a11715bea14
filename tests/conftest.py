"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware."""

import os

# force CPU — the ambient environment pins JAX to the remote-TPU plugin,
# which would turn every eager op into a remote-device dispatch. The env var
# alone is not honored over the plugin, so set the config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

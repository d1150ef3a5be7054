"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding tests work on a single host (the standard JAX substitute
for a pod — SURVEY.md §4)."""

import os

# force-override: the environment presets JAX_PLATFORMS=axon (real TPU);
# unit tests must run on the virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# a pytest plugin may have imported jax before this conftest ran, freezing
# the env-derived platform choice — override through the config as well
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

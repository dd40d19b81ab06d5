"""Test config: force JAX onto CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md §4).

NOTE: this image's ``sitecustomize`` imports jax at interpreter startup with
``JAX_PLATFORMS=axon`` (remote TPU), so env vars are too late — we must go
through ``jax.config``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

"""Test harness: force the host CPU platform with 8 virtual devices so
multi-chip sharding semantics are exercised without TPUs (SURVEY.md §4d)."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

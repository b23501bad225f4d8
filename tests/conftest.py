"""Pytest config: force an 8-virtual-device CPU mesh so sharding/mesh code paths are
exercised without TPU hardware (SURVEY.md §4 — the reference tests everything on CPU;
we add multi-device coverage via xla_force_host_platform_device_count)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

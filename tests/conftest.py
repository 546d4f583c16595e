"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This machine's sitecustomize registers the `axon` TPU backend and imports jax
at interpreter startup, so env vars set here are too late; use
``jax.config.update`` before any backend is initialized instead. Tests run on
CPU (deterministic, f32-accurate matmuls) with 8 virtual devices — the
standard way to test multi-device JAX sharding without a pod.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

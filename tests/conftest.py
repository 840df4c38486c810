"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The environment pre-imports jax with JAX_PLATFORMS=axon (remote TPU tunnel)
via sitecustomize, so env vars alone are too late — use jax.config.update.
Kernels carry jnp fallbacks (Pallas interpret mode on CPU), so the full
pipeline including multi-device sharding is testable without TPU hardware.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

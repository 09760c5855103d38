"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run without real multi-chip hardware.

The environment boots an `axon` TPU PJRT plugin from a sitecustomize
hook that force-sets ``jax_platforms="axon,cpu"`` (overriding the
JAX_PLATFORMS env var), which would route every test op through the
single-TPU network tunnel. Re-update the config here — conftest imports
before any test initializes a backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert jax.device_count() == 8

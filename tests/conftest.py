"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on faked CPU devices; the real TPU is reserved
for bench.py. NOTE: this environment's sitecustomize force-registers the
'axon' TPU backend and overwrites jax.config.jax_platforms, so the env-var
route (JAX_PLATFORMS=cpu) is ignored — we must override the config AFTER
importing jax but BEFORE any backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

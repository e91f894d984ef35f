"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on faked CPU devices; the real TPU is reserved
for bench.py. NOTE: this environment's sitecustomize force-registers the
'axon' TPU backend and overwrites jax.config.jax_platforms, so the env-var
route (JAX_PLATFORMS=cpu) is ignored — we must override the config AFTER
importing jax but BEFORE any backend initialization.
"""
import os

# The persistent XLA cache is for the (remote-compiled) TPU programs; CPU
# AOT entries embed the COMPILING machine's CPU features and reloading
# them on a host with a different feature set can SIGILL (observed: a
# full-suite crash after the cache accumulated entries from another
# container host). Tests always run on CPU — skip the cache entirely.
os.environ.setdefault("RAYTRACE_TPU_NO_COMPILE_CACHE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules. The full suite
    compiles hundreds of XLA CPU programs in one process; past ~2/3 of the
    run the accumulated compiler/executable state has twice segfaulted
    inside XLA:CPU compilation (full-suite only — every module passes in
    isolation). Modules share few compilations, so dropping the jit caches
    at module boundaries costs little and keeps the process lean."""
    yield
    jax.clear_caches()
    gc.collect()

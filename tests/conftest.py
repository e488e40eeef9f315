"""Test configuration: 8 virtual CPU devices + float64.

This container boots with an ``axon`` TPU PJRT plugin registered from
``sitecustomize`` which force-selects the (single, exclusively-locked) TPU
backend.  Tests must run on the host CPU — both for speed on this 1-core
box and so sharding tests can fake an 8-device mesh via
``xla_force_host_platform_device_count`` (the standard trick for testing
sharded JAX code without hardware; SURVEY §4).

``sitecustomize`` has already imported jax by the time this file runs, so
the platform must be switched via ``jax.config.update`` (env vars alone
are overridden by the axon register hook).  XLA_FLAGS is still unread at
this point because no backend has been initialised yet.
"""

import os

# Tests drive cli.main() in-process; without this the first such test
# would point jax's persistent compilation cache at the developer's
# real ~/.cache for the REST of the pytest process (state leaking
# across runs).  test_compile_cache_helper overrides it explicitly.
os.environ.setdefault("SPINRELAX_NO_COMPILE_CACHE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; harmless)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    # Deterministic by default; SPINRELAX_TEST_SEED turns every
    # rng-parameterised test (incl. the live-reference parity sweeps)
    # into a fresh-seed fuzz harness: run the suite with a few random
    # seeds to hunt for input-dependent disparities the pinned seed
    # cannot see.
    seed = int(os.environ.get("SPINRELAX_TEST_SEED", 20260816))
    return np.random.default_rng(seed)

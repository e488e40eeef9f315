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

# Smoke tier (``pytest -m smoke``, tools/ci.sh --smoke): a <5 min
# fast-signal subset on this 1-core box — unit tests, codec round-trips
# and the CHEAP live-parity checks.  Excluded below: the heavy
# live-reference sweeps, fuzz campaigns, e2e orchestration, multihost
# and the big batched-fit suites (they stay in the default full run,
# which is unchanged).  Measured 2026-08-20: smoke ~3 min vs 34 min
# full under load.
_SMOKE_EXCLUDE = {
    # live-reference parity sweeps (spawn the reference interpreter)
    "test_multifield_parity", "test_fitct_parity_sweep",
    "test_fitct_script_parity", "test_jomega_parity",
    "test_relax_script_parity", "test_misc_script_parity",
    # heavy batched-fit / optimiser suites
    "test_expfit", "test_lm_chol", "test_stacked_lm", "test_globalfit",
    "test_legacy_expfit", "test_moment_collapse", "test_legacyfit",
    # e2e orchestration / sharded / multihost / device pipelines
    "test_runall", "test_runall_multi", "test_parallel",
    "test_flagship_sharded", "test_multihost_process", "test_cli_misc",
    "test_review_fixes_r3", "test_dq",
    # fuzz campaigns
    "test_parser_fuzz", "test_xtc_fuzz",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod not in _SMOKE_EXCLUDE and "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    # Deterministic by default; SPINRELAX_TEST_SEED turns every
    # rng-parameterised test (incl. the live-reference parity sweeps)
    # into a fresh-seed fuzz harness: run the suite with a few random
    # seeds to hunt for input-dependent disparities the pinned seed
    # cannot see.
    seed = int(os.environ.get("SPINRELAX_TEST_SEED", 20260816))
    return np.random.default_rng(seed)

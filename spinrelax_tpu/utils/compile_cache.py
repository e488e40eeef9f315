"""Persistent XLA compilation cache for the CLI surface.

Every ``spinrelax`` CLI invocation is a fresh Python process, and each
jitted program pays XLA compilation again — on a remote-attached TPU
(axon tunnel) a cold compile of the streamed C(t) pipeline measured
4-7 MINUTES of AOT before the first frame moved (docs/PERF.md).  JAX's
persistent compilation cache serialises compiled executables to disk
keyed on (program HLO, jaxlib version, backend), so later processes
deserialise instead of recompiling — measured 14 s -> 0.45 s for a
toy program through the tunnel (hit latency varies with the remote
pool-server load; on locally attached TPUs the deserialise path is
reliably fast).

Enabled by the CLI entry point only — importing the library must stay
side-effect free.  Note that ``enable_default`` mutates PROCESS-GLOBAL
jax config: in-process callers of ``cli.main`` (tests, notebooks)
inherit the cache dir for the rest of the process — the test suite
sets ``SPINRELAX_NO_COMPILE_CACHE=1`` in conftest for this reason.
Controls:

- ``SPINRELAX_NO_COMPILE_CACHE=1`` disables it.
- ``SPINRELAX_COMPILE_CACHE=<dir>`` overrides the location
  (default ``~/.cache/spinrelax_tpu/xla``).
"""

from __future__ import annotations

import os


def enable_default() -> bool:
    """Point jax at the on-disk compilation cache.  Returns True when the
    cache was enabled.  Never raises: a read-only HOME or an exotic jax
    version degrades to the uncached behaviour."""
    if os.environ.get("SPINRELAX_NO_COMPILE_CACHE"):
        return False
    cache_dir = os.environ.get("SPINRELAX_COMPILE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "spinrelax_tpu", "xla"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every program that took a noticeable compile; tiny
        # programs recompile faster than a cache round-trip.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False

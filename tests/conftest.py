"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding (DP grad psum, cross-device Cox risk-set gather, bag
sharding) is tested on a virtual 8-device CPU mesh — the fake backend the
reference never had (SURVEY.md §4).

NOTE: this environment pre-imports jax and registers a real-TPU backend in
``sitecustomize`` for every Python process, so env vars alone are too late;
``jax.config.update`` reliably routes tests to CPU (and avoids every pytest
process claiming the single real TPU chip).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_tests")
# Persistent XLA compile cache for the suite. Measured on this box: the
# execution-bound tests (tiny trainings, e.g. test_exampledata) are
# unaffected, but the compile-bound ones — every test that builds several
# distinct jit programs (mesh variants, int8 paths, extract+train pairs) —
# cut 40-60% on warm re-runs, which is what the developer loop runs. The
# env var makes subprocess-based tests (multihost workers, golden-run
# oracle runners) inherit the same cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs",
                  float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))

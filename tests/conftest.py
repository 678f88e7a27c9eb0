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

import jax

jax.config.update("jax_platforms", "cpu")

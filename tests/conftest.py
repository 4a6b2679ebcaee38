"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware.

Note: the environment's sitecustomize registers a remote-TPU (axon) backend
and force-sets ``jax_platforms``; we must override the *config* after import,
not just the env var.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compile cache: shared across pytest-xdist workers and across
# invocations — the suite is compile-dominated on CPU
_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

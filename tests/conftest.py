"""Test harness: force an 8-device virtual CPU mesh before jax imports.

SURVEY.md §4: multi-chip paths are validated on CPU via
``--xla_force_host_platform_device_count`` (the reference had no test
suite at all; this one follows its runtime-guard philosophy plus real
unit tests)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU tunnel exports JAX_PLATFORMS=axon; the config update (not the
# env var) is what reliably pins tests to the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite's wall time is dominated by
# CPU-backend XLA compiles, which repeat identically across runs (and
# across xdist workers). Safe to share — keyed by HLO + backend.
_cache_dir = os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jax_test_compile_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the standard JAX trick; SURVEY.md §4).

Note: this environment's site config (axon TPU tunnel) overrides the
JAX_PLATFORMS env var, so we must force CPU via jax.config.update AFTER
importing jax but BEFORE any backend initialization.  XLA_FLAGS must be in
the environment before the CPU client starts (lazy, at first device use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persist compiled executables across test runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# don't persist XLA:CPU AOT blobs — they embed compile-machine CPU features
# and spam feature-mismatch warnings on reload
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

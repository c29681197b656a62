"""JAX environment helpers for scripts and benchmarks."""

from __future__ import annotations

import os


def setup_compile_cache(path: str | None = None) -> None:
    """Enable the persistent compilation cache (compiles on this host are
    slow — TPU compiles go through a remote-compile tunnel)."""
    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # CPU AOT blobs embed compile-machine features; don't persist them
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Force the CPU backend (the site config pins JAX_PLATFORMS=axon;
    the env var alone does not work — must update config after import)."""
    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

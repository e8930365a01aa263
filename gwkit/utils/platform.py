"""Platform helpers.

On TPU hosts where a plugin pins the default platform (e.g. the axon PJRT
plugin registers itself in sitecustomize and sets jax_platforms="axon,cpu"),
environment variables like JAX_PLATFORMS=cpu are ineffective. These helpers
apply the runtime config updates that actually work, provided they run
before the first backend initialization.
"""
from __future__ import annotations

import os


def force_cpu(n_virtual_devices: int | None = None, matmul_precision: str = "highest") -> None:
    """Select the CPU backend (optionally with N virtual devices for mesh tests).

    Must be called before any jax operation initializes a backend.
    """
    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if matmul_precision:
        jax.config.update("jax_default_matmul_precision", matmul_precision)
    enable_compilation_cache()


def enable_compilation_cache(path: str = "/tmp/gwkit_jax_cache") -> None:
    """Persistent XLA compilation cache — compiles on this box are expensive
    (single slow CPU; remote-compile TPU path), so amortize across runs."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def precise_matmuls() -> None:
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

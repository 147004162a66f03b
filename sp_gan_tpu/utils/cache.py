"""Persistent XLA compilation cache (no reference equivalent — the reference
pays CUDA JIT/cudnn autotune costs per process; on TPU we cache compiled
executables on disk so retraining/benching skips the 20-40s first compile)."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    # Honor SPGAN_PLATFORM=cpu|tpu for the CLIs. In environments where an
    # accelerator plugin registers itself at interpreter start, the standard
    # JAX_PLATFORMS env var is silently ignored; the config knob is honored
    # as long as no backend has initialized yet.
    plat = os.environ.get("SPGAN_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
            ndev = os.environ.get("SPGAN_CPU_DEVICES")
            if ndev and plat == "cpu":
                jax.config.update("jax_num_cpu_devices", int(ndev))
        except Exception:
            pass  # backend already up; leave the default platform

    path = path or os.environ.get("SPGAN_JAX_CACHE", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without these flags

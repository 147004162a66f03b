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
    # The XLA:CPU backend AOT-compiles for the exact host ISA (e.g.
    # +prefer-no-gather) but the persistent-cache key does NOT include the
    # CPU features — an entry written on one host can fail to LOAD on
    # another (cpu_aot_loader errors), turning every hit into a failure and
    # blowing any cold-compile budget (round-3 MULTICHIP rc=124 root cause).
    # Partition the cache dir by a fingerprint of the host CPU flags so a
    # rotated host starts a fresh (loadable) cache instead of fighting a
    # poisoned one. TPU executables are compiled for the device, not the
    # host, so the shared dir stays correct there.
    try:
        if jax.default_backend() == "cpu":
            path = os.path.join(path, f"cpu-{_host_cpu_fingerprint()}")
    except Exception:
        pass
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without these flags


def _host_cpu_fingerprint() -> str:
    """Short stable hash of this host's CPU identity.

    Hashes the feature flags AND the model identity (vendor/family/model/
    stepping/model name): LLVM's AOT target config also bakes in per-model
    TUNING preferences (+prefer-no-gather/+prefer-no-scatter etc.) that two
    hosts with identical cpuinfo flags can disagree on — flags alone let a
    rotated host inherit a cache whose every entry fails cpu_aot_loader."""
    import hashlib

    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("flags", "Features", "vendor_id", "cpu family",
                           "model", "model name", "stepping"):
                    parts.append(
                        key + "=" + " ".join(sorted(line.split(":", 1)[1].split())))
                if line.strip() == "" and parts:
                    break  # first core only; all cores identical
    except OSError:
        import platform

        parts = [platform.processor() or platform.machine()]
    return hashlib.sha1("|".join(sorted(parts)).encode()).hexdigest()[:12]
